"""Count-min sketch (operators/frequency.py) and Bloom membership
(operators/membership.py): the invariants the oracles can't see —
mergeability, one-sided error, and the no-false-negative guarantee."""

import pytest

from pyspark.sql import functions as F

from polars_order_book_spark.operators.frequency import (
    countmin_build,
    countmin_estimate,
    countmin_merge,
)
from polars_order_book_spark.operators.membership import (
    bloom_build,
    bloom_probe,
    bloom_probe_stats,
)


@pytest.fixture(scope="module")
def items(spark):
    # skewed: item i appears i+1 times; seg alternates to exercise merge
    rows = [(i, f"k{i}", i % 3) for i in range(20) for _ in range(i + 1)]
    return spark.createDataFrame(rows, "id long, key string, seg int")


class TestCountMin:
    def test_estimate_is_one_sided(self, spark, items):
        sk = countmin_build(items, "key", depth=4, width=32)
        probes = items.select("key").distinct()
        est = {
            r["key"]: r["est_n"]
            for r in countmin_estimate(sk, probes, "key", depth=4, width=32).collect()
        }
        exact = {
            r["key"]: r["n"]
            for r in items.groupBy("key").agg(F.count(F.lit(1)).alias("n")).collect()
        }
        assert set(est) == set(exact)
        for k, n in exact.items():
            assert est[k] >= n, f"CMS undercounted {k}: {est[k]} < {n}"

    def test_merge_equals_flat(self, spark, items):
        flat = countmin_build(items, "key", depth=4, width=32)
        merged = countmin_merge(
            countmin_build(items, "key", depth=4, width=32, segment_cols=["seg"])
        )
        a = {(r["row"], r["cell"]): r["n"] for r in flat.collect()}
        b = {(r["row"], r["cell"]): r["n"] for r in merged.collect()}
        assert a == b

    def test_absent_item_estimates_zero_when_cell_empty(self, spark):
        one = spark.createDataFrame([("only",)], "key string")
        sk = countmin_build(one, "key", depth=2, width=4096)
        # with width >> items, an unrelated key almost surely hits an empty
        # cell on at least one row -> min is 0; assert ≥0 and ≤1 either way,
        # and exactly 0 for a key with a provably empty cell
        probes = spark.createDataFrame([(f"absent{i}",) for i in range(50)], "key string")
        est = countmin_estimate(sk, probes, "key", depth=2, width=4096).collect()
        assert all(0 <= r["est_n"] <= 1 for r in est)
        assert any(r["est_n"] == 0 for r in est)

    def test_nulls_excluded_and_bad_params_raise(self, spark):
        df = spark.createDataFrame([("a",), (None,)], "key string")
        sk = countmin_build(df, "key", depth=2, width=8)
        assert sk.agg(F.sum("n")).collect()[0][0] == 2  # 1 non-null row × depth 2
        with pytest.raises(ValueError):
            countmin_build(df, "key", depth=0, width=8)
        with pytest.raises(ValueError):
            countmin_build(df, "key", depth=2, width=1)


class TestBloom:
    def test_no_false_negatives(self, spark, items):
        bloom = bloom_build(items, "key", bits=64, k=3)  # tiny => saturated
        flagged = bloom_probe(items, "key", bloom, bits=64, k=3)
        assert flagged.where(~F.col("bloom_pass")).count() == 0

    def test_null_key_probes_false(self, spark):
        build = spark.createDataFrame([("a",)], "key string")
        probe = spark.createDataFrame([("a",), (None,)], "key string")
        bloom = bloom_build(build, "key", bits=256, k=3)
        got = {
            r["key"]: r["bloom_pass"]
            for r in bloom_probe(probe, "key", bloom, bits=256, k=3).collect()
        }
        assert got["a"] is True and got[None] is False

    def test_stats_reconcile(self, spark, items):
        build = items.where(F.col("id") % 2 == 0)
        stats = bloom_probe_stats(
            items, "key", build, "key", ["seg"], bits=128, k=3
        ).collect()
        assert stats, "grouped stats empty"
        for r in stats:
            assert r["n_false_pos"] == r["n_bloom_pass"] - r["n_true_match"]
            assert r["n_false_pos"] >= 0  # no false negatives => pass ⊇ true
            assert r["n_bloom_pass"] <= r["n_rows"]

    def test_bad_params_raise(self, spark, items):
        with pytest.raises(ValueError):
            bloom_build(items, "key", bits=1, k=3)
        with pytest.raises(ValueError):
            bloom_build(items, "key", bits=64, k=0)
