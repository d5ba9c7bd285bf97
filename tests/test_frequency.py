"""Heavy hitters: exactness vs brute force, the no-false-negative sketch
guarantee under adversarial partition spreads, and edge semantics."""

import math
from collections import Counter

import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from polars_order_book_spark.operators.frequency import (
    _mg_merge,
    heavy_hitters,
    heavy_hitters_by,
)


def _brute(values, support):
    c = Counter(v for v in values if v is not None)
    n = sum(c.values())
    thr = math.ceil(support * n)
    return {k: v for k, v in c.items() if v >= thr}


def test_matches_bruteforce_skewed(spark):
    import random

    rng = random.Random(3)
    # Zipf-ish: a few hot users over a long tail
    vals = [rng.choice([1, 1, 1, 2, 2, rng.randint(3, 400)]) for _ in range(5000)]
    df = spark.createDataFrame([(v,) for v in vals], "user_id long").repartition(16)
    got = {r["user_id"]: r["n"] for r in heavy_hitters(df, "user_id", support=0.05).collect()}
    assert got == _brute(vals, 0.05)


def test_adversarial_spread_across_partitions(spark):
    """A barely-qualifying item diluted evenly across every partition among
    per-partition-dominant decoys — the case where a naive per-partition
    top-k (NOT Misra-Gries) loses it."""
    rows = []
    n_parts = 8
    # target: 160 occurrences of item 0 (support 0.02 of 8000), spread thin
    for i in range(8000):
        if i % 50 == 0:
            rows.append((0,))
        else:
            rows.append((1000 + (i % n_parts) * 100 + (i % 37),))  # partition-local decoys
    df = spark.createDataFrame(rows, "item long").repartition(n_parts)
    got = {r["item"] for r in heavy_hitters(df, "item", support=0.02).collect()}
    exact = set(_brute([r[0] for r in rows], 0.02))
    assert got == exact
    assert 0 in got


@settings(max_examples=20, deadline=None)
@given(
    st.lists(st.integers(0, 30), min_size=1, max_size=300),
    st.sampled_from([0.02, 0.1, 0.3]),
)
def test_property_exact_vs_bruteforce(spark, vals, support):
    df = spark.createDataFrame([(v,) for v in vals], "x long").repartition(5)
    got = {r["x"]: r["n"] for r in heavy_hitters(df, "x", support=support).collect()}
    assert got == _brute(vals, support)


def test_nulls_excluded_and_support_fraction(spark):
    df = spark.createDataFrame(
        [(1,), (1,), (1,), (2,), (None,), (None,)], "x long"
    )
    out = {r["x"]: (r["n"], r["support"]) for r in
           heavy_hitters(df, "x", support=0.5).collect()}
    # N = 4 non-null rows; only item 1 (3/4) clears support 0.5
    assert out == {1: (3, 0.75)}


def test_small_k_clamped_stays_exact(spark):
    vals = [1] * 60 + list(range(100, 1000))
    df = spark.createDataFrame([(v,) for v in vals], "x long").repartition(7)
    got = {r["x"] for r in heavy_hitters(df, "x", support=0.05, k=1).collect()}
    assert got == set(_brute(vals, 0.05))


def test_threshold_exact_decimal_rounding(spark):
    """support=0.07 over N=100 must threshold at exactly 7: binary-double
    0.07*100 = 7.000000000000001 ceils to 8 and silently drops a true
    7-count hitter. The decimal threshold keeps it."""
    vals = [7] * 7 + list(range(100, 193))
    assert len(vals) == 100
    df = spark.createDataFrame([(v,) for v in vals], "x long").repartition(4)
    got = {r["x"]: r["n"] for r in heavy_hitters(df, "x", support=0.07).collect()}
    assert got == {7: 7}


def test_bad_support_raises(spark):
    df = spark.createDataFrame([(1,)], "x long")
    with pytest.raises(ValueError, match="support"):
        heavy_hitters(df, "x", support=0.0)


def _brute_by(rows, support):
    """rows: (key, item). Exact per-key heavy hitters with Fraction-exact
    thresholds (the decimal rule, not FP ceil)."""
    from fractions import Fraction

    per_key = {}
    for k, v in rows:
        if k is None or v is None:
            continue
        per_key.setdefault(k, []).append(v)
    out = {}
    fr = Fraction(str(support))
    for k, vals in per_key.items():
        c = Counter(vals)
        n = len(vals)
        thr = -(-(fr * n).numerator // (fr * n).denominator)  # exact ceil
        for item, cnt in c.items():
            if cnt >= thr:
                out[(k, item)] = cnt
    return out


def test_keyed_matches_bruteforce(spark):
    import random

    rng = random.Random(11)
    rows = [
        (rng.choice(["a", "b", "c"]), rng.choice([1, 1, 2, rng.randint(3, 200)]))
        for _ in range(4000)
    ]
    df = spark.createDataFrame(rows, "k string, item long").repartition(16)
    got = {
        (r["k"], r["item"]): r["n"]
        for r in heavy_hitters_by(df, "k", "item", support=0.05).collect()
    }
    assert got == _brute_by(rows, 0.05)


def test_keyed_adversarial_spread_per_key(spark):
    """Within EACH key, a barely-qualifying item diluted across all
    partitions among per-partition-dominant decoys — the per-key pigeonhole
    guarantee, not just the global one."""
    rows = []
    for key in ("x", "y"):
        for i in range(4000):
            if i % 50 == 0:
                rows.append((key, 0))
            else:
                rows.append((key, 1000 + (i % 8) * 100 + (i % 37)))
    df = spark.createDataFrame(rows, "k string, item long").repartition(8)
    got = {
        (r["k"], r["item"])
        for r in heavy_hitters_by(df, "k", "item", support=0.02).collect()
    }
    exact = set(_brute_by(rows, 0.02))
    assert got == exact
    assert ("x", 0) in got and ("y", 0) in got


def test_keyed_null_keys_and_items_excluded(spark):
    df = spark.createDataFrame(
        [("a", 1), ("a", 1), ("a", 2), (None, 1), ("a", None)],
        "k string, item long",
    )
    out = {
        (r["k"], r["item"]): (r["n"], r["support"])
        for r in heavy_hitters_by(df, "k", "item", support=0.5).collect()
    }
    # key "a": N=3 non-null items; only item 1 (2/3) clears 0.5
    assert out == {("a", 1): (2, 2 / 3)}


@settings(max_examples=15, deadline=None)
@given(
    st.lists(
        st.tuples(st.sampled_from(["a", "b", "c"]), st.integers(0, 25)),
        min_size=1,
        max_size=250,
    ),
    st.sampled_from([0.05, 0.2, 0.5]),
)
def test_property_keyed_exact_vs_bruteforce(spark, rows, support):
    df = spark.createDataFrame(rows, "k string, item long").repartition(5)
    got = {
        (r["k"], r["item"]): r["n"]
        for r in heavy_hitters_by(df, "k", "item", support=support).collect()
    }
    assert got == _brute_by(rows, support)


def test_keyed_timestamp_key_roundtrips(spark):
    """Time-bucketed segments (the 'top users per hour' shape): timestamp
    keys must survive the pandas sketch round-trip intact."""
    import datetime as dt

    h0 = dt.datetime(2024, 1, 1, 10)
    h1 = dt.datetime(2024, 1, 1, 11)
    rows = [(h0, 1)] * 4 + [(h0, 2)] + [(h1, 2)] * 3
    df = spark.createDataFrame(rows, "hour timestamp, item long")
    got = {
        (r["hour"], r["item"]): r["n"]
        for r in heavy_hitters_by(df, "hour", "item", support=0.5).collect()
    }
    assert got == {(h0, 1): 4, (h1, 2): 3}


def test_keyed_multi_key_columns(spark):
    rows = [("a", 1, 7)] * 5 + [("a", 2, 7)] * 1 + [("b", 1, 9)] * 3
    df = spark.createDataFrame(rows, "k1 string, k2 long, item long")
    got = {
        (r["k1"], r["k2"], r["item"]): r["n"]
        for r in heavy_hitters_by(df, ["k1", "k2"], "item", support=0.5).collect()
    }
    # (a,2) is its own segment with N=1: its single item clears any support
    assert got == {("a", 1, 7): 5, ("a", 2, 7): 1, ("b", 1, 9): 3}


def test_mg_merge_error_bound():
    """Unit pin of the mergeable rule: ≤ k counters survive and the
    subtracted mass per merge is the (k+1)-th largest count."""
    s = _mg_merge(None, pd.Series({1: 10, 2: 8, 3: 5, 4: 1}), k=2)
    assert len(s) <= 2
    assert s.to_dict() == {1: 5, 2: 3}  # cut = 5 (3rd largest)
    s2 = _mg_merge(s, pd.Series({3: 6, 1: 1}), k=2)
    assert len(s2) <= 2 and s2[1] == 3  # 6 - cut(3) == 3


# --- HLL sketch rollup -------------------------------------------------------


def test_hll_union_matches_flat_build(spark):
    from polars_order_book_spark.operators.frequency import hll_build, hll_union

    df = spark.createDataFrame(
        [(d, i % 50) for d in ("a", "b", "c") for i in range(200)],
        "seg string, item long",
    )
    per_seg = hll_build(df, "item", segment_cols=["seg"])
    unioned = hll_union(per_seg).collect()[0]
    flat = hll_build(df, "item").collect()[0]
    # merging per-segment sketches must equal the sketch of the union —
    # the mergeability contract the rollup pattern depends on
    assert unioned["est"] == flat["est"]


def test_hll_estimate_near_exact_at_small_cardinality(spark):
    from polars_order_book_spark.operators.frequency import hll_build

    df = spark.createDataFrame([(i,) for i in range(1000)], "item long")
    est = hll_build(df, "item").collect()[0]["est"]
    assert abs(est - 1000) <= 0.06 * 1000


def test_hll_nulls_excluded_and_validation(spark):
    from polars_order_book_spark.operators.frequency import hll_build

    df = spark.createDataFrame([(None,), (1,), (1,)], "item long")
    assert hll_build(df, "item").collect()[0]["est"] == 1
    with pytest.raises(ValueError, match="lg_k"):
        hll_build(df, "item", lg_k=2)


# --- mergeable value-histogram quantile rollup ------------------------------

from polars_order_book_spark.operators.frequency import (  # noqa: E402
    histogram_merge,
    histogram_quantiles,
    value_histogram,
)


def _vals(spark, rows):
    return spark.createDataFrame(rows, "k string, d string, v double")


def test_value_histogram_bins_clamp_and_null_exclusion(spark):
    rows = [
        ("a", "d1", 0.0),    # bin 0
        ("a", "d1", 9.99),   # bin 0
        ("a", "d1", 10.0),   # bin 1
        ("a", "d1", 100.0),  # == hi -> clamped to last bin (9)
        ("a", "d1", -5.0),   # below lo -> clamped to 0
        ("a", "d1", 999.0),  # above hi -> clamped to 9
        ("a", "d1", None),   # excluded
    ]
    out = {
        r["bin"]: r["n"]
        for r in value_histogram(
            _vals(spark, rows), "v", ["k"], lo=0.0, hi=100.0, n_bins=10
        ).collect()
    }
    assert out == {0: 3, 1: 1, 9: 2}


def test_histogram_merge_equals_direct_build(spark):
    rows = [("a", d, float(v)) for d in ("d1", "d2") for v in range(0, 100, 7)]
    df = _vals(spark, rows)
    fine = value_histogram(df, "v", ["k", "d"], lo=0.0, hi=100.0, n_bins=8)
    merged = {
        (r["k"], r["bin"]): r["n"]
        for r in histogram_merge(fine, ["k"]).collect()
    }
    direct = {
        (r["k"], r["bin"]): r["n"]
        for r in value_histogram(df, "v", ["k"], lo=0.0, hi=100.0, n_bins=8).collect()
    }
    assert merged == direct


def test_histogram_quantiles_exact_rank_rule(spark):
    # 10 values 5,15,...,95 -> one per bin with n_bins=10, width 10.
    # p50: rank ceil(10/2)=5 -> first bin with cum>=5 is bin 4 -> est 50.0
    # p90: rank 9 -> bin 8 -> est 90.0; p99: rank ceil(990/100)=10 -> bin 9 -> 100.0
    rows = [("a", "d", 5.0 + 10 * i) for i in range(10)]
    hist = value_histogram(_vals(spark, rows), "v", ["k"], lo=0.0, hi=100.0, n_bins=10)
    out = {
        round(r["prob"], 4): (r["est"], r["n_total"])
        for r in histogram_quantiles(
            hist, ["k"], [(1, 2), (9, 10), (99, 100)], lo=0.0, hi=100.0, n_bins=10
        ).collect()
    }
    assert out == {0.5: (50.0, 10), 0.9: (90.0, 10), 0.99: (100.0, 10)}


def test_histogram_quantiles_within_one_bin_of_exact(spark):
    import numpy as np

    rng = np.random.default_rng(7)
    vals = rng.uniform(0, 100, size=500)
    rows = [("a", "d", float(v)) for v in vals]
    hist = value_histogram(_vals(spark, rows), "v", ["k"], lo=0.0, hi=100.0, n_bins=50)
    out = {
        round(r["prob"], 4): r["est"]
        for r in histogram_quantiles(
            hist, ["k"], [(1, 2), (9, 10)], lo=0.0, hi=100.0, n_bins=50
        ).collect()
    }
    width = 100.0 / 50
    for p in (0.5, 0.9):
        exact = float(np.quantile(vals, p))
        assert abs(out[p] - exact) <= width + 1e-9


def test_histogram_guards(spark):
    df = _vals(spark, [("a", "d", 1.0)])
    with pytest.raises(ValueError, match="n_bins"):
        value_histogram(df, "v", ["k"], lo=0.0, hi=1.0, n_bins=0)
    with pytest.raises(ValueError, match="hi > lo"):
        value_histogram(df, "v", ["k"], lo=1.0, hi=1.0, n_bins=4)
    hist = value_histogram(df, "v", ["k"], lo=0.0, hi=1.0, n_bins=4)
    with pytest.raises(ValueError, match="prob"):
        histogram_quantiles(hist, ["k"], [(3, 2)], lo=0.0, hi=1.0, n_bins=4)


# --- exact two-pass quantiles ------------------------------------------------

from polars_order_book_spark.operators.frequency import (  # noqa: E402
    exact_quantile_two_pass,
)


def test_exact_quantile_two_pass_matches_rank_definition(spark):
    import numpy as np

    rng = np.random.default_rng(11)
    vals = np.round(rng.uniform(0, 100, size=400), 2)
    vals[:50] = vals[0]  # heavy ties
    df = spark.createDataFrame([(float(v),) for v in vals], "v double")
    probs = [(1, 2), (9, 10), (1, 4)]
    got = exact_quantile_two_pass(df, "v", probs, lo=0.0, hi=100.0, n_bins=16)
    srt = np.sort(vals)
    for (num, den), (p, q, n) in zip(probs, got):
        rank = (num * len(vals) + den - 1) // den
        assert n == len(vals)
        assert q == srt[rank - 1]


def test_exact_quantile_two_pass_robust_to_bad_range(spark):
    """All data outside [lo, hi]: everything clamps into the edge bins, and
    the answer is still exact (clamped binning is order-monotone)."""
    import numpy as np

    vals = [float(v) for v in range(1000, 1100)]
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    got = exact_quantile_two_pass(df, "v", [(1, 2)], lo=0.0, hi=1.0, n_bins=8)
    assert got[0][1] == np.sort(vals)[(len(vals) + 1) // 2 - 1]


def test_exact_quantile_two_pass_guards(spark):
    df = spark.createDataFrame([(1.0,)], "v double")
    with pytest.raises(ValueError, match="prob"):
        exact_quantile_two_pass(df, "v", [(0, 2)], lo=0.0, hi=1.0)
    with pytest.raises(ValueError, match="n_bins"):
        exact_quantile_two_pass(df, "v", [(1, 2)], lo=0.0, hi=1.0, n_bins=0)
    empty = spark.createDataFrame([], "v double")
    with pytest.raises(ValueError, match="no non-null rows"):
        exact_quantile_two_pass(empty, "v", [(1, 2)], lo=0.0, hi=1.0)


from polars_order_book_spark.operators.frequency import (  # noqa: E402
    grouped_exact_quantiles,
)


def test_grouped_exact_quantiles_matches_rank_definition(spark):
    import numpy as np

    rng = np.random.default_rng(3)
    rows = []
    for k, n in (("a", 137), ("b", 55), ("c", 1)):
        vals = np.round(rng.uniform(0, 100, size=n), 2)
        vals[: n // 4] = vals[0]  # ties
        rows += [(k, float(v)) for v in vals]
    df = spark.createDataFrame(rows, "k string, v double").repartition(4)
    probs = [(1, 2), (9, 10), (1, 100)]
    got = {
        (r["k"], round(r["prob"], 4)): (r["value"], r["n_total"])
        for r in grouped_exact_quantiles(
            df, "v", ["k"], probs, lo=0.0, hi=100.0, n_bins=16
        ).collect()
    }
    by_k = {}
    for k, v in rows:
        by_k.setdefault(k, []).append(v)
    for k, vals in by_k.items():
        srt = sorted(vals)
        for num, den in probs:
            rank = (num * len(vals) + den - 1) // den
            assert got[(k, round(num / den, 4))] == (srt[rank - 1], len(vals))


def test_grouped_exact_quantiles_bad_range_still_exact(spark):
    rows = [("a", float(v)) for v in range(1000, 1050)]
    df = spark.createDataFrame(rows, "k string, v double")
    got = grouped_exact_quantiles(
        df, "v", ["k"], [(1, 2)], lo=0.0, hi=1.0, n_bins=8
    ).collect()
    assert got[0]["value"] == sorted(v for _, v in rows)[(50 + 1) // 2 - 1]


def test_grouped_exact_quantiles_guard(spark):
    df = spark.createDataFrame([("a", 1.0)], "k string, v double")
    with pytest.raises(ValueError, match="prob"):
        grouped_exact_quantiles(df, "v", ["k"], [(2, 1)], lo=0.0, hi=1.0)


# --- hypothesis: grouped quantiles == rank definition for arbitrary data ----

from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_HSETTINGS = dict(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@settings(**_HSETTINGS)
@given(
    vals=st.lists(
        st.floats(min_value=-50.0, max_value=150.0, allow_nan=False, width=32),
        min_size=1,
        max_size=60,
    ),
    num=st.integers(min_value=1, max_value=10),
)
def test_grouped_exact_quantiles_hypothesis(spark, vals, num):
    """Arbitrary values (incl. outside the declared [0,100] range and heavy
    duplicates) and an arbitrary prob — the result must equal the sorted
    rank definition exactly."""
    den = 10
    rows = [("k", float(v)) for v in vals] + [("k", float(vals[0]))] * 3
    df = spark.createDataFrame(rows, "k string, v double")
    got = grouped_exact_quantiles(
        df, "v", ["k"], [(num, den)], lo=0.0, hi=100.0, n_bins=7
    ).collect()
    srt = sorted(v for _, v in rows)
    rank = (num * len(rows) + den - 1) // den
    assert len(got) == 1
    assert got[0]["value"] == srt[rank - 1]
    assert got[0]["n_total"] == len(rows)


def test_value_histogram_weighted_sums_and_null_weight_exclusion(spark):
    rows = [("a", 5.0, 3), ("a", 5.0, 2), ("a", 95.0, 10), ("a", 50.0, None)]
    df = spark.createDataFrame(rows, "k string, v double, w long")
    out = {r["bin"]: r["n"] for r in value_histogram(
        df, "v", ["k"], lo=0.0, hi=100.0, n_bins=10, weight_col="w").collect()}
    # bin 0 sums weights 3+2; bin 9 sums 10; the null-weight row is excluded
    assert out == {0: 5, 9: 10}


def test_weighted_quantiles_answer_where_the_weight_lives(spark):
    # 9 docs of length ~10 with tiny weights vs 1 doc of length ~90 carrying
    # nearly all tokens: the weighted median must sit at the heavy doc's bin
    rows = [("a", 10.0, 1)] * 9 + [("a", 90.0, 100)]
    df = spark.createDataFrame(rows, "k string, v double, w long")
    hist = value_histogram(df, "v", ["k"], lo=0.0, hi=100.0, n_bins=10, weight_col="w")
    out = {round(r["prob"], 2): r["est"] for r in histogram_quantiles(
        hist, ["k"], [(1, 2)], lo=0.0, hi=100.0, n_bins=10).collect()}
    assert out[0.5] == 100.0  # upper edge of the heavy doc's bin (bin 9)


def test_countmin_estimate_rejects_mismatched_parameters(spark):
    """r8 self-review: a probe with the wrong width hashes to the wrong
    cells and every estimate silently reads 0 — the sketch now carries its
    build parameters and the probe asserts them per row."""
    from polars_order_book_spark.operators.frequency import (
        countmin_build,
        countmin_estimate,
    )

    df = spark.createDataFrame([(i % 5,) for i in range(100)], "item long")
    sketch = countmin_build(df, "item", depth=4, width=1024)
    items = df.distinct()
    with pytest.raises(Exception, match="do not match"):
        countmin_estimate(sketch, items, "item", depth=4, width=512).collect()
    # inferred parameters (the new default) read the metadata and succeed
    est = {
        r["item"]: r["est_n"]
        for r in countmin_estimate(sketch, items, "item").collect()
    }
    assert est == {i: 20 for i in range(5)}


def test_by_count_matches_bruteforce_and_excludes_nulls(spark):
    """heavy_hitters_by_count (r10): absolute threshold, exact groupBy path
    — matches brute force, reports the per-key support fraction, and keeps
    the family's null-exclusion rule."""
    from polars_order_book_spark.operators.frequency import heavy_hitters_by_count

    import random

    rng = random.Random(7)
    rows = [
        (rng.choice(["a", "b", None]),
         rng.choice([1, 1, 1, 2, None, rng.randint(3, 50)]))
        for _ in range(3000)
    ]
    df = spark.createDataFrame(rows, "k string, item long").repartition(16)
    got = {
        (r["k"], r["item"]): (r["n"], r["support"])
        for r in heavy_hitters_by_count(df, "k", "item", min_count=30).collect()
    }
    # brute force over non-null keys AND items
    nn = [(k, v) for k, v in rows if k is not None and v is not None]
    totals = Counter(k for k, _ in nn)
    exact = Counter(nn)
    want = {
        (k, v): (c, c / totals[k]) for (k, v), c in exact.items() if c >= 30
    }
    assert set(got) == set(want)
    for key, (n, sup) in got.items():
        assert n == want[key][0]
        assert sup == pytest.approx(want[key][1])


def test_by_count_rejects_bad_min_count(spark):
    from polars_order_book_spark.operators.frequency import heavy_hitters_by_count

    df = spark.createDataFrame([("a", 1)], "k string, item long")
    with pytest.raises(ValueError, match="min_count"):
        heavy_hitters_by_count(df, "k", "item", min_count=0)
