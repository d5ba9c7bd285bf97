"""Skew hardening: salted bucket joins must bound per-task group sizes on
adversarial data (every doc identical ⇒ one band bucket holds the corpus)
while producing results identical to the plain joins."""

from pyspark.sql import functions as F

from polars_order_book_spark.functions.skew import (
    _SA,
    _SB,
    salted_pair_join,
    salted_probe_join,
)
from polars_order_book_spark.operators import dedup, similarity


def _adversarial_docs(spark, n=60):
    # identical text ⇒ identical minhash signature ⇒ ONE bucket per band
    return spark.createDataFrame(
        [(i, "the same exact text repeated for every single document here") for i in range(n)],
        ["doc_id", "text"],
    )


def test_salted_pair_join_equals_plain_join(spark):
    rows = spark.createDataFrame(
        [(b, h, i) for b in range(2) for h in ("x", "y") for i in range(20)],
        ["band", "band_hash", "doc_id"],
    )
    plain = dedup.lsh_candidate_pairs(rows, bucket_cap=None)
    salted = dedup.lsh_candidate_pairs(rows, bucket_cap=6)
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_pair_join_bounds_cell_sizes(spark):
    """On one degenerate bucket of 64 docs with cap 8, every salted join cell
    must hold ~cap rows per side (bounded per-task candidate counts)."""
    rows = spark.createDataFrame(
        [(0, "hot", i) for i in range(64)], ["band", "band_hash", "doc_id"]
    )
    # reproduce the left side of salted_pair_join and measure cell sizes
    sizes = rows.groupBy("band", "band_hash").agg(F.count(F.lit(1)).alias("__grp_n__"))
    r = rows.join(sizes, on=["band", "band_hash"])
    s = F.greatest(F.lit(1), F.ceil(F.col("__grp_n__") / F.lit(8))).cast("int")
    salt = F.pmod(F.xxhash64(F.col("doc_id")), s).cast("int")
    left = r.select(
        "band", "band_hash", salt.alias(_SA),
        F.explode(F.sequence(F.lit(0), s - 1)).alias(_SB), "doc_id",
    )
    cell_sizes = [
        row["n"]
        for row in left.groupBy("band", "band_hash", _SA, _SB)
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    ]
    # 64 docs over 8 salts: expected 8/cell; hash unevenness tolerated to 3x
    assert max(cell_sizes) <= 3 * 8
    # and the pair set is still exactly the full m-choose-2
    pairs = salted_pair_join(rows, ["band", "band_hash"], "doc_id", "a", "b", 8)
    assert pairs.distinct().count() == 64 * 63 // 2


def test_minhash_lsh_salted_identical_on_adversarial_corpus(spark):
    docs = _adversarial_docs(spark, 40)
    plain = dedup.minhash_lsh_duplicates(docs, threshold=0.5, bucket_cap=None)
    salted = dedup.minhash_lsh_duplicates(docs, threshold=0.5, bucket_cap=5)
    key = lambda r: (r["doc_a"], r["doc_b"])  # noqa: E731
    assert sorted(map(key, plain.collect())) == sorted(map(key, salted.collect()))
    # all docs identical: every pair is a duplicate
    assert plain.count() == 40 * 39 // 2


def test_neardup_embedding_salted_identical(spark):
    import numpy as np

    rng = np.random.default_rng(11)
    base = rng.normal(size=16)
    rows = []
    for i in range(30):
        v = base + rng.normal(scale=0.01, size=16)  # near-identical cluster
        rows.append((i, [float(x) for x in v]))
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    kw = dict(threshold=0.9, n_planes=8, band_size=4, dim=16)
    plain = similarity.neardup_embedding_pairs(df, bucket_cap=None, **kw)
    salted = similarity.neardup_embedding_pairs(df, bucket_cap=4, **kw)
    key = lambda r: (r["doc_a"], r["doc_b"], round(r["cosine"], 12))  # noqa: E731
    got_p, got_s = sorted(map(key, plain.collect())), sorted(map(key, salted.collect()))
    assert got_p == got_s
    assert len(got_p) == 30 * 29 // 2  # the whole cluster is near-dup


def test_ivf_salted_probe_identical(spark):
    import numpy as np

    rng = np.random.default_rng(5)
    rows = [(i, [float(x) for x in rng.normal(size=16)]) for i in range(50)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    q = df.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    kw = dict(k=5, n_cells=4, n_probe=2, dim=16)
    plain = similarity.cosine_topk_ivf(df, q, cell_cap=None, **kw)
    salted = similarity.cosine_topk_ivf(df, q, cell_cap=7, **kw)
    key = lambda r: (r["query_id"], r["rank"], r["neighbor_id"])  # noqa: E731
    assert sorted(map(key, plain.collect())) == sorted(map(key, salted.collect()))


def test_salted_probe_join_pairs_meet_once(spark):
    build = spark.createDataFrame(
        [(0, i) for i in range(40)] + [(1, 100 + i) for i in range(3)],
        ["cell", "neighbor_id"],
    )
    probe = spark.createDataFrame([(0, "q1"), (0, "q2"), (1, "q3")], ["cell", "query_id"])
    out = salted_probe_join(build, probe, ["cell"], "neighbor_id", 6)
    # every (query, build) pair in the same cell appears exactly once
    assert out.count() == 40 * 2 + 3
    assert out.select("neighbor_id", "query_id").distinct().count() == out.count()


def test_salted_bipartite_join_equals_plain_join_under_tiny_cap(spark):
    """Forcing salting on BOTH sides (cap=2) must reproduce the plain join
    exactly — every cross pair once, including hot-left, hot-right, and
    mixed groups."""
    from polars_order_book_spark.functions.skew import salted_bipartite_join

    left = spark.createDataFrame(
        [("k1", i) for i in range(7)] + [("k2", i) for i in range(2)]
        + [("k3", 0)],
        "k string, lid long",
    )
    right = spark.createDataFrame(
        [("k1", 100 + i) for i in range(3)] + [("k2", 200 + i) for i in range(9)],
        "k string, rid long",
    )
    got = sorted(
        (r["k"], r["lid"], r["rid"])
        for r in salted_bipartite_join(left, right, ["k"], "lid", "rid", 2).collect()
    )
    expected = sorted(
        (r["k"], r["lid"], r["rid"])
        for r in left.join(right, on="k").collect()
    )
    assert got == expected and len(expected) == 7 * 3 + 2 * 9


# --- join-size / skew audit --------------------------------------------------

from polars_order_book_spark.functions.skew import join_size_estimate  # noqa: E402


def test_join_size_estimate_matches_actual_join(spark):
    left = spark.createDataFrame(
        [(i, i % 4) for i in range(40)] + [(100 + i, 0) for i in range(20)],
        "id long, k long",
    )
    right = spark.createDataFrame(
        [(i, i % 5) for i in range(30)], "rid long, k long"
    )
    est = {r["key"]: r for r in join_size_estimate(left, right, ["k"], top_k=100).collect()}
    actual = left.join(right, "k", "inner").count()
    assert int(est["__total__"]["join_rows"]) == actual
    # per-key contribution: key 0 has 10+20=30 left rows, 6 right rows
    assert est["0"]["n_left"] == 30 and est["0"]["n_right"] == 6
    assert int(est["0"]["join_rows"]) == 180


def test_join_size_estimate_self_join_is_f2(spark):
    df = spark.createDataFrame([(i, i % 3) for i in range(12)], "id long, k long")
    est = {r["key"]: r for r in join_size_estimate(df, df, ["k"]).collect()}
    # each key has 4 rows -> F2 = 3 * 16
    assert int(est["__total__"]["join_rows"]) == 48
    assert df.alias("a").join(df.alias("b"), "k", "inner").count() == 48


def test_join_size_estimate_all_measures_decimal38(spark):
    """The total row sums counts over ALL matched keys; at the 100 TB scales
    this audits, a plain BIGINT sum can silently wrap (non-ANSI Spark) — so
    n_left/n_right carry the same decimal(38,0) overflow-proofing as the
    join_rows products."""
    df = spark.createDataFrame([(1, 0)], "id long, k long")
    out = join_size_estimate(df, df, ["k"])
    dtypes = dict(out.dtypes)
    for c in ("n_left", "n_right", "join_rows"):
        assert dtypes[c] == "decimal(38,0)", (c, dtypes[c])


def test_join_size_estimate_top_k_deterministic_and_null_keys_excluded(spark):
    left = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "b"), (4, None)], "id long, k string"
    )
    right = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "b"), (4, None)], "rid long, k string"
    )
    rows = join_size_estimate(left, right, ["k"], top_k=1).collect()
    keys = [r["key"] for r in rows]
    # ties 2x1 vs 1x2 broken by key asc -> 'a' wins the single top slot
    assert keys == ["a", "__total__"]
    total = [r for r in rows if r["key"] == "__total__"][0]
    assert int(total["join_rows"]) == 4  # nulls never match


def test_salted_pair_join_payload_rides_through(spark):
    """payload=(col, out_a, out_b): each pair carries both members' values,
    identical to joining sizes back on after the fact."""
    rows = spark.createDataFrame(
        [(0, "h", i, 100 + i) for i in range(10)],
        ["band", "band_hash", "doc_id", "n_sh"],
    )
    got = sorted(
        map(tuple, salted_pair_join(
            rows, ["band", "band_hash"], "doc_id", "a", "b", 4,
            payload=[("n_sh", "na", "nb")],
        ).distinct().collect())
    )
    expect = sorted(
        (a, b, 100 + a, 100 + b)
        for a in range(10) for b in range(a + 1, 10)
    )
    assert got == expect


def test_salted_pair_join_pair_budget_enforced(spark):
    rows = spark.createDataFrame(
        [(0, "h", i) for i in range(10)], ["band", "band_hash", "doc_id"]
    )
    # sum n^2 = 100 > budget 50 -> assert_true fires with the caller's name
    q = salted_pair_join(
        rows, ["band", "band_hash"], "doc_id", "a", "b", 4,
        pair_budget=50, budget_msg="my_caller (use the_lsh_path)",
    )
    import pytest as _pt
    with _pt.raises(Exception) as ei:
        q.collect()
    assert "my_caller" in str(ei.value) and "pair_budget=50" in str(ei.value)
    # under budget: plain results
    ok = salted_pair_join(
        rows, ["band", "band_hash"], "doc_id", "a", "b", 4, pair_budget=1000,
    )
    assert ok.distinct().count() == 45


def test_salted_pair_join_budget_ignores_null_key_groups(spark):
    """NULL join keys never match in the equi-join, so they must not count
    toward pair_budget (review finding): 10 NULL-block rows (n²=100) plus a
    small real group must pass a budget of 50."""
    rows = spark.createDataFrame(
        [(None, "h", i) for i in range(10)] + [(0, "h", i) for i in range(5)],
        "band int, band_hash string, doc_id long",
    )
    out = salted_pair_join(
        rows, ["band", "band_hash"], "doc_id", "a", "b", 4, pair_budget=50,
    )
    # real group contributes 5*4/2 = 10 ordered pairs; NULL group none
    assert out.distinct().count() == 10


def test_salted_bipartite_join_pair_budget_enforced(spark):
    """r8: the bipartite join carries the same exact-cardinality fail-fast
    as salted_pair_join — sum over shared keys of n_left*n_right."""
    from polars_order_book_spark.functions.skew import salted_bipartite_join

    left = spark.createDataFrame(
        [(0, i) for i in range(8)], ["blk", "id_a"]
    )
    right = spark.createDataFrame(
        [(0, 100 + i) for i in range(8)], ["blk", "id_b"]
    )
    # 8*8 = 64 > 50 -> loud failure naming the caller
    q = salted_bipartite_join(
        left, right, ["blk"], "id_a", "id_b", 4,
        pair_budget=50, budget_msg="my_bip_caller (use the_lsh_path)",
    )
    import pytest as _pt
    with _pt.raises(Exception) as ei:
        q.collect()
    assert "my_bip_caller" in str(ei.value) and "pair_budget=50" in str(ei.value)
    # under budget: full bipartite product, salted, each pair exactly once
    ok = salted_bipartite_join(
        left, right, ["blk"], "id_a", "id_b", 4, pair_budget=100,
    )
    assert ok.count() == 64


def test_salted_bipartite_join_budget_ignores_null_and_unmatched(spark):
    """NULL-key groups and keys present on only ONE side contribute nothing
    to the equi-join, so neither counts toward the budget."""
    from polars_order_book_spark.functions.skew import salted_bipartite_join

    left = spark.createDataFrame(
        [(None, i) for i in range(10)] + [(7, i) for i in range(10)]
        + [(0, i) for i in range(3)],
        "blk int, id_a long",
    )
    right = spark.createDataFrame(
        [(None, 100 + i) for i in range(10)] + [(9, 100 + i) for i in range(10)]
        + [(0, 100 + i) for i in range(3)],
        "blk int, id_b long",
    )
    # only blk=0 matches: 3*3 = 9 <= 20; NULL (10*10) and one-sided keys
    # (blk=7/9) must not trip the budget
    out = salted_bipartite_join(
        left, right, ["blk"], "id_a", "id_b", 4, pair_budget=20,
    )
    assert out.count() == 9
