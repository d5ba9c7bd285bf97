"""ANN operator tests: BLAS path vs built-in brute force, LSH recall shape."""

import numpy as np
import pytest

from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StructField,
    StructType,
)

from polars_order_book_spark.operators import similarity

VEC_SCHEMA = StructType([
    StructField("vec_id", LongType()),
    StructField("embedding", ArrayType(DoubleType())),
])


def _vectors(n=200, dim=16, seed=5):
    rng = np.random.default_rng(seed)
    return [(i, rng.normal(size=dim).tolist()) for i in range(n)]


def test_blas_topk_matches_bruteforce(spark):
    rows = _vectors()
    df = spark.createDataFrame(rows, VEC_SCHEMA).repartition(4)
    queries = df.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    brute = {
        (r["query_id"], r["rank"]): (r["neighbor_id"], r["cosine"])
        for r in similarity.cosine_topk_bruteforce(df, queries, k=7).collect()
    }
    blas = {
        (r["query_id"], r["rank"]): (r["neighbor_id"], r["cosine"])
        for r in similarity.cosine_topk_blas(df, queries, k=7).collect()
    }
    assert set(brute) == set(blas)
    for key, (nid, cos) in brute.items():
        bnid, bcos = blas[key]
        assert bnid == nid
        assert bcos == pytest.approx(cos, abs=1e-12)


def test_ivf_topk_subset_of_bruteforce_with_exact_cosines(spark):
    """IVF results are exact cosines over a candidate subset: every returned
    (query, neighbor) must carry the same cosine brute force computes, ranks
    must be contiguous from 1, and per-query rows never exceed k."""
    rows = _vectors(n=300, dim=64)
    df = spark.createDataFrame(rows, VEC_SCHEMA)
    queries = df.where(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    brute = {
        (r["query_id"], r["neighbor_id"]): r["cosine"]
        for r in similarity.cosine_topk_bruteforce(df, queries, k=300).collect()
    }
    ivf = similarity.cosine_topk_ivf(df, queries, k=10, n_cells=8, n_probe=2).collect()
    per_query = {}
    for r in ivf:
        per_query.setdefault(r["query_id"], []).append(r)
        assert brute[(r["query_id"], r["neighbor_id"])] == pytest.approx(
            r["cosine"], abs=1e-12
        )
    for qid, rs in per_query.items():
        ranks = sorted(r["rank"] for r in rs)
        assert ranks == list(range(1, len(rs) + 1))
        assert len(rs) <= 10


def test_ivf_trained_centroids_improve_recall_on_clustered_data(spark):
    """On clustered vectors, k-means-trained centroids must match or beat the
    fixed pseudo-random quantizer's recall vs exact brute force."""
    rng = np.random.default_rng(3)
    centers = rng.normal(size=(6, 64)) * 3
    rows = []
    for i in range(360):
        c = centers[i % 6]
        rows.append((i, (c + rng.normal(size=64) * 0.4).tolist()))
    df = spark.createDataFrame(rows, VEC_SCHEMA)
    queries = df.where(F.col("vec_id") < 6).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    truth = {
        (r["query_id"], r["neighbor_id"])
        for r in similarity.cosine_topk_bruteforce(df, queries, k=10).collect()
    }

    def recall(result):
        hits = {(r["query_id"], r["neighbor_id"]) for r in result.collect()}
        return len(hits & truth) / len(truth)

    fixed = recall(similarity.cosine_topk_ivf(df, queries, k=10, n_cells=6, n_probe=1))
    trained_c = similarity.train_ivf_centroids(df, n_cells=6, sample=360)
    trained = recall(
        similarity.cosine_topk_ivf(df, queries, k=10, n_probe=1, centroids=trained_c)
    )
    assert trained >= fixed
    assert trained >= 0.9  # cluster-aligned cells should nearly nail top-10


def test_blas_topk_excludes_self_and_caps_k(spark):
    rows = _vectors(n=30)
    df = spark.createDataFrame(rows, VEC_SCHEMA)
    queries = df.where(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    got = similarity.cosine_topk_blas(df, queries, k=5).collect()
    assert len(got) == 5
    assert all(r["neighbor_id"] != 0 for r in got)
    assert [r["rank"] for r in sorted(got, key=lambda r: r["rank"])] == [1, 2, 3, 4, 5]


def test_train_ivf_centroids_invariant_to_partitioning(spark):
    """Centroid training samples by seeded hash-order, not partition order —
    repartitioning (or any upstream layout change) must not change centroids."""
    import numpy as np

    from polars_order_book_spark.operators.similarity import train_ivf_centroids

    rng = np.random.default_rng(3)
    rows = [(int(i), [float(x) for x in rng.normal(size=8)]) for i in range(64)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    base = train_ivf_centroids(df, vec_col="embedding", n_cells=4, sample=32, seed=5)
    shuffled = train_ivf_centroids(
        df.repartition(7), vec_col="embedding", n_cells=4, sample=32, seed=5
    )
    assert base == shuffled


def test_quantize_int8_roundtrip_error_bound(spark):
    import random

    from polars_order_book_spark.operators.similarity import (
        dequantize_int8,
        quantize_int8,
    )

    rng = random.Random(11)
    rows = [
        (i, [rng.uniform(-3, 3) for _ in range(16)]) for i in range(40)
    ] + [(99, [0.0] * 16)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = quantize_int8(df)
    got = {r["vec_id"]: r for r in dequantize_int8(q).join(
        df, on="vec_id").collect()}
    assert len(got) == 41
    for vid, r in got.items():
        assert all(-127 <= c <= 127 for c in r["qvec"])
        if vid == 99:
            assert r["scale"] == 0.0 and set(r["qvec"]) == {0}
            continue
        # reconstruction error <= half a quantization step per component
        bound = r["scale"] / 254 + 1e-6
        for x, xhat in zip(r["embedding"], r["dequantized"]):
            assert abs(x - xhat) <= bound, (vid, x, xhat, bound)


def test_centroid_outliers_finds_planted_outlier(spark):
    """A cluster at ~(1,0,...) with one planted far point: the plant must be
    rank 1 and its distance must exceed every cluster member's."""
    from pyspark.sql import functions as F
    from polars_order_book_spark.operators.similarity import centroid_outliers

    dim = 4
    rows = []
    for i in range(9):
        v = [1.0 + (i % 3) * 0.01, 0.0, 0.0, 0.0]
        rows.append((i, v, 0))
    rows.append((99, [-5.0, 5.0, 0.0, 0.0], 0))       # planted outlier
    rows.append((200, [0.0, 1.0, 0.0, 0.0], 1))       # second group, single member
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>, label int")
    out = centroid_outliers(df, top_k=3)
    g0 = [r for r in out.orderBy("label", "rank").collect() if r["label"] == 0]
    assert g0[0]["vec_id"] == 99 and g0[0]["rank"] == 1
    assert g0[0]["dist"] > g0[1]["dist"]
    g1 = [r for r in out.collect() if r["label"] == 1]
    # singleton group: centroid == the vector, distance exactly 0
    assert len(g1) == 1 and g1[0]["dist"] == 0.0


def test_centroid_outliers_median_ignores_extreme(spark):
    """Median centroid: with 5 cluster points and 1 extreme, the centroid
    stays at the cluster (mean would be dragged toward the plant)."""
    from polars_order_book_spark.operators.similarity import centroid_outliers

    rows = [(i, [10.0, 10.0], 0) for i in range(5)] + [(9, [1e6, -1e6], 0)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>, label int")
    out = {r["vec_id"]: r["dist"] for r in centroid_outliers(df, top_k=6).collect()}
    # cluster members sit ON the median centroid; only the plant is far
    for i in range(5):
        assert out[i] == 0.0
    assert out[9] > 1e5


# --- exact set-similarity join -----------------------------------------------

def test_jaccard_similarity_pairs_exact_values(spark):
    from polars_order_book_spark.operators.similarity import (
        jaccard_similarity_pairs,
    )

    rel = spark.createDataFrame(
        [("a", 1), ("a", 2), ("a", 3),
         ("b", 2), ("b", 3), ("b", 4),
         ("c", 9),
         ("a", 2)],  # duplicate row must not inflate intersection
        "s string, p long",
    )
    out = {(r["entity_a"], r["entity_b"]): r
           for r in jaccard_similarity_pairs(
               rel, entity_col="s", item_col="p", threshold=0.1).collect()}
    assert list(out) == [("a", "b")]           # c shares nothing
    assert out[("a", "b")]["n_shared"] == 2
    assert out[("a", "b")]["jaccard"] == pytest.approx(2 / 4)
    assert out[("a", "b")]["containment_a"] == pytest.approx(2 / 3)
    assert out[("a", "b")]["containment_b"] == pytest.approx(2 / 3)


def test_jaccard_similarity_threshold_filters_and_guardrail(spark):
    import pytest as _pytest

    from polars_order_book_spark.operators.similarity import (
        jaccard_similarity_pairs,
    )

    rel = spark.createDataFrame(
        [("a", 1), ("a", 2), ("b", 2), ("b", 3)], "s string, p long"
    )
    # jaccard(a,b) = 1/3
    assert jaccard_similarity_pairs(
        rel, entity_col="s", item_col="p", threshold=0.5).collect() == []
    with _pytest.raises(ValueError):
        jaccard_similarity_pairs(rel, entity_col="s", item_col="p", threshold=0)


def test_topk_recall_counts_and_misses(spark):
    from polars_order_book_spark.operators.similarity import topk_recall

    exact = spark.createDataFrame(
        [(1, 10), (1, 11), (2, 20), (2, 21)], "query_id long, neighbor_id long"
    )
    approx = spark.createDataFrame(
        [(1, 10), (1, 99), (2, 33)], "query_id long, neighbor_id long"
    )
    out = {r["query_id"]: r for r in topk_recall(approx, exact).collect()}
    assert out[1]["n_hits"] == 1 and out[1]["n_exact"] == 2
    assert out[1]["recall"] == pytest.approx(0.5)
    assert out[2]["n_hits"] == 0 and out[2]["recall"] == 0.0  # total miss row kept


def test_kmeans_step_moves_centroids_to_cluster_means(spark):
    from polars_order_book_spark.operators.similarity import kmeans_step

    # two planted clusters around (0,0) and (10,10); inits off-center
    rows = [(i, [0.0 + i * 0.1, 0.0]) for i in range(3)] + \
           [(10 + i, [10.0, 10.0 + i * 0.2]) for i in range(4)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = kmeans_step(df, [[1.0, 1.0], [9.0, 9.0]]).collect()
    got = {(r["cell"], r["d"]): r for r in out}
    assert got[(0, 0)]["n_members"] == 3 and got[(1, 0)]["n_members"] == 4
    assert got[(0, 0)]["centroid"] == pytest.approx(0.1)   # mean of 0,.1,.2
    assert got[(0, 1)]["centroid"] == 0.0
    assert got[(1, 0)]["centroid"] == 10.0
    assert got[(1, 1)]["centroid"] == pytest.approx(10.3)  # mean of 10..10.6


def test_kmeans_step_tie_breaks_to_first_centroid_and_guards(spark):
    import pytest as _pytest

    from polars_order_book_spark.operators.similarity import kmeans_step

    df = spark.createDataFrame([(1, [5.0])], "vec_id long, embedding array<double>")
    out = kmeans_step(df, [[4.0], [6.0]]).collect()  # equidistant
    assert out[0]["cell"] == 0  # first index wins deterministically
    with _pytest.raises(ValueError):
        kmeans_step(df, [])
    with _pytest.raises(ValueError):
        kmeans_step(df, [[1.0], [1.0, 2.0]])


def test_blas_topk_query_cap_fails_fast(spark):
    """The driver-side query collect is bounded: |Q| > max_queries must raise
    a clear error BEFORE any collect-sized allocation (r5 hardening)."""
    rows = _vectors(n=20, dim=4)
    df = spark.createDataFrame(rows, VEC_SCHEMA)
    queries = df.select(F.col("vec_id").alias("query_id"), "embedding")
    with pytest.raises(ValueError, match="max_queries"):
        similarity.cosine_topk_blas(df, queries, k=3, max_queries=10)
    # at exactly the cap it proceeds
    out = similarity.cosine_topk_blas(df, queries, k=3, max_queries=20)
    assert out.count() == 20 * 3


# --- SemDeDup (cluster-then-prune semantic dedup) ---------------------------


def _clustered_vectors(n_per=20, dim=16, seed=11, spread=0.02):
    """Three tight clusters: members are near-duplicates of their center."""
    rng = np.random.default_rng(seed)
    rows = []
    i = 0
    for c in range(3):
        center = rng.normal(size=dim)
        center /= np.linalg.norm(center)
        for _ in range(n_per):
            v = center + rng.normal(scale=spread, size=dim)
            rows.append((i, v.tolist()))
            i += 1
    return rows


def test_semdedup_drops_all_but_min_id_in_tight_clusters(spark):
    rows = _clustered_vectors()
    df = spark.createDataFrame(rows, VEC_SCHEMA).repartition(4)
    out = similarity.semdedup(df, n_cells=4, threshold=0.95, dim=16).collect()
    assert len(out) == 60
    # tight clusters: within-cluster cosine >= 0.95, cross-cluster far below,
    # and a whole cluster shares one nearest centroid -> survivors are exactly
    # the min id of each planted cluster (vec_id // 20), even when two
    # clusters share a cell
    cells = {r["vec_id"]: r["cell"] for r in out}
    for c in range(3):
        member_cells = {cells[i] for i in range(c * 20, (c + 1) * 20)}
        assert len(member_cells) == 1, (c, member_cells)
    kept = sorted(r["vec_id"] for r in out if r["keep"] == 1)
    assert kept == [0, 20, 40]


def test_semdedup_orthogonal_vectors_all_kept(spark):
    # one-hot vectors: pairwise cosine 0 -> nothing ever crosses a positive
    # threshold, every vector survives regardless of cell assignment
    rows = [(i, [1.0 if j == i else 0.0 for j in range(16)]) for i in range(16)]
    df = spark.createDataFrame(rows, VEC_SCHEMA)
    out = similarity.semdedup(df, n_cells=4, threshold=0.5, dim=16).collect()
    assert len(out) == 16
    assert all(r["keep"] == 1 for r in out)


def test_semdedup_min_id_wins_is_exactly_pairwise(spark):
    # keep rule is NOT transitive-closure: b dropped iff EXISTS a<b same-cell
    # with cos >= t. Construct a chain a~b, b~c, a!~c in one cell and check
    # c is still dropped only through b (pairwise), i.e. dropped here.
    import math

    a = [1.0, 0.0] + [0.0] * 14
    b = [math.cos(0.6), math.sin(0.6)] + [0.0] * 14
    c = [math.cos(1.2), math.sin(1.2)] + [0.0] * 14
    df = spark.createDataFrame([(0, a), (1, b), (2, c)], VEC_SCHEMA)
    # cos(0.6)~0.825 >= 0.8; cos(1.2)~0.362 < 0.8 -> pair (0,2) not dup,
    # pair (1,2) dup -> 2 dropped because of 1, 1 dropped because of 0.
    out = {r["vec_id"]: r["keep"] for r in
           similarity.semdedup(df, n_cells=1, threshold=0.8, dim=16,
                               centroids=[[0.0] * 16]).collect()}
    assert out == {0: 1, 1: 0, 2: 0}


def test_semdedup_salted_cell_cap_matches_unsalted(spark):
    rows = _clustered_vectors(n_per=15, seed=23, spread=0.4)
    df = spark.createDataFrame(rows, VEC_SCHEMA).repartition(3)
    plain = similarity.semdedup(df, n_cells=2, threshold=0.6, dim=16, cell_cap=None)
    salted = similarity.semdedup(df, n_cells=2, threshold=0.6, dim=16, cell_cap=4)
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


# --- knn graph ---------------------------------------------------------------


def test_knn_graph_symmetric_candidates_and_rank_contract(spark):
    rows = _clustered_vectors(n_per=10, seed=31, spread=0.05)
    df = spark.createDataFrame(rows, VEC_SCHEMA).repartition(4)
    out = similarity.knn_graph(df, k=3, dim=16).collect()
    by_src = {}
    for r in out:
        by_src.setdefault(r["src"], []).append(r)
    assert by_src, "tight clusters must collide in LSH buckets"
    for src, nbrs in by_src.items():
        ranks = sorted(n["rank"] for n in nbrs)
        assert ranks == list(range(1, len(nbrs) + 1))
        assert len(nbrs) <= 3
        cosines = [n["cosine"] for n in sorted(nbrs, key=lambda n: n["rank"])]
        assert cosines == sorted(cosines, reverse=True)
        assert all(n["dst"] != src for n in nbrs)
    # an edge serves both endpoints: if (a -> b) is a's best and they're the
    # same tight cluster, b must also list a
    srcs = set(by_src)
    for src, nbrs in by_src.items():
        for n in nbrs:
            assert n["dst"] in srcs


def test_knn_graph_matches_bruteforce_on_identical_cluster(spark):
    # all vectors identical up to tiny noise: every pair collides in every
    # band, so the graph equals exact brute-force top-k
    rng = np.random.default_rng(7)
    base = rng.normal(size=16)
    rows = [(i, (base + rng.normal(scale=1e-4, size=16)).tolist()) for i in range(12)]
    df = spark.createDataFrame(rows, VEC_SCHEMA)
    g = similarity.knn_graph(df, k=4, dim=16).collect()
    by_src = {}
    for r in g:
        by_src.setdefault(r["src"], []).append((r["rank"], r["dst"]))
    assert set(by_src) == set(range(12))
    queries = df.select(F.col("vec_id").alias("query_id"), "embedding")
    brute = similarity.cosine_topk_bruteforce(df, queries, k=4)
    bf = {}
    for r in brute.collect():
        bf.setdefault(r["query_id"], []).append((r["rank"], r["neighbor_id"]))
    for src in bf:
        assert sorted(by_src[src]) == sorted(bf[src]), src


def test_knn_graph_k_guard(spark):
    df = spark.createDataFrame(_vectors(8, dim=16), VEC_SCHEMA)
    with pytest.raises(ValueError, match="k must be > 0"):
        similarity.knn_graph(df, k=0, dim=16)


# --- incremental SemDeDup ----------------------------------------------------


def test_semdedup_incremental_corpus_always_wins(spark):
    # new vec 100 is a near-copy of corpus vec 5 -> dropped even though its
    # id is larger than nothing in the batch; unrelated new vec 101 survives
    rng = np.random.default_rng(41)
    base = rng.normal(size=16)
    corpus = spark.createDataFrame(
        [(5, base.tolist()), (6, rng.normal(size=16).tolist())], VEC_SCHEMA
    )
    new = spark.createDataFrame(
        [(100, (base + rng.normal(scale=1e-3, size=16)).tolist()),
         (101, (-base).tolist())],
        VEC_SCHEMA,
    )
    out = {r["vec_id"]: r["keep"] for r in
           similarity.semdedup_incremental(new, corpus, n_cells=4, threshold=0.9,
                                           dim=16).collect()}
    assert set(out) == {100, 101}
    assert out[100] == 0
    # -base has cosine -1 to base: never a dup at positive threshold
    assert out[101] == 1


def test_semdedup_incremental_batch_rule_matches_batch_operator(spark):
    # empty corpus: incremental must reduce exactly to the batch operator
    rows = _clustered_vectors(n_per=8, seed=47, spread=0.05)
    new = spark.createDataFrame(rows, VEC_SCHEMA)
    corpus = spark.createDataFrame([], VEC_SCHEMA)
    inc = {(r["vec_id"], r["cell"], r["keep"]) for r in
           similarity.semdedup_incremental(new, corpus, n_cells=4, threshold=0.95,
                                           dim=16).collect()}
    batch = {(r["vec_id"], r["cell"], r["keep"]) for r in
             similarity.semdedup(new, n_cells=4, threshold=0.95, dim=16).collect()}
    assert inc == batch


def test_semdedup_incremental_self_id_pair_filtered_and_salt_equivalence(spark):
    rows = _clustered_vectors(n_per=6, seed=53, spread=0.01)
    df = spark.createDataFrame(rows, VEC_SCHEMA)
    # same frame on both sides: every vector meets itself in its cell and the
    # self-pair must be ignored; a vector near-identical to ANOTHER corpus
    # vector still drops
    plain = similarity.semdedup_incremental(df, df, n_cells=2, threshold=0.95,
                                            dim=16, cell_cap=None)
    salted = similarity.semdedup_incremental(df, df, n_cells=2, threshold=0.95,
                                             dim=16, cell_cap=3)
    a = sorted(map(tuple, plain.collect()))
    b = sorted(map(tuple, salted.collect()))
    assert a == b
    # tight clusters: everything except each cluster's min id drops against
    # the corpus copy of its own cluster... including the min id itself? No:
    # min id's identical self-pair is filtered, but OTHER cluster members are
    # >= 0.95 to it, so even cluster minima drop when the corpus contains
    # their duplicates. Every vector must therefore drop here.
    keep = {r[0] for r in a if r[2] == 1}
    assert keep == set()


# --- random projection -------------------------------------------------------


def test_random_projection_shape_and_determinism(spark):
    rows = _vectors(n=40, dim=64, seed=61)
    df = spark.createDataFrame(rows, VEC_SCHEMA)
    out = similarity.random_projection(df, out_dim=6).collect()
    assert len(out) == 40 * 6
    base = {(r["vec_id"], r["d"]): r["value"] for r in out}
    again = {(r["vec_id"], r["d"]): r["value"]
             for r in similarity.random_projection(df.repartition(7), out_dim=6).collect()}
    assert base == again  # pure function of the data


def test_random_projection_matches_manual_dot(spark):
    from polars_order_book_spark.operators.similarity import _rp_component

    vec = [float(j % 5 - 2) for j in range(64)]
    df = spark.createDataFrame([(1, vec)], VEC_SCHEMA)
    out = {r["d"]: r["value"]
           for r in similarity.random_projection(df, out_dim=3).collect()}
    for d in range(3):
        acc = 0.0
        for j in range(64):
            acc = acc + vec[j] * _rp_component(d, j)
        assert out[d] == acc, d


def test_random_projection_roughly_preserves_relative_distances(spark):
    # JL sanity: a pair of near-identical vectors must project closer than a
    # pair of independent random vectors (in expectation; fixed seed)
    rng = np.random.default_rng(67)
    a = rng.normal(size=64)
    rows = [
        (0, a.tolist()),
        (1, (a + rng.normal(scale=1e-3, size=64)).tolist()),
        (2, rng.normal(size=64).tolist()),
    ]
    df = spark.createDataFrame(rows, VEC_SCHEMA)
    proj = {}
    for r in similarity.random_projection(df, out_dim=8).collect():
        proj.setdefault(r["vec_id"], [0.0] * 8)[r["d"]] = r["value"]
    d01 = sum((x - y) ** 2 for x, y in zip(proj[0], proj[1]))
    d02 = sum((x - y) ** 2 for x, y in zip(proj[0], proj[2]))
    assert d01 < d02
    with pytest.raises(ValueError, match="out_dim"):
        similarity.random_projection(df, out_dim=0)


# --- product quantization ----------------------------------------------------


def _py_fold_dot(a, b):
    # textual twin of similarity._sql_dot's left fold (same IEEE order)
    acc = 0.0
    for x, y in zip(a, b):
        acc = acc + x * y
    return acc


def _py_pq_code(vec, sub, m=4, ksub=16):
    subdim = len(vec) // m
    xs = vec[sub * subdim:(sub + 1) * subdim]
    scores = []
    for c in range(ksub):
        cw = [similarity.pq_codeword_component(sub, c, j) for j in range(subdim)]
        scores.append(_py_fold_dot(cw, cw) - (2.0 * _py_fold_dot(xs, cw)))
    return scores.index(min(scores))


def test_pq_encode_matches_python_argmin(spark):
    rows = _vectors(n=40, dim=64, seed=11)
    df = spark.createDataFrame(rows, VEC_SCHEMA)
    out = {(r["vec_id"], r["sub"]): r["code"]
           for r in similarity.pq_encode(df).collect()}
    assert len(out) == 40 * 4  # m rows per vector
    for vid, vec in rows:
        for s in range(4):
            assert out[(vid, s)] == _py_pq_code(vec, s), (vid, s)
    assert all(0 <= c < 16 for c in out.values())


def test_pq_topk_matches_python_adc(spark):
    rows = _vectors(n=60, dim=64, seed=12)
    df = spark.createDataFrame(rows, VEC_SCHEMA)
    q = df.where(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    got = [(r["query_id"], r["neighbor_id"], r["rank"], r["adist"])
           for r in similarity.pq_topk(df, q, k=5).orderBy("query_id", "rank").collect()]
    m, ksub, subdim = 4, 16, 16
    expected = []
    for qid, qvec in rows[:2]:
        adists = []
        for nid, nvec in rows:
            if nid == qid:
                continue
            acc = None
            for s in range(m):
                qs = qvec[s * subdim:(s + 1) * subdim]
                c = _py_pq_code(nvec, s)
                cw = [similarity.pq_codeword_component(s, c, j) for j in range(subdim)]
                term = ((_py_fold_dot(qs, qs) - (2.0 * _py_fold_dot(qs, cw)))
                        + _py_fold_dot(cw, cw))
                acc = term if acc is None else acc + term
            adists.append((acc, nid))
        adists.sort()
        expected.extend(
            (qid, nid, rank + 1, ad) for rank, (ad, nid) in enumerate(adists[:5])
        )
    assert got == expected


def test_pq_topk_recall_on_separated_clusters(spark):
    # two tight clusters far apart: PQ quantizes coarsely, but a query in
    # cluster A must rank A members above every B member
    rng = np.random.default_rng(13)
    a, b = rng.normal(size=64), rng.normal(size=64) + 40.0
    rows = [(i, (a + rng.normal(scale=1e-2, size=64)).tolist()) for i in range(10)]
    rows += [(100 + i, (b + rng.normal(scale=1e-2, size=64)).tolist()) for i in range(10)]
    df = spark.createDataFrame(rows, VEC_SCHEMA)
    q = df.where(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    top = similarity.pq_topk(df, q, k=9).collect()
    assert len(top) == 9
    assert all(r["neighbor_id"] < 100 for r in top), top


def test_pq_guards(spark):
    df = spark.createDataFrame(_vectors(n=3, dim=64), VEC_SCHEMA)
    with pytest.raises(ValueError, match="divide"):
        similarity.pq_encode(df, m=5, dim=64)
    with pytest.raises(ValueError, match="k must be"):
        similarity.pq_topk(df, df.selectExpr("vec_id AS query_id", "embedding"), k=0)
    with pytest.raises(ValueError, match="codebooks"):
        similarity.pq_encode(df, codebooks=[[[0.0] * 16] * 15] * 4)  # ksub mismatch


# --- multi-iteration k-means -------------------------------------------------


def test_kmeans_train_one_iter_equals_step(spark):
    df = spark.createDataFrame(_vectors(n=50, dim=16, seed=21), VEC_SCHEMA)
    cents = [[float(i == j) for j in range(16)] for i in range(3)]
    a = sorted(map(tuple, similarity.kmeans_train(
        df, centroids=cents, n_iter=1).collect()))
    b = sorted(map(tuple, similarity.kmeans_step(df, cents).collect()))
    assert a == b


def test_kmeans_train_two_iter_equals_manual_chain(spark):
    df = spark.createDataFrame(_vectors(n=50, dim=16, seed=22), VEC_SCHEMA)
    cents = [[float(i == j) for j in range(16)] for i in range(3)]
    got = sorted(map(tuple, similarity.kmeans_train(
        df, centroids=cents, n_iter=2).collect()))
    # manual: run step, fold rounded centroids (keep-previous), step again
    nxt = [list(c) for c in cents]
    for r in similarity.kmeans_step(df, cents).collect():
        nxt[r["cell"]][r["d"]] = float(r["centroid"])
    want = sorted(map(tuple, similarity.kmeans_step(df, nxt).collect()))
    assert got == want


def test_kmeans_train_keeps_previous_centroid_for_empty_cell(spark):
    # all vectors sit near the origin; centroid 1 is far away and captures
    # nothing — after training its coordinates must still be the initial ones
    rows = [(i, [0.01 * i] * 4) for i in range(6)]
    df = spark.createDataFrame(rows, VEC_SCHEMA)
    far = [100.0, 100.0, 100.0, 100.0]
    cents = [[0.0, 0.0, 0.0, 0.0], far]
    out = similarity.kmeans_train(df, centroids=cents, n_iter=3).collect()
    cells = {r["cell"] for r in out}
    assert cells == {0}  # empty cell emits no rows, but its centroid survived
    # internal evidence: a third iteration ran without KeyError on cell 1,
    # which requires keep-previous to have preserved the far centroid


def test_kmeans_train_guards(spark):
    df = spark.createDataFrame(_vectors(n=5, dim=16, seed=23), VEC_SCHEMA)
    with pytest.raises(ValueError, match="must be > 0"):
        similarity.kmeans_train(df, k=0)
    with pytest.raises(ValueError, match="must be > 0"):
        similarity.kmeans_train(df, n_iter=0)
    with pytest.raises(ValueError, match="max_collect_cells"):
        similarity.kmeans_train(df, k=8, dim=16, max_collect_cells=10)


def test_pq_ivf_topk_scores_match_pq_topk_on_shared_pairs(spark):
    """IVF pruning changes WHICH candidates are scored, never HOW: every
    (query, neighbor) the composite returns must carry exactly the adist the
    unpruned ADC scan assigns to that pair."""
    rows = _vectors(n=120, dim=64, seed=31)
    df = spark.createDataFrame(rows, VEC_SCHEMA)
    q = df.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    full = {(r["query_id"], r["neighbor_id"]): r["adist"]
            for r in similarity.pq_topk(df, q, k=120).collect()}
    ivf = similarity.pq_ivf_topk(df, q, k=10, n_cells=8, n_probe=2).collect()
    assert ivf, "probed cells produced no candidates"
    per_query = {}
    for r in ivf:
        assert full[(r["query_id"], r["neighbor_id"])] == r["adist"]
        per_query.setdefault(r["query_id"], []).append(r["rank"])
    for qid, ranks in per_query.items():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))
        assert len(ranks) <= 10


def test_pq_ivf_topk_guards(spark):
    df = spark.createDataFrame(_vectors(n=5, dim=64), VEC_SCHEMA)
    q = df.selectExpr("vec_id AS query_id", "embedding")
    with pytest.raises(ValueError, match="n_probe"):
        similarity.pq_ivf_topk(df, q, n_probe=0)
    with pytest.raises(ValueError, match="n_probe"):
        similarity.pq_ivf_topk(df, q, n_cells=4, n_probe=5)
    with pytest.raises(ValueError, match="divide"):
        similarity.pq_ivf_topk(df, q, m=7)


def test_trained_pq_codebooks_reduce_quantization_distortion(spark):
    """Lloyd's guarantee: trained codebooks never reconstruct worse than
    their seeds. Mean squared quantization error (best-codeword distance
    summed over subspaces) with 2-iteration trained books must be strictly
    below the md5-random seeds' on clustered data. (Recall@k is NOT a
    monotone function of training — coarse trained codebooks can collapse
    within-cluster noise and tie same-cluster candidates — so distortion,
    which k-means actually optimizes, is the pinned invariant.)"""
    import numpy as np
    from polars_order_book_spark.operators.similarity import (
        pq_codeword_component,
        train_pq_codebooks,
    )

    rng = np.random.RandomState(5)
    centers = rng.randn(4, 16) * 2.0
    rows = []
    for i in range(120):
        c = centers[i % 4] + rng.randn(16) * 0.15
        c = c / np.linalg.norm(c)
        rows.append((i, [float(np.float32(x)) for x in c]))
    vecs = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    m, ksub, subdim = 4, 8, 4
    books = train_pq_codebooks(vecs, m=m, ksub=ksub, dim=16, n_iter=2)
    assert len(books) == m and all(len(b) == ksub and len(b[0]) == subdim for b in books)
    seeds = [
        [[pq_codeword_component(s, c, j) for j in range(subdim)] for c in range(ksub)]
        for s in range(m)
    ]
    x = np.array([[np.float64(np.float32(v)) for v in r[1]] for r in rows])

    def distortion(bks):
        total = 0.0
        for s in range(m):
            xs = x[:, s * subdim:(s + 1) * subdim]
            cw = np.array(bks[s])
            d = ((xs[:, None, :] - cw[None, :, :]) ** 2).sum(-1)
            total += d.min(axis=1).sum()
        return total / len(x)

    assert distortion(books) < distortion(seeds)


def test_pq_ivf_residual_guardrails(spark):
    from pyspark.sql import functions as F
    from polars_order_book_spark.operators.similarity import pq_ivf_residual_topk

    vecs = spark.createDataFrame(
        [(1, [1.0] * 64)], "vec_id long, embedding array<float>"
    )
    q = vecs.select(F.col("vec_id").alias("query_id"), "embedding")
    import pytest

    with pytest.raises(ValueError, match="k must be"):
        pq_ivf_residual_topk(vecs, q, k=0)
    with pytest.raises(ValueError, match="must be positive and divide"):
        pq_ivf_residual_topk(vecs, q, m=5)
    with pytest.raises(ValueError, match="n_probe"):
        pq_ivf_residual_topk(vecs, q, n_probe=0)


def test_pq_fused_training_matches_unfused_chain(spark):
    """The r6 fused trainer (one job per Lloyd iteration across all m
    subspaces) must emit codebooks BIT-IDENTICAL to the per-subspace
    kmeans_step chain it replaced — same expression text, same decimal
    sums, same keep-previous semantics."""
    from polars_order_book_spark.operators.similarity import (
        kmeans_step,
        pq_codeword_component,
        train_pq_codebooks,
    )

    emb = (
        spark.range(200)
        .selectExpr(
            "id AS vec_id",
            "transform(sequence(1, 8), j -> CAST(pmod(id * j, 17) AS DOUBLE) / 17.0)"
            " AS embedding",
        )
    )
    m, ksub, dim, n_iter = 2, 4, 8, 2
    fused = train_pq_codebooks(emb, m=m, ksub=ksub, dim=dim, n_iter=n_iter)

    subdim = dim // m
    expected = []
    for s in range(m):
        sub = emb.selectExpr(
            f"slice(CAST(embedding AS ARRAY<DOUBLE>), {s * subdim + 1}, {subdim}) AS __sub"
        )
        cents = [
            [pq_codeword_component(s, c, j) for j in range(subdim)]
            for c in range(ksub)
        ]
        for _ in range(n_iter):
            step = kmeans_step(sub, cents, vec_col="__sub")
            nxt = [list(c) for c in cents]
            for row in step.collect():
                nxt[row["cell"]][row["d"]] = float(row["centroid"])
            cents = nxt
        expected.append(cents)
    assert fused == expected


# --- binary (sign) quantization + Hamming-shortlist rerank -----------------


def test_binary_signature_packs_sign_bits(spark):
    # dim=4 with word_bits=2 -> two words; signs chosen per bit position
    rows = [(0, [1.0, -2.0, 0.0, -0.5]), (1, [-1.0, 1.0, -1.0, 1.0])]
    df = spark.createDataFrame(rows, VEC_SCHEMA)
    out = {r["vec_id"]: (r["sig_0"], r["sig_1"]) for r in
           similarity.binary_signature(df, dim=4, word_bits=2).collect()}
    # vec 0: bits [+,-,+(zero counts as >=0),-] -> word0 = 0b01, word1 = 0b01
    assert out[0] == (1, 1)
    # vec 1: [-,+,-,+] -> word0 = 0b10, word1 = 0b10
    assert out[1] == (2, 2)


def test_binary_signature_word_bits_guard(spark):
    df = spark.createDataFrame(_vectors(4), VEC_SCHEMA)
    with pytest.raises(ValueError, match="word_bits"):
        similarity.binary_signature(df, dim=16, word_bits=63)


def test_binary_signature_raises_when_dim_exceeds_vector_length(spark):
    """A caller-declared dim beyond the actual vector length would make the
    out-of-range subscripts NULL and silently encode them as 0-bits —
    degraded recall with no error in EITHER engine, which the oracle gate
    can never catch. The per-row assertion must turn it into a loud job
    failure instead."""
    rows = [(0, [1.0, -2.0, 0.0, -0.5])]  # actual length 4
    df = spark.createDataFrame(rows, VEC_SCHEMA)
    with pytest.raises(Exception, match="binary_signature"):
        similarity.binary_signature(df, dim=8, word_bits=4).collect()


def test_binary_signature_shorter_dim_prefix_stays_legal(spark):
    """Declaring a SHORTER dim (prefix-bits signature, the ann_recall_dims
    storage-halving pattern) must keep working."""
    rows = [(0, [1.0, -2.0, 0.0, -0.5])]
    df = spark.createDataFrame(rows, VEC_SCHEMA)
    out = similarity.binary_signature(df, dim=2, word_bits=2).collect()
    assert out[0]["sig_0"] == 1  # bits [+,-] -> 0b01


def test_hamming_rerank_full_shortlist_equals_bruteforce(spark):
    """With shortlist >= corpus size, stage 1 keeps everything, so the rerank
    must reproduce the exact bruteforce ranking bit-for-bit."""
    rows = _vectors(n=60, dim=16)
    df = spark.createDataFrame(rows, VEC_SCHEMA).repartition(4)
    queries = df.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    brute = {
        (r["query_id"], r["rank"]): (r["neighbor_id"], r["cosine"])
        for r in similarity.cosine_topk_bruteforce(df, queries, k=7).collect()
    }
    rer = {
        (r["query_id"], r["rank"]): (r["neighbor_id"], r["cosine"])
        for r in similarity.cosine_topk_hamming_rerank(
            df, queries, k=7, shortlist=60, dim=16
        ).collect()
    }
    assert brute == rer


def test_hamming_rerank_shortlist_bounds_candidates(spark):
    rows = _vectors(n=80, dim=16)
    df = spark.createDataFrame(rows, VEC_SCHEMA)
    queries = df.where(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = similarity.cosine_topk_hamming_rerank(
        df, queries, k=50, shortlist=10, dim=16
    ).collect()
    # k > shortlist: per query at most `shortlist` rows survive stage 1
    per_q = {}
    for r in out:
        per_q.setdefault(r["query_id"], []).append(r)
    for q, rs in per_q.items():
        assert len(rs) == 10
        # rerank output ordering is by cosine desc within the shortlist
        cosines = [r["cosine"] for r in sorted(rs, key=lambda r: r["rank"])]
        assert cosines == sorted(cosines, reverse=True)


def test_hamming_rerank_identical_vector_is_rank_one(spark):
    """A duplicated vector has Hamming distance 0 and cosine 1 — it must
    survive the shortlist and rank first."""
    rows = _vectors(n=40, dim=16)
    dup = (999, list(rows[0][1]))
    df = spark.createDataFrame(rows + [dup], VEC_SCHEMA)
    queries = df.where(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = sorted(
        similarity.cosine_topk_hamming_rerank(
            df, queries, k=5, shortlist=8, dim=16
        ).collect(),
        key=lambda r: r["rank"],
    )
    assert out[0]["neighbor_id"] == 999
    assert out[0]["hamming"] == 0
    assert out[0]["cosine"] == pytest.approx(1.0, abs=1e-12)


def test_binary_signature_null_vector_keeps_zero_signature(spark):
    """A NULL embedding must keep its long-standing all-zero signature, not
    crash the job: assert_true raises on NULL input, so the dim guard is
    explicitly NULL-tolerant."""
    rows = [(0, [1.0, -2.0]), (1, None)]
    df = spark.createDataFrame(rows, VEC_SCHEMA)
    out = {r["vec_id"]: r["sig_0"] for r in
           similarity.binary_signature(df, dim=2, word_bits=2).collect()}
    assert out[0] == 1
    assert out[1] == 0


def test_blas_tie_break_matches_bruteforce_on_identical_vectors(spark):
    """r8 self-review: the batch-local argpartition pre-cut must apply the
    (cosine desc, neighbor_id asc) total order — 12 identical vectors in one
    batch, k=10: the 10 smallest neighbor ids must survive, exactly as
    bruteforce keeps them."""
    rows = [(i, [1.0, 2.0, 3.0]) for i in range(1, 13)]
    df = spark.createDataFrame(rows, VEC_SCHEMA).coalesce(1)
    queries = spark.createDataFrame([(0, [1.0, 2.0, 3.0])], VEC_SCHEMA).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    brute = [
        (r["rank"], r["neighbor_id"])
        for r in similarity.cosine_topk_bruteforce(df, queries, k=10)
        .orderBy("rank").collect()
    ]
    blas = [
        (r["rank"], r["neighbor_id"])
        for r in similarity.cosine_topk_blas(df, queries, k=10)
        .orderBy("rank").collect()
    ]
    assert brute == [(i, i) for i in range(1, 11)]
    assert blas == brute


def test_zero_norm_vector_fails_loudly(spark):
    """r8 self-review: a zero vector makes cosine 0/0 = NaN, which Spark
    ranks above every real match — the guard turns that silent corruption
    into a per-row assert."""
    rows = [(1, [1.0, 0.0]), (2, [0.0, 0.0]), (3, [0.0, 1.0])]
    df = spark.createDataFrame(rows, VEC_SCHEMA)
    queries = df.where(F.col("vec_id") == 1).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    with pytest.raises(Exception, match="zero-norm"):
        similarity.cosine_topk_bruteforce(df, queries, k=2).collect()
    with pytest.raises(Exception, match="zero-norm"):
        similarity.cosine_topk_blas(df, queries, k=2).collect()
    with pytest.raises(Exception, match="zero-norm"):
        similarity.semdedup(df, threshold=0.9).collect()
