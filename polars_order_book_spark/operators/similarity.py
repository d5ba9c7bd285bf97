"""Similarity search over embedding columns (array<float>).

* brute-force cosine top-k — the correctness baseline. Dot products run as
  built-in higher-order functions (zip_with + aggregate) entirely JVM-side;
  the query set is broadcast, so the scan over N vectors never shuffles:
  one pass, then a top-k window per query.
* LSH-bucketed variant (random-hyperplane signs) — the scale path: vectors
  hash into sign-pattern buckets; queries search only their bucket, turning
  the N×Q product into bucket-local joins.

Float vectors are cast to double BEFORE any arithmetic and folded
left-to-right, which makes results bit-identical to the DuckDB oracle
(same IEEE ops in the same order).

At 100 TB: brute force is one broadcast-join map stage (linear scan,
perfectly parallel); IVF/LSH bounds per-query work. Pandas-UDF batched BLAS
would beat per-row exprs on wide vectors; built-ins keep round 1 oracle-exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

def _as_double(col):
    return F.transform(col, lambda x: x.cast("double"))


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


# -- SQL-string expression builders ----------------------------------------
# Constant-heavy expressions (n_cells/n_planes × dim literal components) are
# assembled as ONE SQL string handed to F.expr instead of thousands of
# F.lit/F.array py4j calls: building the IVF assignment via Column objects
# costs ~1.9 s of driver time per query (measured, STATUS.md r5) while the
# identical expression parses JVM-side in milliseconds. The parsed tree is
# the same Catalyst expression, so results stay bit-identical.


def _sql_const_array(vals) -> str:
    """SQL double-array literal. repr() round-trips Python floats exactly and
    Spark parses to nearest double, so components match F.lit bit-for-bit."""
    return "array(" + ",".join(f"CAST('{float(x)!r}' AS DOUBLE)" for x in vals) + ")"


def _sql_dot(a: str, b: str) -> str:
    """Left-fold dot product — textual twin of :func:`_dot` (same IEEE order)."""
    return f"aggregate(zip_with({a}, {b}, (x, y) -> x * y), 0.0D, (acc, x) -> acc + x)"


def _sql_as_double(col_name: str) -> str:
    return f"transform(`{col_name}`, x -> CAST(x AS DOUBLE))"


def _guarded_norm(v, site: str):
    """``sqrt(dot(v, v))`` with a LOUD zero-norm guard for cosine
    denominators. A zero (or NULL) vector makes cosine 0/0 = NaN, and
    Spark ranks NaN ABOVE every real value — the zero vector would
    silently win rank 1 for every query and pass ``>= threshold``
    near-dup filters. The repo convention is keep-it-loud: assert per
    row instead of corrupting results. Drop or re-embed zero vectors
    before calling."""
    n = F.sqrt(_dot(v, v))
    guard = F.assert_true(
        n > 0,
        F.lit(
            f"{site}: zero-norm or NULL vector — cosine is undefined "
            "(0/0 = NaN ranks above every real match); filter zero-norm "
            "vectors out before calling"
        ),
    )
    return F.when(guard.isNull(), n)


def _topk(sim: DataFrame, k: int, extra_cols: "tuple[str, ...]" = ()) -> DataFrame:
    """Shared top-k epilogue: rank per query by (cosine desc, neighbor id)
    and keep k. ONE definition so the tie-break rule — which the
    cross-engine determinism contract and topk_recall comparisons depend
    on — cannot drift between the exact and approximate paths.
    ``extra_cols`` pass through after the standard four (e.g. the Hamming
    rerank's shortlist distance)."""
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        sim.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.col("rank").cast("long").alias("rank"),
            "cosine",
            *extra_cols,
        )
    )


def cosine_topk_bruteforce(
    vectors: DataFrame,
    queries: DataFrame,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
    k: int = 10,
) -> DataFrame:
    """Exact top-k cosine neighbors per query vector.

    Returns (query_id, neighbor_id, rank, cosine). Ties broken by neighbor id
    for cross-engine determinism.
    """
    # Norms are projected ONCE per vector before the join — the pair stage
    # then runs one dot instead of three. sqrt(dot(x,x)) is the same
    # expression either way, so cosines stay bit-identical to the oracle.
    q = queries.select(
        F.col(query_id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("qv")
    ).withColumn("qn", _guarded_norm(F.col("qv"), "cosine_topk_bruteforce"))
    v = vectors.select(
        F.col(id_col).alias("neighbor_id"), _as_double(F.col(vec_col)).alias("vv")
    ).withColumn("vn", _guarded_norm(F.col("vv"), "cosine_topk_bruteforce"))
    sim = (
        v.crossJoin(F.broadcast(q))
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            (_dot(F.col("qv"), F.col("vv")) / (F.col("qn") * F.col("vn"))).alias("cosine"),
        )
    )
    return _topk(sim, k)


def plane_component(p: int, j: int) -> float:
    """Deterministic pseudo-random hyperplane component: derived from
    md5(f"{p}:{j}") exactly like functions.hashing.hash64, but computed
    driver-side with hashlib (md5 is md5 — bit-identical to Spark's F.md5 and
    DuckDB's md5, so the SQL oracle can re-derive the same planes)."""
    import hashlib

    h = int(hashlib.md5(f"{p}:{j}".encode()).hexdigest()[:15], 16)
    return (h % 1000) / 1000.0 - 0.5


def signed_projection_buckets(
    vectors: DataFrame,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_planes: int = 8,
    dim: int = 64,
) -> DataFrame:
    """Random-hyperplane LSH: bucket = sign pattern of n_planes pseudo-random
    projections. Plane vectors are precomputed literals (no per-row hashing on
    executors — at 100 TB the planes are a constant folded into the plan).
    The whole bucket expression is one parsed SQL string (see
    ``_sql_const_array``) — n_planes × dim Column objects would otherwise
    dominate driver-side plan-build time."""
    v = _sql_as_double(vec_col)
    bits = []
    for p in range(n_planes):
        pl = _sql_const_array(plane_component(p, j) for j in range(dim))
        bits.append(f"CASE WHEN {_sql_dot(v, pl)} >= 0 THEN '1' ELSE '0' END")
    return vectors.select(
        F.col(id_col).alias("vec_id"), F.expr("concat(" + ",".join(bits) + ")").alias("bucket")
    )


def neardup_embedding_pairs(
    vectors: DataFrame,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.4,
    n_planes: int = 16,
    band_size: int = 4,
    dim: int = 64,
    bucket_cap: int | None = 4096,
    pair_budget: int | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via banded hyperplane LSH.

    MinHash-LSH's banding trick applied to sign buckets: vectors agreeing on
    ALL planes of ANY band become candidates; candidates are then verified
    with the exact cosine and kept when >= threshold. Returns
    (doc_a, doc_b, cosine).

    Scale design: candidate generation is a self-equi-join on (band, key) —
    no all-pairs product; verification joins the (small) candidate set back
    to the vectors. Recall/precision tune via n_planes/band_size exactly like
    MinHash bands; determinism comes from the md5-derived planes.
    ``bucket_cap`` (default 4096) salt-splits hot band buckets so one
    degenerate bucket (e.g. all-identical embeddings) cannot concentrate the
    pair space in a single task; None restores the plain join.
    """
    if n_planes % band_size != 0:
        raise ValueError(
            f"n_planes ({n_planes}) must be a multiple of band_size ({band_size})"
        )
    n_bands = n_planes // band_size
    # localCheckpoint: the bucket projection embeds n_planes × dim literal
    # plane components, and the banded self-join references it on BOTH sides
    # — truncating here makes Catalyst analyze the literal-heavy subtree once
    # over a tiny (vec_id, bucket) relation instead of once per join branch.
    # Driver-measured at 32 planes: plan analysis 2.7 s → <1 s; the
    # materialized relation is N rows × ~(8 + n_planes) bytes.
    b = signed_projection_buckets(
        vectors, vec_col=vec_col, id_col=id_col, n_planes=n_planes, dim=dim
    ).localCheckpoint(eager=False)
    bands = b.select(
        "vec_id",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(i).alias("band"),
                    F.substring("bucket", i * band_size + 1, band_size).alias("key"),
                )
                for i in range(n_bands)
            ])
        ).alias("bk"),
    ).select("vec_id", "bk.band", "bk.key")
    if bucket_cap:
        from polars_order_book_spark.functions.skew import salted_pair_join

        # pair_budget (opt-in): exact Σ(n choose 2) candidate estimate
        # asserted IN-PLAN before the self-join executes. A banded key
        # space is FIXED (band_size bits → 2^band_size keys per band), so
        # occupancy grows linearly with N and candidate pairs
        # quadratically once the corpus outgrows it — measured: knn_graph's
        # 8-bit bands at 200k vectors estimate ~312M pairs and OOM a 24 GB
        # local heap (r10 continuation sweep). Fail fast with the remedy
        # named instead.
        cands = salted_pair_join(
            bands, ["band", "key"], "vec_id", "doc_a", "doc_b", bucket_cap,
            pair_budget=pair_budget,
            budget_msg=(
                "neardup_embedding_pairs: banded key space saturated — "
                "band-key cardinality must scale with log2(N): raise "
                "n_planes/band_size (48/12 gives 4096 keys per band; "
                "measured at 200k vectors it cuts the estimate 745M -> "
                "67.9M and the graph completes in 95 s with "
                "pair_budget=100M), raise pair_budget once the estimate is "
                "affordable, or bucket by k-means cells first (semdedup) "
                "for the unbounded-corpus path"
            ),
        ).distinct()
    else:
        cands = (
            bands.alias("a")
            .join(bands.alias("b"), on=["band", "key"])
            .where(F.col("a.vec_id") < F.col("b.vec_id"))
            .select(F.col("a.vec_id").alias("doc_a"), F.col("b.vec_id").alias("doc_b"))
            .distinct()
        )
    v = vectors.select(
        F.col(id_col).alias("vid"), _as_double(F.col(vec_col)).alias("vv")
    ).withColumn("vn", _guarded_norm(F.col("vv"), "neardup_embedding_pairs"))
    sim = (
        cands.join(
            v.select(F.col("vid").alias("doc_a"), F.col("vv").alias("va"), F.col("vn").alias("na")),
            on="doc_a",
        )
        .join(
            v.select(F.col("vid").alias("doc_b"), F.col("vv").alias("vb"), F.col("vn").alias("nb")),
            on="doc_b",
        )
        .select(
            "doc_a",
            "doc_b",
            (_dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))).alias("cosine"),
        )
    )
    return sim.where(F.col("cosine") >= threshold).select("doc_a", "doc_b", "cosine")


def centroid_component(c: int, j: int) -> float:
    """Deterministic IVF centroid component, md5-derived like plane_component
    (distinct salt so centroids and LSH planes are independent)."""
    import hashlib

    h = int(hashlib.md5(f"ivf{c}:{j}".encode()).hexdigest()[:15], 16)
    return (h % 1000) / 1000.0 - 0.5


def train_ivf_centroids(
    vectors: DataFrame,
    *,
    vec_col: str = "embedding",
    n_cells: int = 8,
    iters: int = 5,
    sample: int = 2048,
    seed: int = 7,
) -> list:
    """Spherical k-means on a seeded sample, driver-side — returns centroid
    rows usable as :func:`cosine_topk_ivf`'s ``centroids``. The sample cap
    bounds driver memory (training data volume is irrelevant to centroid
    quality past a few thousand points); the full-data assignment still runs
    distributed.

    Sampling: rows are ordered by a seeded hash of the vector itself before
    the limit — a deterministic pseudo-random subset that is invariant to
    partitioning/row order (a bare ``limit`` picks partition-dependent rows)
    and unbiased for ordered/clustered inputs. Deterministic given
    (data, seed)."""
    import numpy as np

    rows = (
        vectors.select(vec_col)
        .orderBy(F.xxhash64(F.col(vec_col), F.lit(seed)))
        .limit(sample)
        .collect()
    )
    x = np.array([r[0] for r in rows], dtype=np.float64)
    x = x / np.linalg.norm(x, axis=1, keepdims=True)
    rng = np.random.default_rng(seed)
    cent = x[rng.choice(len(x), size=n_cells, replace=False)]
    for _ in range(iters):
        cent_unit = cent / np.linalg.norm(cent, axis=1, keepdims=True)
        assign = np.argmax(x @ cent_unit.T, axis=1)
        for c in range(n_cells):
            members = x[assign == c]
            if len(members):
                cent[c] = members.mean(axis=0)
    return [list(map(float, c)) for c in cent]


def _cell_ranked_sql(vec_sql: str, n_cells: int, dim: int, top: int,
                     centroids: list | None = None) -> str:
    """SQL array expression of the ``top`` nearest coarse cells for the
    vector expression ``vec_sql`` — the shared text between the standalone
    assignment relation and the fused single-pass projections (identical
    expression, identical cells).

    Shape matters more than size here: the old form inlined n_cells
    independent dot-fold/struct terms, and whole-stage codegen compiled all
    of them PER STAGE (~0.45 s per consuming stage at n_cells=8, dim=64 —
    the r6 ann_cosine_topk_ivf regression, where salted_probe_join's
    hot-count scan added a second such stage). This form is loop-shaped:
    ONE literal array-of-centroid-arrays and one indexed ``transform``
    lambda, so codegen emits a single loop body no matter how many cells.
    The per-row arithmetic is the same folds in the same IEEE order (the
    per-centroid ``sqrt(dot(cl,cl))`` moves from a constant-folded literal
    to an in-lambda eval — n_cells×dim extra mults/row, noise), so ranked
    cells — and every oracle — are bit-identical. Same lesson as the PQ
    codebook JIT bomb in SCALE.md: keep big constants DATA, not code.
    """
    rows = []
    for c in range(n_cells):
        comps = centroids[c] if centroids is not None else [
            centroid_component(c, j) for j in range(dim)
        ]
        rows.append(_sql_const_array(comps))
    cents = f"array({','.join(rows)})"
    # |v| is a common positive factor across cells — dropping it leaves the
    # cosine ranking (and thus the assignment) unchanged while skipping
    # n_cells redundant self-dot folds per row.
    # struct sorts lexicographically: (sim desc, cell asc) via negated cell;
    # transform's index lambda arg i is the 0-based cell id (INT, as before).
    sims = (
        f"transform({cents}, (cl, i) -> named_struct("
        f"'s', {_sql_dot(vec_sql, 'cl')} / sqrt({_sql_dot('cl', 'cl')}), "
        f"'nc', -i))"
    )
    ranked = f"slice(reverse(array_sort({sims})), 1, {top})"
    return f"transform({ranked}, x -> -x.nc)"


def _cell_assignment(vec_df: DataFrame, id_name: str, n_cells: int, dim: int,
                     top: int, centroids: list | None = None) -> DataFrame:
    """(id, cell) pairs: the ``top`` nearest coarse centroids per vector by
    cosine. Assignment is a pure projection (argmax over n_cells dot products
    against literal centroids — constant-folded, no shuffle, no Python).
    Built as ONE parsed SQL expression (see ``_sql_const_array``)."""
    cells = _cell_ranked_sql(_sql_as_double("__v"), n_cells, dim, top, centroids)
    return vec_df.select(
        F.col(id_name),
        F.explode(F.expr(cells)).alias("cell"),
    )


def cosine_topk_ivf(
    vectors: DataFrame,
    queries: DataFrame,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
    k: int = 10,
    n_cells: int = 8,
    n_probe: int = 2,
    dim: int = 64,
    centroids: list | None = None,
    cell_cap: int | None = 65536,
) -> DataFrame:
    """Approximate top-k via IVF coarse quantization: vectors index into their
    single nearest centroid's inverted list; each query probes its ``n_probe``
    nearest cells and scores only those lists.

    ``centroids``: optional trained centroid vectors (see
    :func:`train_ivf_centroids`) — better recall on clustered data; the
    default md5-derived set keeps the pipeline oracle-re-derivable.

    The coarse quantizer is a fixed set of md5-derived pseudo-random
    centroids (spherical assignment by cosine) — deterministic, plan-constant,
    and exactly re-derivable in SQL for the oracle; a production build would
    train centroids with k-means, changing only the literals. Scale shape:
    assignment is a map-only projection, the candidate join is an equi-join on
    cell id (~N·n_probe/n_cells candidates per query). ``cell_cap`` (default
    64k) salt-splits inverted lists above that size — one hot cell is a single
    join key, which AQE cannot subdivide — replicating only the (small) query
    side across the cell's salts; None restores the plain cell join."""
    if centroids is not None:
        n_cells = len(centroids)
    qa = _cell_assignment(
        queries.select(F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("__v")),
        "query_id", n_cells, dim, n_probe, centroids,
    )
    # cell is a pure projection — fused into the vector-side select rather
    # than an id-to-id self-join between two projections of the same scan
    # (queries keep the tiny join; the corpus side is the one that matters)
    cell1 = f"element_at({_cell_ranked_sql(_sql_as_double(vec_col), n_cells, dim, 1, centroids)}, 1)"
    v = vectors.select(
        F.col(id_col).alias("neighbor_id"),
        _as_double(F.col(vec_col)).alias("vv"),
        F.expr(cell1).alias("cell"),
    ).withColumn("vn", _guarded_norm(F.col("vv"), "cosine_topk_ivf"))
    q = queries.select(
        F.col(query_id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("qv")
    ).withColumn("qn", _guarded_norm(F.col("qv"), "cosine_topk_ivf")).join(qa, on="query_id")
    if cell_cap:
        from polars_order_book_spark.functions.skew import salted_probe_join

        paired = salted_probe_join(v, q, ["cell"], "neighbor_id", cell_cap)
    else:
        paired = v.join(q, on="cell")
    sim = (
        paired.where(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            (_dot(F.col("qv"), F.col("vv")) / (F.col("qn") * F.col("vn"))).alias("cosine"),
        )
    )
    # No dedup needed: each vector lives in exactly one cell, so a
    # (query, neighbor) pair meets in at most one probed cell.
    return _topk(sim, k)


def cosine_topk_blas(
    vectors: DataFrame,
    queries: DataFrame,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
    k: int = 10,
    round_digits: int | None = None,
    max_queries: int = 65536,
) -> DataFrame:
    """Exact top-k cosine via Arrow-batched numpy GEMM (the wide-vector fast
    path; same contract as :func:`cosine_topk_bruteforce`).

    Per Arrow batch of vectors, one matrix multiply computes all
    query×vector similarities at BLAS speed, and only each batch's LOCAL
    top-k rows survive to the final global top-k window — the shuffle carries
    O(partitions × |Q| × k) rows, not O(N × |Q|).

    The query set is materialized driver-side into the closure (one numpy
    matrix): top-k-per-query only makes sense for a query set that fits in
    memory, the same smallness contract the built-in path's F.broadcast
    assumes. BLAS reductions sum in a different order than the left-fold
    higher-order functions, so cosines can differ from the built-in path by
    ~1e-15; ``round_digits`` (e.g. 9) quantizes the output for cross-engine
    comparison.

    Contract narrowing vs the built-in path: ids must be INTEGER (the
    numpy id arrays and the fixed 'long' output schema assume it) — a
    non-integer id raises immediately rather than miscomparing.

    ``max_queries`` bounds the driver-side collect: above the cap the call
    fails fast with a clear error (one cheap limit(cap+1) probe) instead of
    a driver OOM deep inside collect(). Raise it only with the driver heap
    to match; for unbounded query sets use :func:`cosine_topk_bruteforce`
    (broadcast) or the bucketed LSH/IVF paths.
    """
    import numpy as np
    import pandas as pd

    for df_, col_, side in ((vectors, id_col, "vectors"), (queries, query_id_col, "queries")):
        dt = dict(df_.dtypes)[col_]
        if dt not in ("tinyint", "smallint", "int", "bigint"):
            raise TypeError(
                f"cosine_topk_blas requires integer ids; {side}.{col_} is {dt} "
                "(use cosine_topk_bruteforce for non-integer id types)"
            )
    if queries.limit(max_queries + 1).count() > max_queries:
        raise ValueError(
            f"cosine_topk_blas collects the query set driver-side; it has more "
            f"than max_queries={max_queries} rows. Use cosine_topk_bruteforce / "
            "cosine_topk_lsh / cosine_topk_ivf for large query sets, or raise "
            "max_queries along with the driver heap."
        )
    q_rows = queries.select(query_id_col, vec_col).collect()
    q_ids = np.array([r[0] for r in q_rows], dtype=np.int64)
    qm = np.array([r[1] for r in q_rows], dtype=np.float64)
    qnorm = np.linalg.norm(qm, axis=1, keepdims=True)
    if not (qnorm > 0).all():
        raise ValueError(
            "cosine_topk_blas: zero-norm query vector — cosine is undefined "
            "(same loud contract as _guarded_norm on the built-in paths)"
        )
    qm_unit = qm / qnorm
    kk = k

    def topk_batches(pdfs):
        for pdf in pdfs:
            if pdf.empty:
                continue
            ids = pdf[id_col].to_numpy()
            vm = np.array(list(pdf[vec_col]), dtype=np.float64)
            vnorm = np.linalg.norm(vm, axis=1, keepdims=True)
            if not (vnorm > 0).all():
                raise ValueError(
                    "cosine_topk_blas: zero-norm corpus vector — cosine is "
                    "undefined (same loud contract as _guarded_norm)"
                )
            vm_unit = vm / vnorm
            sims = qm_unit @ vm_unit.T  # |Q| x batch GEMM
            for qi, qid in enumerate(q_ids):
                row = sims[qi]
                keep = ids != qid
                cand_idx = np.nonzero(keep)[0]
                if len(cand_idx) > kk:
                    # argpartition alone keeps an ARBITRARY k on tied
                    # cosines; the global _topk ranks (cosine desc,
                    # neighbor_id asc), so the batch-local cut must apply
                    # the same total order or it can drop the tied
                    # candidate the contract keeps. Partition to find the
                    # kth value, widen to all ties, then lexsort the tie
                    # set and cut exactly k.
                    part = np.argpartition(-row[cand_idx], kk)[:kk]
                    thr = row[cand_idx[part]].min()
                    tied = cand_idx[row[cand_idx] >= thr]
                    order = np.lexsort((ids[tied], -row[tied]))
                    cand_idx = tied[order[:kk]]
                yield pd.DataFrame(
                    {
                        "query_id": qid,
                        "neighbor_id": ids[cand_idx],
                        "cosine": row[cand_idx],
                    }
                )

    local = vectors.select(id_col, vec_col).mapInPandas(
        topk_batches, schema="query_id long, neighbor_id long, cosine double"
    )
    out = _topk(local, k)
    if round_digits is not None:
        out = out.withColumn("cosine", F.round("cosine", round_digits))
    return out


def cosine_topk_lsh(
    vectors: DataFrame,
    queries: DataFrame,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
    k: int = 10,
    n_planes: int = 6,
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's LSH bucket.
    Scale path — the vector×query product becomes a bucket-equi-join."""
    vb = signed_projection_buckets(vectors, vec_col=vec_col, id_col=id_col, n_planes=n_planes)
    qb = signed_projection_buckets(queries, vec_col=vec_col, id_col=query_id_col, n_planes=n_planes)
    v = vectors.select(
        F.col(id_col).alias("neighbor_id"), _as_double(F.col(vec_col)).alias("vv")
    ).withColumn("vn", _guarded_norm(F.col("vv"), "cosine_topk_lsh")).join(
        vb.withColumnRenamed("vec_id", "neighbor_id"), on="neighbor_id"
    )
    q = queries.select(
        F.col(query_id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("qv")
    ).withColumn("qn", _guarded_norm(F.col("qv"), "cosine_topk_lsh")).join(
        qb.withColumnRenamed("vec_id", "query_id"), on="query_id"
    )
    sim = (
        v.join(q, on="bucket")
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            (_dot(F.col("qv"), F.col("vv")) / (F.col("qn") * F.col("vn"))).alias("cosine"),
        )
    )
    return _topk(sim, k)


def quantize_int8(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Symmetric per-vector int8 quantization — the serving-side compression
    step of an ANN pipeline (4× smaller than float32, SIMD-friendly int dot
    products; recall loss bounded by the reconstruction error below).

    Each vector is scaled by its own max-|x| so the quantized range uses all
    of [-127, 127]: q_i = round(x_i · 127 / scale), stored with the scale for
    dequantization x̂_i = q_i · scale / 127. Reconstruction error is at most
    scale/254 per component (half a quantization step, pinned by test).
    All-zero vectors emit scale 0 and all-zero codes.

    Shape: pure map-side higher-order functions (transform/array_max) inside
    whole-stage codegen — no shuffle, no Python. Rounding is floor(x + 0.5)
    rather than engine round() so the DuckDB oracle is bit-identical (both
    engines evaluate the identical IEEE float64 expression).

    Output: (id_col, scale double, qvec array<int>).
    """
    scale = F.array_max(F.transform(F.col(vec_col), lambda x: F.abs(x)))
    with_scale = df.withColumn("__scale", scale)
    q = F.transform(
        F.col(vec_col),
        lambda x: F.when(F.col("__scale") == 0, F.lit(0))
        .otherwise(
            F.floor(
                x.cast("double") * F.lit(127.0) / F.col("__scale").cast("double")
                + F.lit(0.5)
            )
        )
        .cast("int"),
    )
    return with_scale.select(
        F.col(id_col),
        F.col("__scale").cast("double").alias("scale"),
        q.alias("qvec"),
    )


def dequantize_int8(
    df: DataFrame,
    qvec_col: str = "qvec",
    scale_col: str = "scale",
) -> DataFrame:
    """Inverse of :func:`quantize_int8`: x̂_i = q_i · scale / 127 as
    array<float> (map-side transform, no shuffle)."""
    return df.withColumn(
        "dequantized",
        F.transform(
            F.col(qvec_col),
            lambda q: (
                q.cast("double") * F.col(scale_col) / F.lit(127.0)
            ).cast("float"),
        ),
    )


def centroid_outliers(
    vectors: DataFrame,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    group_col: str = "label",
    top_k: int = 10,
) -> DataFrame:
    """Per-group embedding outliers: distance of every vector to its group's
    component-wise MEDIAN centroid, top-k farthest per group — the screen for
    mislabeled / poisoned / off-distribution examples before training.

    Returns (group, vec_id, rank, dist) with rank 1 = farthest.

    The centroid is the component-wise median, not the mean: a median is a
    rank statistic, so it is independent of aggregation order (a mean over
    doubles is partial-agg order-dependent and cannot be hash-checked across
    engines) AND robust to the very outliers being hunted. The L2 distance
    is one sequential left-to-right fold per vector (same contract as _dot),
    bit-identical in the DuckDB oracle.

    Scale shape: one explode to (group, pos, x) rows and a groupBy(group,
    pos) exact median -- shuffle volume n·d, group count |groups|·d, each
    group holding that group's n values (swap in approx_percentile at
    extreme per-group counts; same plan shape). Centroids collapse to
    |groups| array rows, broadcast back, so the distance pass never shuffles
    the vector table. The final per-group top-k uses an exact rank window
    (one shuffle by group); for huge skewed groups replace it with a
    per-partition local top-k + re-rank (the BLAS ANN pattern).
    """
    v = vectors.select(
        F.col(group_col).alias("grp"),
        F.col(id_col).alias("vec_id"),
        _as_double(F.col(vec_col)).alias("vv"),
    )
    comps = v.select("grp", "vec_id", F.posexplode("vv").alias("pos", "x"))
    med = comps.groupBy("grp", "pos").agg(F.median("x").alias("m"))
    cents = (
        med.groupBy("grp")
        .agg(F.sort_array(F.collect_list(F.struct("pos", "m"))).alias("pm"))
        .select("grp", F.transform("pm", lambda s: s["m"]).alias("cent"))
    )
    diff = F.zip_with(F.col("vv"), F.col("cent"), lambda a, b: a - b)
    dist = F.sqrt(F.aggregate(diff, F.lit(0.0), lambda acc, x: acc + x * x))
    scored = v.join(F.broadcast(cents), on="grp").select(
        "grp", "vec_id", dist.alias("dist")
    )
    w = Window.partitionBy("grp").orderBy(F.col("dist").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= top_k)
        .select(
            F.col("grp").alias(group_col),
            "vec_id",
            F.col("rank").cast("long").alias("rank"),
            "dist",
        )
    )


def jaccard_similarity_pairs(
    relation: DataFrame,
    *,
    entity_col: str,
    item_col: str,
    threshold: float = 0.1,
    item_cap: int = 2000,
) -> DataFrame:
    """All entity pairs whose ITEM SETS overlap with Jaccard >= threshold —
    set-similarity self-join over a sparse (entity, item) relation
    (supplier↔part, user↔page, doc↔shingle), the relational cousin of the
    MinHash pipeline but EXACT, for when the relation is already materialized
    and |items per entity| is modest.

    Candidate generation is the inverted index: pairs are emitted only
    through shared items (never all-pairs), via the triangle-salted
    self-join so a viral item (one shared by a huge share of entities)
    cannot concentrate its |entities|² pair work in one task. The pair
    multiplicity across items IS the intersection size, so one
    groupBy((a,b)) count finishes it; set sizes join back from an
    entity-sized aggregate (broadcast when small). jaccard =
    i / (|A| + |B| - i): exact BIGINTs, one final double division —
    engine-portable bit-for-bit.

    Output: (entity_a < entity_b, n_shared, jaccard). Cost is inherently
    Σ_item (entities-per-item choose 2); ``item_cap`` bounds per-task work,
    and callers should pre-drop stopword-like items (appearing in ~every
    entity) the same way text dedup drops stopword shingles.
    """
    if not (0.0 < threshold <= 1.0):
        raise ValueError(f"threshold must be in (0, 1], got {threshold}")
    from polars_order_book_spark.functions.skew import salted_pair_join

    # localCheckpoint: `ps` feeds the size aggregate AND both sides of the
    # salted pair join (plus its hot-key probe) — four evaluations of the
    # distinct without lineage truncation.
    ps = (
        relation.select(F.col(entity_col).alias("_e"), F.col(item_col).alias("_i"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    sizes = ps.groupBy("_e").agg(F.count(F.lit(1)).alias("_n"))
    inter = (
        salted_pair_join(ps, ["_i"], "_e", "entity_a", "entity_b", item_cap)
        .groupBy("entity_a", "entity_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    sa = sizes.select(F.col("_e").alias("entity_a"), F.col("_n").alias("_na"))
    sb = sizes.select(F.col("_e").alias("entity_b"), F.col("_n").alias("_nb"))
    # No forced broadcast: sizes is entity-sized and may be huge; AQE picks
    # broadcast automatically whenever the aggregate lands under the
    # threshold, and falls back to a safe shuffle join when it doesn't.
    out = (
        inter.join(sa, "entity_a")
        .join(sb, "entity_b")
        .withColumn(
            "jaccard",
            F.col("n_shared").cast("double")
            / (F.col("_na") + F.col("_nb") - F.col("n_shared")).cast("double"),
        )
        .where(F.col("jaccard") >= threshold)
    )
    # Containment (|A∩B|/|A|) alongside Jaccard: the asymmetric measure that
    # catches subset relations Jaccard dilutes (a doc fully contained in a
    # 10x-larger one has jaccard ~0.1 but containment 1.0).
    return out.select(
        "entity_a",
        "entity_b",
        "n_shared",
        "jaccard",
        (F.col("n_shared").cast("double") / F.col("_na").cast("double")).alias(
            "containment_a"
        ),
        (F.col("n_shared").cast("double") / F.col("_nb").cast("double")).alias(
            "containment_b"
        ),
    )


def topk_recall(
    approx: DataFrame,
    exact: DataFrame,
    *,
    query_col: str = "query_id",
    neighbor_col: str = "neighbor_id",
) -> DataFrame:
    """Per-query recall of an approximate top-k result against the exact
    one — the eval harness every ANN deployment needs before trading
    accuracy for speed (tune n_planes / nprobe until recall@k clears the
    product bar, THEN ship the cheap index).

    Both inputs are (query, neighbor[, ...]) top-k tables, e.g. the outputs
    of ``cosine_topk_lsh`` and ``cosine_topk_bruteforce`` on the same query
    set. recall = |approx ∩ exact| / |exact| per query (exact-set size, not
    a fixed k, so truncated result sets score honestly). One co-partitioned
    equi-join on (query, neighbor) + one queries-sized groupBy; exact
    BIGINT counts, one final division.
    """
    a = approx.select(F.col(query_col).alias("_q"), F.col(neighbor_col).alias("_n"))
    # The exact side feeds BOTH the hits join and the totals aggregate; its
    # subtree is the expensive half (a full brute-force scan when called from
    # the recall queries) and would re-execute per consumer — truncate
    # lineage so it runs once (the hash_embed_knn multi-consumer pattern).
    e = exact.select(
        F.col(query_col).alias("_q"), F.col(neighbor_col).alias("_n")
    ).localCheckpoint(eager=False)
    hits = a.join(e, ["_q", "_n"]).groupBy("_q").agg(
        F.count(F.lit(1)).alias("n_hits")
    )
    totals = e.groupBy("_q").agg(F.count(F.lit(1)).alias("n_exact"))
    return (
        totals.join(hits, "_q", "left")
        .select(
            F.col("_q").alias(query_col),
            F.coalesce(F.col("n_hits"), F.lit(0)).alias("n_hits"),
            F.col("n_exact"),
            (
                F.coalesce(F.col("n_hits"), F.lit(0)).cast("double")
                / F.col("n_exact").cast("double")
            ).alias("recall"),
        )
    )


def topk_mrr(
    approx: DataFrame,
    exact: DataFrame,
    *,
    query_col: str = "query_id",
    neighbor_col: str = "neighbor_id",
    rank_col: str = "rank",
) -> DataFrame:
    """Per-query MRR / hit@k of an approximate ranking against the exact
    one — the rank-sensitive complement to :func:`topk_recall` (recall is
    blind to WHERE in the list the true neighbor lands; serving quality is
    not). For each query: the approx-list rank of the exact TOP-1 neighbor.

    Returns ``(query_id, best_rank, rr, hit)``: ``best_rank`` is the 1-based
    position of the exact rank-1 neighbor in the approx list (null if it is
    absent), ``rr`` its reciprocal (0.0 when absent — the standard MRR
    convention), ``hit`` whether it appeared at all. Rows are PER QUERY, not
    a corpus mean: the mean of 1/rank terms is an order-dependent float sum,
    so aggregation is left to the caller's tolerance convention; every value
    emitted here is a single exact IEEE division.

    Scale: both inputs are top-k tables (queries × k rows); one equi-join on
    (query, neighbor) + a left join back to the exact top-1 set. Nothing
    corpus-sized.
    """
    top1 = exact.where(F.col(rank_col) == 1).select(
        F.col(query_col).alias("_q"), F.col(neighbor_col).alias("_n")
    )
    a = approx.select(
        F.col(query_col).alias("_q"),
        F.col(neighbor_col).alias("_n"),
        F.col(rank_col).cast("long").alias("_r"),
    )
    found = top1.join(a, ["_q", "_n"], "left")
    return found.select(
        F.col("_q").alias(query_col),
        F.col("_r").alias("best_rank"),
        F.when(F.col("_r").isNotNull(), F.lit(1.0) / F.col("_r").cast("double"))
        .otherwise(F.lit(0.0))
        .alias("rr"),
        F.col("_r").isNotNull().alias("hit"),
    )


def kmeans_step(
    vectors: DataFrame,
    centroids: "list[list[float]]",
    *,
    vec_col: str = "embedding",
) -> DataFrame:
    """One EXACT distributed Lloyd iteration: assign every vector to its
    nearest centroid (squared-L2, first-index tie-break) and emit the new
    centroids in long form (cell, d, centroid, n_members) — the cluster-
    scale complement to :func:`train_ivf_centroids` (which k-means a
    driver-side SAMPLE). Chain calls for full k-means; the assignment and
    per-dimension means are engine-reproducible: distances are fused IEEE
    double expressions over literal centroids (argmin via array_position
    of the min — deterministic first occurrence), and each new component
    is an exact DECIMAL(30,12) sum of per-dimension values divided by the
    exact member count, so an oracle hashes the step bit-for-bit.

    Scale shape: assignment is a map-only projection against constant-
    folded centroid literals (no shuffle, no Python); the update is ONE
    map-side-partial groupBy(cell) with dim sum columns. Empty cells
    simply emit no rows (standard Lloyd: caller re-seeds or drops).

    Long-form output (cells × dim rows of scalars) rather than an array
    column keeps downstream hashing/diffing trivial.
    """
    if not centroids:
        raise ValueError("centroids must be non-empty")
    dim = len(centroids[0])
    if any(len(c) != dim for c in centroids):
        raise ValueError("all centroids must share one dimensionality")
    # All three per-dimension expression families below are single parsed SQL
    # strings (see _sql_const_array): k × dim literals built as Column objects
    # cost seconds of driver plan-build time, the parsed twin is milliseconds.
    v = _sql_as_double(vec_col)
    dists = "array(" + ",".join(
        f"aggregate(zip_with({v}, {_sql_const_array(c)}, (a, b) -> (a - b) * (a - b)),"
        " 0.0D, (acc, x) -> acc + x)"
        for c in centroids
    ) + ")"
    assigned = vectors.select(
        F.expr(
            f"CAST(array_position({dists}, array_min({dists})) - 1 AS INT)"
        ).alias("cell"),
        F.expr(v).alias("__v"),
    )
    sums = assigned.groupBy("cell").agg(
        F.count(F.lit(1)).alias("n_members"),
        *[
            F.expr(f"sum(CAST(__v[{d}] AS DECIMAL(30,12)))").alias(f"__s{d}")
            for d in range(dim)
        ],
    )
    # Reported centroids round to 6 decimals: the per-element DECIMAL(30,12)
    # cast can hit an exact tie when a float32 input is an odd multiple of
    # 2^-13 (its decimal expansion ends ...5 exactly at digit 13), and
    # HALF_UP (Spark) vs round-half-even engines then differ by 1e-12 in
    # ONE element's cast — observed once in 32k elements on the driver
    # corpus. Rounding the mean at 1e-6, eight orders above the tie noise,
    # makes the emitted value engine-stable while n_members and the
    # assignment remain bit-exact.
    parts = F.expr("array(" + ",".join(
        f"named_struct('d', {d}, 'centroid',"
        f" round(CAST(__s{d} AS DOUBLE) / CAST(n_members AS DOUBLE), 6))"
        for d in range(dim)
    ) + ")")
    return sums.select(
        "cell", F.explode(parts).alias("p"), "n_members"
    ).select("cell", F.col("p.d").alias("d"), F.col("p.centroid").alias("centroid"), "n_members")


def _semdedup_assign(
    vectors: DataFrame, centroids: "list[list[float]]", vec_col: str, id_col: str
) -> DataFrame:
    """(vec_id, cell, __v): squared-L2 argmin cell over literal centroids
    with first-index tie-break — :func:`kmeans_step`'s assignment rule as a
    map-only projection, shared by :func:`semdedup` and
    :func:`semdedup_incremental` so batch and incremental adjudicate every
    vector into the identical cell."""
    v = _sql_as_double(vec_col)
    dists = "array(" + ",".join(
        f"aggregate(zip_with({v}, {_sql_const_array(c)}, (a, b) -> (a - b) * (a - b)),"
        " 0.0D, (acc, x) -> acc + x)"
        for c in centroids
    ) + ")"
    return vectors.select(
        F.col(id_col).alias("vec_id"),
        F.expr(
            f"CAST(array_position({dists}, array_min({dists})) - 1 AS INT)"
        ).alias("cell"),
        F.expr(v).alias("__v"),
    )


def semdedup(
    vectors: DataFrame,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    centroids: "list[list[float]] | None" = None,
    n_cells: int = 8,
    threshold: float = 0.4,
    dim: int = 64,
    cell_cap: int | None = 4096,
) -> DataFrame:
    """SemDeDup: cluster-then-prune semantic deduplication (Abbas et al.
    2023, arXiv:2303.09540). Returns one verdict row per vector:
    (vec_id, cell, keep) with keep ∈ {0, 1}.

    The published recipe: k-means the embeddings, then within each cluster
    drop every point whose cosine similarity to another cluster member
    exceeds ``threshold``, keeping one representative per duplicate group.
    The deterministic keep rule here is min-id-wins — a vector is dropped
    iff some SAME-CELL vector with a smaller id is ≥ threshold — matching
    the repo-wide dedup convention (MinHash/SimHash survivors).

    Distinct from :func:`neardup_embedding_pairs` (banded hyperplane LSH):
    SemDeDup's candidate generator is the k-means partition itself, which
    is what lets the paper trade recall for a strict Σ|cell|² cost bound
    chosen via k.

    Exactness/oracle contract: assignment is squared-L2 argmin over literal
    centroids with first-index tie-break (:func:`kmeans_step`'s rule);
    cosine is the left-fold dot in ONE fixed parenthesization
    (:func:`neardup_embedding_pairs`'s rule). Both hash bit-for-bit against
    DuckDB's sequential list_dot_product.

    Scale shape (100 TB): assignment is a map-only projection against
    constant-folded centroid literals — no shuffle, no Python. The
    quadratic term is bounded to Σ|cell|²; pick n_cells ∝ corpus size to
    hold |cell| ~ n/k (the paper runs k = 11k on LAION-440M), train real
    centroids with :func:`train_ivf_centroids`, and ``cell_cap``
    salt-splits a degenerate hot cell so one task never exceeds ~cap²
    pair work. The verify join carries only same-cell candidate pairs —
    never an all-pairs product.
    """
    if centroids is None:
        centroids = [
            [centroid_component(c, j) for j in range(dim)] for c in range(n_cells)
        ]
    # localCheckpoint: the argmin projection (n_cells × dim folds per row)
    # feeds both sides of the salted self-join, the vv rerank relation, AND
    # the final verdict join — truncate lineage so it is computed once.
    assigned = _semdedup_assign(vectors, centroids, vec_col, id_col).localCheckpoint(
        eager=False
    )
    return _semdedup_verdicts(assigned, threshold, cell_cap)


def _semdedup_verdicts(
    assigned: DataFrame, threshold: float, cell_cap: "int | None"
) -> DataFrame:
    """:func:`semdedup`'s verdict pass over a PRE-ASSIGNED (and already
    checkpointed) relation — shared with :func:`semdedup_incremental` so the
    within-batch check reuses the batch's assignment instead of re-paying
    the n_cells x dim argmin folds (r8 self-review)."""
    from polars_order_book_spark.functions.skew import salted_pair_join

    ids = assigned.select("vec_id", "cell")
    if cell_cap:
        cands = salted_pair_join(
            ids, ["cell"], "vec_id", "doc_a", "doc_b", cell_cap
        ).distinct()
    else:
        cands = (
            ids.alias("a")
            .join(ids.alias("b"), on="cell")
            .where(F.col("a.vec_id") < F.col("b.vec_id"))
            .select(F.col("a.vec_id").alias("doc_a"), F.col("b.vec_id").alias("doc_b"))
        )
    vv = assigned.select(
        F.col("vec_id").alias("vid"),
        F.col("__v").alias("vv"),
        _guarded_norm(F.col("__v"), "semdedup").alias("vn"),
    )
    dup_b = (
        cands.join(
            vv.select(F.col("vid").alias("doc_a"), F.col("vv").alias("va"), F.col("vn").alias("na")),
            on="doc_a",
        )
        .join(
            vv.select(F.col("vid").alias("doc_b"), F.col("vv").alias("vb"), F.col("vn").alias("nb")),
            on="doc_b",
        )
        .where(
            _dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))
            >= F.lit(float(threshold))
        )
        .select(F.col("doc_b").alias("vec_id"))
        .distinct()
    )
    return (
        assigned.select("vec_id", "cell")
        .join(dup_b.withColumn("__dup", F.lit(1)), on="vec_id", how="left")
        .select(
            "vec_id",
            "cell",
            F.when(F.col("__dup").isNull(), F.lit(1)).otherwise(F.lit(0)).alias("keep"),
        )
    )


def knn_graph(
    vectors: DataFrame,
    *,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_planes: int = 32,
    band_size: int = 8,
    dim: int = 64,
    bucket_cap: int | None = 4096,
    pair_budget: int | None = 50_000_000,
) -> DataFrame:
    """Approximate k-nearest-neighbor GRAPH: top-k cosine neighbors for
    EVERY vector at once → (src, dst, rank, cosine). The all-points
    complement to :func:`cosine_topk_lsh` (which answers for a bounded
    query set) — the structure graph-based curation consumes: neighborhood
    density for pruning, label propagation, kNN-classifier quality scoring,
    and the edge input of :func:`..dedup.neardup_components`-style
    clustering.

    Candidates come from the banded hyperplane LSH self-join of
    :func:`neardup_embedding_pairs` (vectors agreeing on ALL planes of ANY
    band), each surviving pair is reranked with the EXACT cosine, pairs are
    symmetrized (an edge serves both endpoints, so the cosine fold is paid
    once per pair, not twice), and each source keeps its k best by
    (cosine desc, dst asc) — :func:`_topk`'s tie-break rule. Recall tunes
    via n_planes/band_size exactly like the retrieval path; a vector whose
    band buckets are all singletons emits no rows.

    Scale shape (100 TB): candidate generation is a self-EQUI-join on
    (band, key) — never an all-pairs product — with ``bucket_cap``
    salt-splitting degenerate hot buckets (per-task work ≤ ~cap²); the
    rerank joins only colliding pairs back to the vectors; the final top-k
    is a per-src window over each node's own candidate list. Every shuffle
    keys on (band, key), pair ids, or src — all data-parallel.

    Parameter choice IS the scale lever here: because the graph keeps every
    colliding pair (threshold = -1), the random-pair collision rate
    ~ n_bands / 2**band_size bounds candidate volume. The near-dup default
    (16 planes / 4-per-band → 4/16) admits ~23% of ALL pairs as candidates
    — measured 461k of 2M possible on the 2k-row driver corpus — which is
    all-pairs in disguise at 1e9 rows. The graph default (32 planes /
    8-per-band → 4/256 ≈ 1.6%) keeps candidates ~linear-ish in N·E[bucket]
    while still probing 4 independent bands for recall; drop band_size for
    higher recall when the corpus is small enough to afford it.
    """
    if k <= 0:
        raise ValueError(f"k must be > 0, got {k}")
    # localCheckpoint: the symmetrizing union consumes `pairs` twice; without
    # truncation the whole LSH self-join + cosine rerank pipeline executes
    # once per union branch.
    pairs = neardup_embedding_pairs(
        vectors,
        vec_col=vec_col,
        id_col=id_col,
        threshold=-1.0,  # keep every colliding pair; ranking happens below
        n_planes=n_planes,
        band_size=band_size,
        dim=dim,
        bucket_cap=bucket_cap,
        # Default 50M budget: the all-points graph verifies EVERY colliding
        # pair, so a saturated fixed band-key space (2^band_size keys) is a
        # memory bomb, not just slow — 200k vectors at the 8-bit default
        # estimate ~312M pairs and OOMed a 24 GB heap before this guard.
        # The error names the fix (scale n_planes/band_size with log2 N).
        pair_budget=pair_budget,
    ).localCheckpoint(eager=False)
    edges = pairs.select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"), "cosine"
    ).unionByName(
        pairs.select(
            F.col("doc_b").alias("src"), F.col("doc_a").alias("dst"), "cosine"
        )
    )
    w = Window.partitionBy("src").orderBy(F.col("cosine").desc(), F.col("dst"))
    return (
        edges.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("src", "dst", F.col("rank").cast("long").alias("rank"), "cosine")
    )


def semdedup_incremental(
    new: DataFrame,
    corpus: DataFrame,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    centroids: "list[list[float]] | None" = None,
    n_cells: int = 8,
    threshold: float = 0.4,
    dim: int = 64,
    cell_cap: int | None = 4096,
) -> DataFrame:
    """Incremental SemDeDup: adjudicate a NEW embedding batch against an
    EXISTING corpus without re-paying corpus×corpus pairs — the crawl-loop
    shape of :func:`semdedup`, mirroring
    :func:`..dedup.minhash_lsh_incremental_pairs` for the semantic family.
    Returns one verdict row per NEW vector: (vec_id, cell, keep).

    A new vector is dropped iff, within its cell, it is >= ``threshold``
    cosine to ANY corpus member (the corpus always wins — it is already in
    the training set) or to a smaller-id member of its own batch
    (:func:`semdedup`'s min-id rule within the batch). Cells, cosines, and
    tie-breaks are computed by the same shared code as the batch operator,
    so a vector pair scores identically whichever entry point meets it.

    Scale shape (100 TB): both sides assign cells map-only; the cross-check
    is a BIPARTITE cell equi-join (new × corpus per cell) — pair volume is
    O(new-side collisions), never corpus² — salt-split on BOTH sides past
    ``cell_cap`` (:func:`..functions.skew.salted_bipartite_join`); the
    within-batch check is the batch operator's bounded triangle. A vector id
    present on both sides pairs with itself and is filtered.
    """
    if centroids is None:
        centroids = [
            [centroid_component(c, j) for j in range(dim)] for c in range(n_cells)
        ]
    # localCheckpoint: a_new feeds the bipartite join AND the final verdict
    # join (and the corpus side is reused by the salted join's size agg) —
    # truncate so each side's argmin projection is computed once.
    a_new = _semdedup_assign(new, centroids, vec_col, id_col).localCheckpoint(
        eager=False
    )
    a_cor = _semdedup_assign(corpus, centroids, vec_col, id_col).localCheckpoint(
        eager=False
    )

    def with_norm_cols(assigned: DataFrame, ident: str) -> DataFrame:
        return assigned.select(
            F.col("vec_id").alias(ident),
            F.col("cell"),
            F.col("__v").alias(f"__v_{ident}"),
            _guarded_norm(F.col("__v"), "semdedup_incremental").alias(f"__n_{ident}"),
        )

    ln = with_norm_cols(a_new, "new_id")
    rc = with_norm_cols(a_cor, "corpus_id")
    if cell_cap:
        from polars_order_book_spark.functions.skew import salted_bipartite_join

        met = salted_bipartite_join(
            ln, rc, ["cell"], "new_id", "corpus_id", cell_cap
        )
    else:
        met = ln.join(rc, on="cell")
    vs_corpus = (
        met.where(F.col("new_id") != F.col("corpus_id"))
        .where(
            _dot(F.col("__v_new_id"), F.col("__v_corpus_id"))
            / (F.col("__n_new_id") * F.col("__n_corpus_id"))
            >= F.lit(float(threshold))
        )
        .select(F.col("new_id").alias("vec_id"))
    )
    # within-batch min-id rule: the batch operator's verdict pass over the
    # ALREADY-assigned (and checkpointed) new batch — same pair scoring,
    # without re-paying the argmin assignment (r8 self-review)
    batch_dropped = (
        _semdedup_verdicts(a_new, threshold, cell_cap)
        .where(F.col("keep") == 0)
        .select("vec_id")
    )
    dropped = vs_corpus.unionByName(batch_dropped).distinct()
    return (
        a_new.select("vec_id", "cell")
        .join(dropped.withColumn("__dup", F.lit(1)), on="vec_id", how="left")
        .select(
            "vec_id",
            "cell",
            F.when(F.col("__dup").isNull(), F.lit(1)).otherwise(F.lit(0)).alias("keep"),
        )
    )


def random_projection(
    vectors: DataFrame,
    *,
    out_dim: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dim: int = 64,
) -> DataFrame:
    """Johnson-Lindenstrauss random projection: compress each embedding to
    ``out_dim`` components via dot products against md5-derived pseudo-random
    planes (the same deterministic constants machinery as the LSH family —
    :func:`plane_component` with a distinct salt lives in the same md5
    universe). JL guarantees pairwise distances distort by at most
    ~sqrt(log n / out_dim); the standard cheap pre-compression before ANN
    indexing or clustering when the raw embedding is wide.

    Output is LONG FORM (vec_id, d, value) — scalar rows hash/diff trivially
    (the :func:`kmeans_step` convention).

    Scale shape: a pure map-only projection against constant-folded literal
    planes — no shuffle, no state, no Python; at 100 TB this pipelines into
    the scan.
    """
    if out_dim <= 0:
        raise ValueError(f"out_dim must be > 0, got {out_dim}")
    v = _sql_as_double(vec_col)
    comps = ",".join(
        f"named_struct('d', {d}, 'value',"
        f" {_sql_dot(v, _sql_const_array(_rp_component(d, j) for j in range(dim)))})"
        for d in range(out_dim)
    )
    return vectors.select(
        F.col(id_col).alias("vec_id"),
        F.explode(F.expr(f"array({comps})")).alias("p"),
    ).select(
        "vec_id",
        F.col("p.d").cast("int").alias("d"),
        F.col("p.value").alias("value"),
    )


def _rp_component(d: int, j: int) -> float:
    """Deterministic projection-plane component (salt 'rp' — independent of
    the LSH planes and IVF centroids sharing the md5 universe)."""
    import hashlib

    h = int(hashlib.md5(f"rp{d}:{j}".encode()).hexdigest()[:15], 16)
    return (h % 1000) / 1000.0 - 0.5


def pq_codeword_component(sub: int, c: int, j: int) -> float:
    """Deterministic product-quantization codeword component, derived from
    md5(f"pq{sub}/{c}:{j}") exactly like :func:`centroid_component` (salt
    'pq.../...' — independent of the LSH / IVF / RP md5 families). Driver and
    DuckDB recompute identical doubles, so the PQ oracles are closed-form."""
    import hashlib

    h = int(hashlib.md5(f"pq{sub}/{c}:{j}".encode()).hexdigest()[:15], 16)
    return (h % 1000) / 1000.0 - 0.5


def _pq_code_exprs(
    vec_sql: str, m: int, ksub: int, dim: int, codebooks: list | None
) -> "list[str]":
    """One argmin SQL expression per subspace: the code is the first index
    minimizing ||x_s - c||^2. |x_s|^2 is a common additive term across the
    sub's codewords, so the scored form is |c|^2 - 2<x_s, c> — argmin-
    invariant and one fold cheaper; BOTH engines use this same dropped form,
    so scores (and tie-breaks) agree bit-for-bit."""
    subdim = dim // m
    exprs = []
    for s in range(m):
        xs = f"slice({vec_sql}, {s * subdim + 1}, {subdim})"
        scores = []
        for c in range(ksub):
            cw = (
                codebooks[s][c]
                if codebooks is not None
                else [pq_codeword_component(s, c, j) for j in range(subdim)]
            )
            cl = _sql_const_array(cw)
            scores.append(f"({_sql_dot(cl, cl)} - (2.0D * {_sql_dot(xs, cl)}))")
        arr = f"array({','.join(scores)})"
        exprs.append(f"CAST(array_position({arr}, array_min({arr})) - 1 AS INT)")
    return exprs


def pq_encode(
    vectors: DataFrame,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    m: int = 4,
    ksub: int = 16,
    dim: int = 64,
    codebooks: list | None = None,
) -> DataFrame:
    """Product-quantization encoding: split each vector into ``m`` subspaces
    of dim/m components and store only the index of the nearest codeword per
    subspace — (vec_id, sub, code) long form, m rows per vector.

    The 100 TB point of PQ is the INDEX, not the query: m codes of
    log2(ksub) bits replace dim floats (m=4, ksub=16 → 2 bytes vs 256 —
    a 128x smaller scan for the ADC search in :func:`pq_topk`). Encoding is
    a map-only projection against literal codebooks (constant-folded, no
    shuffle, no Python) built as parsed SQL — the same plan-build discipline
    as :func:`_cell_assignment`. ``codebooks`` accepts trained per-subspace
    codewords (list[m][ksub][subdim]); the md5-derived default keeps the
    pipeline oracle-re-derivable. Ties argmin to the FIRST minimizing code
    (array_position semantics), matching the oracle's (score, c) ordering.
    """
    if m <= 0 or dim % m != 0:
        raise ValueError(f"m ({m}) must be positive and divide dim ({dim})")
    if codebooks is not None:
        if len(codebooks) != m or any(len(cb) != ksub for cb in codebooks):
            raise ValueError("codebooks must be list[m][ksub][dim//m]")
    v = _sql_as_double(vec_col)
    exprs = _pq_code_exprs(v, m, ksub, dim, codebooks)
    structs = ",".join(
        f"named_struct('sub', {s}, 'code', {e})" for s, e in enumerate(exprs)
    )
    # NO fan_out_for_compute here, deliberately: encode-as-pure-projection
    # (zero Exchanges, codes built in the read pass) is the 100 TB contract
    # this operator exists for, and it is plan-pinned
    # (tests/test_plans.py::test_pq_encode_plan_is_map_only). The fused
    # TRAINER fans out instead — that is where the narrow-scan compute
    # bottleneck actually was.
    return vectors.select(
        F.col(id_col).alias("vec_id"), F.explode(F.expr(f"array({structs})")).alias("sc")
    ).select("vec_id", F.col("sc.sub").alias("sub"), F.col("sc.code").alias("code"))


def _seq_sq_norm(xs: "list[float]") -> float:
    """Sequential left-to-right Σx² — bit-identical to the engines' dot
    folds (aggregate/zip_with and list_dot_product), the same equivalence
    pq_ivf_residual_topk's ``cc`` column already relies on."""
    acc = 0.0
    for x in xs:
        acc += x * x
    return acc


def _pq_lut_builder(
    queries: DataFrame,
    query_id_col: str,
    vec_col: str,
    m: int,
    ksub: int,
    subdim: int,
    codebooks: "list | None",
) -> DataFrame:
    """Shared ADC lookup-table build for :func:`pq_topk` /
    :func:`pq_ivf_topk`: per query, per subspace, the ksub entries
    ``((|q_s|² - 2⟨q_s,c⟩) + |c|²)`` with pinned associativity.

    Two codegen-size reductions that change NO value: ``|c|²`` is a
    driver-computed literal (sequential fold == the engine fold bit-for-bit,
    see :func:`_seq_sq_norm`), and ``|q_s|²`` is projected ONCE per subspace
    instead of re-folded in all ksub entries (same expression, same bits —
    referenced as a column). Before this the LUT stage carried 3 dot-folds
    per entry (m·ksub·3 = 192 inlined 16-component folds) through parse +
    whole-stage codegen; now it carries m·ksub = 64 plus m hoisted ones.
    """
    qv = _sql_as_double(vec_col)
    pre = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(vec_col),
        *[
            F.expr(
                _sql_dot(
                    f"slice({qv}, {s * subdim + 1}, {subdim})",
                    f"slice({qv}, {s * subdim + 1}, {subdim})",
                )
            ).alias(f"__qq_{s}")
            for s in range(m)
        ],
    )
    lut_cols = []
    for s in range(m):
        qs = f"slice({qv}, {s * subdim + 1}, {subdim})"
        entries = []
        for c in range(ksub):
            cw = (
                codebooks[s][c]
                if codebooks is not None
                else [pq_codeword_component(s, c, j) for j in range(subdim)]
            )
            cl = _sql_const_array(cw)
            cc = _seq_sq_norm([float(x) for x in cw])
            entries.append(
                f"((__qq_{s} - (2.0D * {_sql_dot(qs, cl)}))"
                f" + CAST('{cc!r}' AS DOUBLE))"
            )
        lut_cols.append(F.expr(f"array({','.join(entries)})").alias(f"lut_{s}"))
    return pre.select("query_id", *lut_cols)


def pq_topk(
    vectors: DataFrame,
    queries: DataFrame,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
    k: int = 10,
    m: int = 4,
    ksub: int = 16,
    dim: int = 64,
    codebooks: list | None = None,
) -> DataFrame:
    """Approximate top-k nearest neighbors by PQ asymmetric distance
    computation (ADC): corpus vectors are quantized to m codes
    (:func:`pq_encode`'s wide twin), each query precomputes one lookup table
    of ksub distances per subspace, and each (query, vector) candidate costs
    m array lookups + m-1 adds instead of a dim-length fold. Returns
    (query_id, neighbor_id, rank, adist) ranked by adist ASC (squared-L2
    estimate), neighbor_id tie-break.

    Scale shape: the scan side carries ONLY (id, m small ints) — the
    128x-compressed index — while the query side (bounded Q rows x
    m*ksub-double LUTs, computed distributively from literal codebooks) is
    broadcast; the per-pair work is m element_at lookups. The BNLJ is the
    same deliberately-bounded vectors x broadcast-queries shape as
    :func:`cosine_topk_bruteforce`. The final top-k is a per-query window.

    Cross-engine exactness: each LUT entry is ((|q_s|^2 - 2<q_s,c>) + |c|^2)
    with pinned associativity, and adist sums the m looked-up doubles
    left-to-right — bit-identical in Spark and the SQL oracle.
    """
    if k <= 0:
        raise ValueError(f"k must be > 0, got {k}")
    if m <= 0 or dim % m != 0:
        raise ValueError(f"m ({m}) must be positive and divide dim ({dim})")
    subdim = dim // m
    v = _sql_as_double(vec_col)
    code_exprs = _pq_code_exprs(v, m, ksub, dim, codebooks)
    codes = vectors.select(
        F.col(id_col).alias("neighbor_id"),
        *[F.expr(e).alias(f"code_{s}") for s, e in enumerate(code_exprs)],
    )
    luts = _pq_lut_builder(queries, query_id_col, vec_col, m, ksub, subdim, codebooks)
    adist = "(" * (m - 1) + " + ".join(
        f"element_at(lut_{s}, code_{s} + 1)" + (")" if s > 0 else "")
        for s in range(m)
    )
    sim = (
        codes.crossJoin(F.broadcast(luts))
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", F.expr(adist).alias("adist"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("adist").asc(), F.col("neighbor_id"))
    return (
        sim.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.col("rank").cast("long").alias("rank"), "adist")
    )


def kmeans_train(
    vectors: DataFrame,
    *,
    k: int = 8,
    n_iter: int = 2,
    dim: int = 64,
    vec_col: str = "embedding",
    centroids: list | None = None,
    max_collect_cells: int = 65536,
) -> DataFrame:
    """Full distributed Lloyd training: ``n_iter`` EXACT iterations of
    :func:`kmeans_step`, starting from the md5-derived centroids (or
    ``centroids``). Between iterations the k × dim rounded centroid scalars
    collect to the driver — bounded and corpus-size-independent, the same
    bounded-collect contract as the BLAS query cap and the BPE vocab cap
    (``max_collect_cells`` fails fast on absurd k·dim) — and fold into the
    next assignment as plan literals. Returns the FINAL iteration's
    (cell, d, centroid, n_members) long form, still lazy.

    Empty-cell policy: a cell that captured no vectors keeps its previous
    centroid (stable cell ids across iterations; re-seeding is the caller's
    knob via ``centroids``).

    Cross-engine exactness: each iteration's emitted centroid is the
    DECIMAL(30,12)-exact mean rounded at 1e-6 (see kmeans_step), so the
    literals both engines carry into iteration i+1 are the same doubles and
    the whole CHAIN is oracle-re-derivable — the oracle replays iteration 1
    in SQL and feeds its centroid lists into iteration 2's distances.

    Scale shape per iteration: one map-only assignment against literal
    centroids + one map-side-partial groupBy(cell) — the driver round-trip
    carries k·dim scalars only, never data.
    """
    if k <= 0 or n_iter <= 0:
        raise ValueError(f"k ({k}) and n_iter ({n_iter}) must be > 0")
    if centroids is not None:
        k = len(centroids)
        cents = [list(map(float, c)) for c in centroids]
        dim = len(cents[0])
    else:
        cents = [[centroid_component(c, j) for j in range(dim)] for c in range(k)]
    if k * dim > max_collect_cells:
        raise ValueError(
            f"k*dim = {k * dim} exceeds max_collect_cells ({max_collect_cells}); "
            "the inter-iteration collect must stay bounded"
        )
    step = kmeans_step(vectors, cents, vec_col=vec_col)
    for _ in range(n_iter - 1):
        collected = step.collect()
        nxt = [list(c) for c in cents]  # keep-previous default
        for row in collected:
            nxt[row["cell"]][row["d"]] = float(row["centroid"])
        cents = nxt
        step = kmeans_step(vectors, cents, vec_col=vec_col)
    return step


def pq_ivf_topk(
    vectors: DataFrame,
    queries: DataFrame,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
    k: int = 10,
    n_cells: int = 8,
    n_probe: int = 2,
    m: int = 4,
    ksub: int = 16,
    dim: int = 64,
    cell_cap: int | None = 65536,
) -> DataFrame:
    """IVF-PQ: the production ANN serving shape — IVF's coarse quantizer
    prunes the search to ``n_probe`` probed cells per query (an EQUI-join on
    cell id, never a cross product), and within those cells candidates are
    scored by PQ asymmetric distance over the m-code compressed index
    (:func:`pq_topk`'s LUT lookups). Returns
    (query_id, neighbor_id, rank, adist) ranked by adist ASC.

    This variant quantizes the RAW vector per cell (IVF-Flat-PQ); classical
    residual encoding (quantize v − centroid(cell), sharper at the same m)
    is the production upgrade — it only changes which literals feed
    :func:`_pq_code_exprs`, not the plan shape.

    Scale shape (100 TB): the index relation carries (id, cell, m codes) —
    ~3 small ints per vector; the probe join replicates each query to its
    n_probe cells only (N·n_probe/n_cells expected candidates); ``cell_cap``
    salt-splits hot inverted lists exactly like :func:`cosine_topk_ivf`.
    Scoring is m element_at lookups per candidate. Nothing in the plan
    touches raw vectors after the two map-only projections.

    Cross-engine exactness: same pinned-associativity LUT/adist algebra as
    :func:`pq_topk`; cell assignment reuses :func:`_cell_assignment`'s
    argmax-by-(sim desc, cell) contract.
    """
    if k <= 0:
        raise ValueError(f"k must be > 0, got {k}")
    if m <= 0 or dim % m != 0:
        raise ValueError(f"m ({m}) must be positive and divide dim ({dim})")
    if n_probe <= 0 or n_probe > n_cells:
        raise ValueError(f"n_probe ({n_probe}) must be in [1, n_cells ({n_cells})]")
    subdim = dim // m
    v = _sql_as_double(vec_col)
    code_exprs = _pq_code_exprs(v, m, ksub, dim, None)
    # Codes AND the coarse cell are both pure projections of the same row —
    # ONE select, never an id-to-id self-join between two projections of the
    # same scan (that join shuffled the full index relation for nothing).
    # element_at(top-1 ranked cells, 1) is the same expression text as the
    # standalone assignment, so cells are identical.
    cell1 = f"element_at({_cell_ranked_sql(v, n_cells, dim, 1, None)}, 1)"
    codes = vectors.select(
        F.col(id_col).alias("neighbor_id"),
        *[F.expr(e).alias(f"code_{s}") for s, e in enumerate(code_exprs)],
        F.expr(cell1).alias("cell"),
    )
    qa = _cell_assignment(
        queries.select(F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("__v")),
        "query_id", n_cells, dim, n_probe, None,
    )
    luts = _pq_lut_builder(
        queries, query_id_col, vec_col, m, ksub, subdim, None
    ).join(qa, on="query_id")
    if cell_cap:
        from polars_order_book_spark.functions.skew import salted_probe_join

        paired = salted_probe_join(codes, luts, ["cell"], "neighbor_id", cell_cap)
    else:
        paired = codes.join(luts, on="cell")
    adist = "(" * (m - 1) + " + ".join(
        f"element_at(lut_{s}, code_{s} + 1)" + (")" if s > 0 else "")
        for s in range(m)
    )
    sim = (
        paired.where(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", F.expr(adist).alias("adist"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("adist").asc(), F.col("neighbor_id"))
    return (
        sim.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.col("rank").cast("long").alias("rank"), "adist")
    )


def shifted_pq_codebook(cell: int, m: int, ksub: int, subdim: int) -> "list[list[list[float]]]":
    """Residual-PQ codebooks for one IVF cell: codeword'_{s,c} =
    centroid_slice(cell, s) + codeword(s, c). Scoring absolute vectors
    against the SHIFTED codewords is algebraically identical to scoring
    residuals (v − centroid) against the raw codewords, so both the encode
    argmin and the ADC LUT reuse the plain-PQ expression builders with these
    literals — 'changes the literals, not the plan'."""
    return [
        [
            [
                centroid_component(cell, s * subdim + j)
                + pq_codeword_component(s, c, j)
                for j in range(subdim)
            ]
            for c in range(ksub)
        ]
        for s in range(m)
    ]


def pq_ivf_residual_topk(
    vectors: DataFrame,
    queries: DataFrame,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
    k: int = 10,
    n_cells: int = 8,
    n_probe: int = 2,
    m: int = 4,
    ksub: int = 16,
    dim: int = 64,
    cell_cap: int | None = 65536,
) -> DataFrame:
    """IVF-PQ with RESIDUAL encoding — the classical production form
    (Jégou/Douze/Schmid PQ paper §IVFADC): each vector is quantized as
    v ≈ centroid(cell) + codeword_concat, i.e. PQ codes cover the residual
    v − centroid, which is far more compressible than the raw vector at the
    same m (residual norms are a fraction of vector norms once the coarse
    quantizer has explained the cell structure).

    Implementation: because the codebook is now CELL-dependent (n_cells ×
    m × ksub codewords instead of m × ksub), constant-folding it into
    expressions would put n_cells× more dot products into whole-stage
    codegen — measured 18 s plan-build + 16 s execution at sf0.01, JIT
    compile dominated. Instead the shifted codebook is a 512-row BROADCAST
    RELATION (cell, s, c, cw, cc=|cw|²): encode scores each vector's m
    sub-slices against its cell's 64 codeword rows via one broadcast join
    + a struct-min groupBy (map-side partial); the query LUT is the same
    join on the (queries × n_probe)-row side. adist approximates
    ||q − (centroid + codewords)||² — reconstruction-aware, unlike the
    flat variant's raw-vector quantization.

    Cross-engine exactness: codeword components are the same Python-float
    sums DuckDB re-derives from the md5 formulas; |cw|² is the sequential
    left-to-right fold both engines use for dots; the struct-min argmin
    (score asc, c asc) matches the oracle's row_number tie-break, and the
    adist associativity is pinned identically to :func:`pq_topk`.
    """
    if k <= 0:
        raise ValueError(f"k must be > 0, got {k}")
    if m <= 0 or dim % m != 0:
        raise ValueError(f"m ({m}) must be positive and divide dim ({dim})")
    if n_probe <= 0 or n_probe > n_cells:
        raise ValueError(f"n_probe ({n_probe}) must be in [1, n_cells ({n_cells})]")
    subdim = dim // m
    v = _sql_as_double(vec_col)
    spark = vectors.sparkSession

    scw_rows = []
    for cell in range(n_cells):
        book = shifted_pq_codebook(cell, m, ksub, subdim)
        for s in range(m):
            for c in range(ksub):
                cw = book[s][c]
                scw_rows.append((cell, s, c, cw, _seq_sq_norm(cw)))
    scw = spark.createDataFrame(
        scw_rows, "cell int, s int, c int, cw array<double>, cc double"
    )
    # sub-slice explode: (id, cell, s, vs) — one posexplode over m slices
    slices = "array(" + ",".join(
        f"slice({v}, {s * subdim + 1}, {subdim})" for s in range(m)
    ) + ")"

    def _sub_rows(df: DataFrame, id_name: str) -> DataFrame:
        return df.select(
            F.col(id_name), "cell", F.posexplode(F.expr(slices)).alias("s", "vs")
        )

    dot_vs_cw = (
        "aggregate(zip_with(vs, cw, (x, y) -> x * y), 0.0D, (acc, x) -> acc + x)"
    )
    va = _cell_assignment(
        vectors.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__v")),
        "neighbor_id", n_cells, dim, 1, None,
    )
    # cell is a pure projection — fuse it into the sub-slice source instead
    # of an id-to-id self-join against the assignment relation (va itself is
    # still needed as a relation for the candidate probe join below)
    cell1 = f"element_at({_cell_ranked_sql(v, n_cells, dim, 1, None)}, 1)"
    vsub = _sub_rows(
        vectors.select(
            F.col(id_col).alias("neighbor_id"),
            F.col(vec_col),
            F.expr(cell1).alias("cell"),
        ),
        "neighbor_id",
    )
    vscored = vsub.join(F.broadcast(scw), on=["cell", "s"]).select(
        "neighbor_id",
        "cell",
        "s",
        "c",
        (F.col("cc") - F.lit(2.0) * F.expr(dot_vs_cw)).alias("score"),
    )
    # argmin with (score asc, c asc) tie-break == the oracle's row_number
    codes = (
        vscored.groupBy("neighbor_id", "cell", "s")
        .agg(F.min(F.struct("score", "c")).alias("_w"))
        .select("neighbor_id", "cell", "s", F.col("_w.c").alias("code"))
    )
    qa = _cell_assignment(
        queries.select(F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("__v")),
        "query_id", n_cells, dim, n_probe, None,
    )
    qsub = _sub_rows(
        queries.select(F.col(query_id_col).alias("query_id"), F.col(vec_col)).join(
            qa, on="query_id"
        ),
        "query_id",
    )
    qq = "aggregate(zip_with(vs, vs, (x, y) -> x * y), 0.0D, (acc, x) -> acc + x)"
    qlut = qsub.join(F.broadcast(scw), on=["cell", "s"]).select(
        "query_id",
        "cell",
        "s",
        "c",
        ((F.expr(qq) - F.lit(2.0) * F.expr(dot_vs_cw)) + F.col("cc")).alias("e"),
    )
    if cell_cap:
        from polars_order_book_spark.functions.skew import salted_probe_join

        cand = salted_probe_join(va, qa, ["cell"], "neighbor_id", cell_cap).where(
            F.col("neighbor_id") != F.col("query_id")
        )
    else:
        cand = qa.join(va, on="cell").where(F.col("neighbor_id") != F.col("query_id"))
    pairsub = (
        cand.join(codes, on=["neighbor_id", "cell"])
        .join(F.broadcast(qlut), on=["query_id", "cell", "s"])
        .where(F.col("c") == F.col("code"))
    )
    # fixed ((e0+e1)+e2)+e3 associativity via per-sub pivot
    adist_expr = None
    pivots = [
        F.max(F.when(F.col("s") == s, F.col("e"))).alias(f"_e{s}") for s in range(m)
    ]
    agg = pairsub.groupBy("query_id", "neighbor_id").agg(*pivots)
    for s in range(m):
        term = F.col(f"_e{s}")
        adist_expr = term if adist_expr is None else (adist_expr + term)
    sim = agg.select("query_id", "neighbor_id", adist_expr.alias("adist"))
    w = Window.partitionBy("query_id").orderBy(F.col("adist").asc(), F.col("neighbor_id"))
    return (
        sim.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.col("rank").cast("long").alias("rank"), "adist")
    )


def train_pq_codebooks(
    vectors: DataFrame,
    *,
    vec_col: str = "embedding",
    m: int = 4,
    ksub: int = 16,
    dim: int = 64,
    n_iter: int = 2,
) -> "list[list[list[float]]]":
    """Train per-subspace PQ codebooks with exact distributed Lloyd — the
    step that turns PQ from a demo into an index: the md5-seeded random
    codebooks quantize real data to noise (ann_recall_pq measures recall
    0.0 on the synthetic embeddings), k-means codebooks adapt to the data
    (ann_recall_pq_trained measures the difference on the same corpus).

    Per subspace: :func:`kmeans_step` chains over the dim/m-component
    sub-slices (k=ksub, seeds = the md5 codewords), with keep-previous for
    empty cells between AND after iterations — exactly kmeans_train's
    contract, re-implemented here so the FINAL codebook (not the final
    step relation) keeps previous centroids for terminally-empty cells.
    Each iteration is one map-only assignment + one model-sized groupBy;
    the driver round-trips ksub·dim/m rounded scalars per subspace per
    iteration (bounded-collect contract). The rounded-at-1e-6 emissions
    make the whole chain DuckDB-replayable, so trained-codebook ADC
    queries stay under the exact driver oracle."""
    if n_iter <= 0:
        raise ValueError(f"n_iter must be > 0, got {n_iter}")
    if m <= 0 or dim % m != 0:
        raise ValueError(f"m ({m}) must be positive and divide dim ({dim})")
    subdim = dim // m
    books = [
        [[pq_codeword_component(s, c, j) for j in range(subdim)] for c in range(ksub)]
        for s in range(m)
    ]
    # FUSED iterations: all m subspaces assign + aggregate in ONE job per
    # Lloyd iteration (m·n_iter separate kmeans_step jobs each paid SQL
    # parse + whole-stage codegen + scan — measured 5.3 s for m=4, n=2 at
    # sf0.1, vs 2.6 s fused; the arithmetic per subspace is the IDENTICAL
    # expression text, so assignments, decimal sums, and the rounded
    # emissions — and therefore the DuckDB oracle — are unchanged).
    for _ in range(n_iter):
        step_rows = _pq_fused_step(
            vectors, books, vec_col=vec_col, subdim=subdim
        ).collect()
        nxt = [[list(c) for c in book] for book in books]  # keep-previous
        for row in step_rows:
            nxt[row["s"]][row["cell"]][row["d"]] = float(row["centroid"])
        books = nxt
    return books


def _pq_fused_step(
    vectors: DataFrame,
    books: "list[list[list[float]]]",
    *,
    vec_col: str,
    subdim: int,
) -> DataFrame:
    """One Lloyd iteration over ALL PQ subspaces in a single job: explode
    each vector into its m (subspace, nearest-cell, sub-slice) structs
    map-side, then ONE groupBy(s, cell) with exact DECIMAL(30,12) per-dim
    sums. Per-subspace distance/argmin/rounding expressions are textually
    identical to :func:`kmeans_step`'s, so every emitted centroid matches
    the unfused chain bit-for-bit (pinned by test)."""
    v = _sql_as_double(vec_col)
    branches = []
    for s, cents in enumerate(books):
        sub = f"slice({v}, {s * subdim + 1}, {subdim})"
        dists = "array(" + ",".join(
            f"aggregate(zip_with({sub}, {_sql_const_array(c)}, (a, b) -> (a - b) * (a - b)),"
            " 0.0D, (acc, x) -> acc + x)"
            for c in cents
        ) + ")"
        branches.append(
            f"named_struct('s', {s},"
            f" 'cell', CAST(array_position({dists}, array_min({dists})) - 1 AS INT),"
            f" 'v', {sub})"
        )
    from polars_order_book_spark.functions.runtime import fan_out_for_compute

    # m·ksub·subdim fused ops per row over a bytes-narrow scan: provision
    # parallelism by compute (functions/runtime.py); map-only assignment +
    # order-independent decimal sums keep values identical
    ex = fan_out_for_compute(vectors).select(
        F.explode(F.expr("array(" + ",".join(branches) + ")")).alias("p")
    ).select(
        F.col("p.s").alias("s"), F.col("p.cell").alias("cell"), F.col("p.v").alias("__v")
    )
    sums = ex.groupBy("s", "cell").agg(
        F.count(F.lit(1)).alias("n_members"),
        *[
            F.expr(f"sum(CAST(__v[{d}] AS DECIMAL(30,12)))").alias(f"__s{d}")
            for d in range(subdim)
        ],
    )
    parts = F.expr("array(" + ",".join(
        f"named_struct('d', {d}, 'centroid',"
        f" round(CAST(__s{d} AS DOUBLE) / CAST(n_members AS DOUBLE), 6))"
        for d in range(subdim)
    ) + ")")
    return sums.select("s", "cell", F.explode(parts).alias("p"), "n_members").select(
        "s", "cell", F.col("p.d").alias("d"), F.col("p.centroid").alias("centroid"), "n_members"
    )


def binary_signature(
    df: DataFrame,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dim: int = 64,
    word_bits: int = 32,
) -> DataFrame:
    """Binary (sign) quantization: pack each vector's sign bits into BIGINT
    words — bit ``j`` of word ``w`` is set iff component ``w*word_bits + j``
    is >= 0. Returns ``(id, sig_0, .., sig_{ceil(dim/word_bits)-1})``.

    32-bit words keep every packed value strictly below 2**32, so the sum of
    distinct powers of two is overflow-free signed arithmetic in BOTH Spark
    and DuckDB (DuckDB range-checks ``<<`` on BIGINT at bit 63 — the reason
    the signature is 2x32 bits rather than 1x64). Distinct powers never carry,
    so ``+`` IS bitwise OR here and the packing is order-independent.

    Scale: a 64-dim float vector (256 B) compresses to 16 B of signature —
    the stage-1 scan of a two-stage retrieval touches 16x less memory and
    uses only integer xor/popcount. The signature build is map-only (one
    parsed SQL expression per word, no shuffle, no Python).
    """
    if word_bits < 1 or word_bits > 62:
        raise ValueError(f"word_bits must be in [1, 62], got {word_bits}")
    n_words = (dim + word_bits - 1) // word_bits
    v = f"`{vec_col}`"
    # Per-row contract check: a caller-declared dim beyond the true vector
    # length makes the out-of-range subscripts NULL, which the CASE below
    # would silently encode as 0-bits — consistently in both engines, so
    # recall degrades with no error the oracle gate could ever catch. One
    # cheap size() assertion per row (word 0 only) turns that into a loud
    # failure; a SHORTER declared dim (prefix-bits signature) stays legal,
    # and a NULL vector keeps its long-standing all-zero signature (the
    # assertion must not fire on NULL — assert_true raises on NULL input).
    guard = (
        f"COALESCE(CAST(ASSERT_TRUE({v} IS NULL OR size({v}) >= {dim}, "
        f"'binary_signature: dim={dim} exceeds actual vector length') "
        f"AS BIGINT), CAST(0 AS BIGINT))"
    )
    words = []
    for w in range(n_words):
        terms = [
            f"(CASE WHEN CAST({v}[{j}] AS DOUBLE) >= 0 THEN CAST({1 << (j - w * word_bits)} AS BIGINT) ELSE CAST(0 AS BIGINT) END)"
            for j in range(w * word_bits, min((w + 1) * word_bits, dim))
        ]
        expr = " + ".join(terms)
        if w == 0:
            expr = guard + " + " + expr
        words.append(F.expr(expr).alias(f"sig_{w}"))
    return df.select(F.col(id_col).alias(id_col), *words)


def cosine_topk_hamming_rerank(
    vectors: DataFrame,
    queries: DataFrame,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
    k: int = 10,
    shortlist: int = 50,
    dim: int = 64,
) -> DataFrame:
    """Two-stage retrieval: Hamming shortlist over binary signatures, exact
    cosine rerank over the shortlist only.

    Stage 1 scans packed sign signatures (:func:`binary_signature`) and keeps
    the ``shortlist`` nearest by Hamming distance (ties broken by neighbor
    id — both orders integer-exact, so the shortlist is deterministic across
    engines). Stage 2 joins the shortlist back to the full vectors and ranks
    by the SAME left-fold cosine as :func:`cosine_topk_bruteforce`, so scores
    are bit-identical to the exact path on the surviving candidates.

    Output: ``(query_id, neighbor_id, rank, cosine, hamming)``.

    Scale shape: stage 1 is the broadcast-query scan of the bruteforce path
    but over a 16x narrower relation with integer xor/bit_count per pair —
    the production binary-quantization pattern (FAISS binary indexes).
    Stage 2 touches only Q x shortlist full vectors via an equi-join on the
    neighbor id, so the expensive float work is shortlist-bounded, not
    corpus-bounded. Recall is tunable by ``shortlist`` alone; at 100 TB the
    signature relation fits hot storage where the raw vectors cannot.
    """
    word_bits = 32
    n_words = (dim + word_bits - 1) // word_bits
    sig_v = binary_signature(
        vectors, vec_col=vec_col, id_col=id_col, dim=dim, word_bits=word_bits
    ).withColumnRenamed(id_col, "neighbor_id")
    sig_q = binary_signature(
        queries, vec_col=vec_col, id_col=query_id_col, dim=dim, word_bits=word_bits
    ).select(
        F.col(query_id_col).alias("query_id"),
        *[F.col(f"sig_{w}").alias(f"qsig_{w}") for w in range(n_words)],
    )
    hamming = None
    for w in range(n_words):
        term = F.bit_count(F.col(f"sig_{w}").bitwiseXOR(F.col(f"qsig_{w}")))
        hamming = term if hamming is None else hamming + term
    w_short = Window.partitionBy("query_id").orderBy(
        F.col("hamming").asc(), F.col("neighbor_id")
    )
    short = (
        sig_v.crossJoin(F.broadcast(sig_q))
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", hamming.cast("int").alias("hamming"))
        .withColumn("__rn", F.row_number().over(w_short))
        .where(F.col("__rn") <= shortlist)
        .drop("__rn")
    )
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        _as_double(F.col(vec_col)).alias("qv"),
    ).withColumn("qn", _guarded_norm(F.col("qv"), "cosine_topk_hamming_rerank"))
    v = vectors.select(
        F.col(id_col).alias("neighbor_id"),
        _as_double(F.col(vec_col)).alias("vv"),
    ).withColumn("vn", _guarded_norm(F.col("vv"), "cosine_topk_hamming_rerank"))
    sim = (
        short.join(v, "neighbor_id")
        .join(F.broadcast(q), "query_id")
        .select(
            "query_id",
            "neighbor_id",
            "hamming",
            (_dot(F.col("qv"), F.col("vv")) / (F.col("qn") * F.col("vn"))).alias("cosine"),
        )
    )
    return _topk(sim, k, extra_cols=("hamming",))
