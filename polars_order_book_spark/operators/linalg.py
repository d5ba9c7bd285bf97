"""Distributed linear algebra over embedding columns: exact covariance,
driver-side PCA fit, map-only projection.

The dimensionality-reduction half of the embedding toolkit (JL random
projection in similarity.py is the data-oblivious half; PCA is the
data-adapted one — whitening, dedup-space compaction, IVF preconditioning).

Scale shape: the covariance pass is ONE map-only product explode + ONE
groupBy on the (i, j) pair key with map-side partial combine — each task
contributes at most dim·(dim+1)/2 partial rows to the exchange regardless
of input size (100 TB streams through; the shuffle is model-sized, never
data-sized). The eigensolve
happens driver-side on the dim × dim matrix (the kmeans_train / BLAS / BPE
bounded-collect contract — model state, never data), and the projection
back out is a map-only expression against literal component vectors.

Exactness: per-pair sums follow kmeans_step's DECIMAL(30,12) discipline —
order-independent exact decimal accumulation, cast to double once, final
covariance rounded at 1e-6 — so the DuckDB oracle hashes the covariance
relation bit-for-bit. The eigendecomposition is NOT oracle-replayable
(iterative LAPACK); pca_project is pinned by numpy differentials and
invariant tests instead, and its INPUT (the covariance) is what the
driver oracle certifies.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.conversion import hash_stable_double, hash_stable_double_sql


def _v_expr(vec_col: str) -> str:
    return f"CAST({vec_col} AS ARRAY<DOUBLE>)"


def covariance_matrix(
    vectors: DataFrame,
    *,
    vec_col: str = "embedding",
    dim: int = 16,
    max_pairs: int = 65536,
) -> DataFrame:
    """Exact sample covariance of the first ``dim`` vector components, upper
    triangle in long form: (i, j, n, cov) for i ≤ j, cov rounded at 1e-6.

    cov(i,j) = (Σ x_i·x_j − Σx_i·Σx_j / n) / (n − 1) with every sum an
    exact DECIMAL(30,12) accumulation (order-independent) and ONE fused
    double expression at the end — the kmeans_step exactness discipline.
    One map explode + one model-sized groupBy; dim(dim+1)/2 output rows.
    """
    if dim <= 0:
        raise ValueError(f"dim must be > 0, got {dim}")
    n_pairs = dim * (dim + 1) // 2
    if n_pairs > max_pairs:
        raise ValueError(
            f"dim {dim} yields {n_pairs} pairs > max_pairs ({max_pairs}); "
            "the aggregate key space must stay bounded"
        )
    # Long form — explode each vector into its (i, j) products and run ONE
    # groupBy(i, j) with map-side partial combine (each task contributes
    # n_pairs partial rows regardless of input size). The wide single-row
    # alternative (n_pairs decimal agg columns) was measured 25x slower to
    # PLAN (5.2 s vs 0.2 s at dim=16, identical results) — Catalyst analysis
    # of thousands of agg expressions dominates; the parsed-SQL explode
    # keeps the expression tree linear in n_pairs inside one string.
    pairs = ",".join(
        f"struct({i} AS i, {j} AS j, __v[{i}] * __v[{j}] AS p,"
        f" __v[{i}] AS xi, __v[{j}] AS xj)"
        for i in range(dim)
        for j in range(i, dim)
    )
    # Loud contract (r8 self-review): a NULL or shorter-than-dim vector
    # explodes into rows with NULL products — count(lit(1)) would still
    # count them while sum() skips them, so n inflates and EVERY cell
    # skews by a different amount (and pca_fit eigensolves an internally
    # inconsistent matrix) with no error. Assert instead of corrupting.
    valid = F.assert_true(
        F.col("__v").isNotNull() & (F.size("__v") >= dim),
        F.lit(
            f"covariance_matrix: NULL or shorter-than-dim ({dim}) vector — "
            "n would count it while the sums skip its NULL products, "
            "silently skewing every covariance cell; filter or pad first"
        ),
    )
    e = (
        vectors.select(F.expr(_v_expr(vec_col)).alias("__v"))
        .where(valid.isNull())
        .select(F.expr(f"explode(array({pairs}))").alias("e"))
        .select("e.i", "e.j", "e.p", "e.xi", "e.xj")
    )
    a = e.groupBy("i", "j").agg(
        F.count(F.lit(1)).alias("n"),
        F.expr("sum(CAST(p AS DECIMAL(30,12)))").alias("sp"),
        F.expr("sum(CAST(xi AS DECIMAL(30,12)))").alias("si"),
        F.expr("sum(CAST(xj AS DECIMAL(30,12)))").alias("sj"),
    )
    # hash_stable_double: round at 1e-6 then sign-normalize (-0.0 → +0.0).
    # A covariance that is a tiny negative rounds to zero with its sign bit
    # set under DuckDB's round() but cleared under Spark's — values compare
    # == equal yet value-hash differently (r7 driver red on cov(5,9)).
    return a.select(
        "i",
        "j",
        "n",
        hash_stable_double(
            (
                F.col("sp").cast("double")
                - F.col("si").cast("double")
                * F.col("sj").cast("double")
                / F.col("n").cast("double")
            )
            / (F.col("n").cast("double") - F.lit(1.0)),
            6,
        ).alias("cov"),
    )


def covariance_matrix_sql(table: str = "embeddings", vec_col: str = "embedding", dim: int = 16) -> str:
    """DuckDB rendering of :func:`covariance_matrix` (same decimal sums,
    same fused double expression, same 1e-6 rounding)."""
    return f"""
WITH allv AS (SELECT CAST({vec_col} AS DOUBLE[]) AS vv FROM {table}),
e AS (
    SELECT gi.i, gj.j, vv[gi.i + 1] * vv[gj.j + 1] AS p,
           vv[gi.i + 1] AS xi, vv[gj.j + 1] AS xj
    FROM allv,
         (SELECT CAST(unnest(range(0, {dim})) AS INT) AS i) gi,
         (SELECT CAST(unnest(range(0, {dim})) AS INT) AS j) gj
    WHERE gi.i <= gj.j
),
a AS (
    SELECT i, j, count(*) AS n,
           sum(CAST(p AS DECIMAL(30,12))) AS sp,
           sum(CAST(xi AS DECIMAL(30,12))) AS si,
           sum(CAST(xj AS DECIMAL(30,12))) AS sj
    FROM e GROUP BY i, j
)
SELECT i, j, CAST(n AS BIGINT) AS n,
       {hash_stable_double_sql(
           "(CAST(sp AS DOUBLE) - CAST(si AS DOUBLE) * CAST(sj AS DOUBLE) / CAST(n AS DOUBLE))"
           " / (CAST(n AS DOUBLE) - 1.0)", 6)} AS cov
FROM a
"""


def pca_fit(
    vectors: DataFrame,
    *,
    vec_col: str = "embedding",
    dim: int = 16,
    n_components: int = 4,
) -> "tuple[list[list[float]], list[float], list[float]]":
    """Fit PCA driver-side from the DISTRIBUTED exact covariance: collect the
    dim × dim matrix (bounded model state, never data), eigensolve with
    numpy, return (components, explained_variance, means) with components
    sorted by eigenvalue descending and each component's sign fixed so its
    largest-|.|| entry is positive (eigenvector sign is arbitrary; fixing it
    makes results machine-independent)."""
    if not (0 < n_components <= dim):
        raise ValueError(f"need 0 < n_components <= dim, got {n_components}/{dim}")
    import numpy as np

    rows = covariance_matrix(vectors, vec_col=vec_col, dim=dim).collect()
    cov = np.zeros((dim, dim))
    for r in rows:
        cov[r["i"], r["j"]] = cov[r["j"], r["i"]] = r["cov"]
    # means for centering the projection: exact decimal sums / n, like cov
    v = _v_expr(vec_col)
    m = (
        vectors.select(F.expr(v).alias("__v"))
        .agg(
            F.count(F.lit(1)).alias("__n"),
            *[
                F.expr(f"sum(CAST(__v[{i}] AS DECIMAL(30,12)))").alias(f"__m{i}")
                for i in range(dim)
            ],
        )
        .collect()[0]
    )
    means = [float(m[f"__m{i}"]) / m["__n"] for i in range(dim)]
    w, vecs = np.linalg.eigh(cov)  # ascending eigenvalues
    order = np.argsort(w)[::-1][:n_components]
    comps = []
    for idx in order:
        c = vecs[:, idx]
        if c[int(np.argmax(np.abs(c)))] < 0:
            c = -c
        comps.append([float(x) for x in c])
    return comps, [float(w[i]) for i in order], means


def pca_project(
    vectors: DataFrame,
    components: "list[list[float]]",
    means: "list[float]",
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    out_col: str = "pca",
) -> DataFrame:
    """Map-only projection onto literal principal components:
    out[c] = Σ_d (x_d − mean_d)·comp_c_d. No shuffle, no Python — one fused
    SQL expression per component over the casted vector, the same
    literals-in-plan shape as kmeans assignment."""
    dim = len(means)
    if any(len(c) != dim for c in components):
        raise ValueError("components and means must share one dimensionality")
    v = _v_expr(vec_col)
    terms = []
    for c in components:
        expr = " + ".join(
            f"((__v[{d}] - {means[d]!r}D) * {c[d]!r}D)" for d in range(dim)
        )
        terms.append(f"({expr})")
    arr = "array(" + ", ".join(terms) + ")"
    return vectors.select(
        F.col(id_col), F.expr(v).alias("__v")
    ).select(F.col(id_col), F.expr(arr).alias(out_col))


def centroid_drift(
    vectors: DataFrame,
    *,
    vec_col: str = "embedding",
    by: str = "label",
    cohort_col: str = "cohort",
    base_label: str = "base",
    current_label: str = "current",
    dim: int = 64,
) -> DataFrame:
    """Embedding-space drift monitor: per segment, the cosine between the
    two cohorts' mean vectors — the cheap first alarm that an encoder,
    upstream corpus, or feature pipeline shifted between snapshots (a
    centroid that swings is drift regardless of what individual neighbors
    do; SemDeDup-style per-pair checks are 10^6× more expensive).

    Returns one row per segment present in BOTH cohorts:
    ``(by, n_base, n_current, centroid_cosine)``.

    Exactness: per-dimension sums accumulate in DECIMAL(30,12)
    (order-independent, the covariance_matrix discipline); each mean is ONE
    cast + ONE division; the centroid arrays are assembled in fixed
    dimension order (array_sort on the (d, mean) struct, not
    collect-order), and the final cosine is the same fused
    aggregate-of-products expression the ANN family hashes against DuckDB's
    list_dot_product. Scale: one explode (×dim map-side) + one
    (segment, cohort, d) groupBy with partial aggregation — the shuffle is
    model-sized (segments × cohorts × dim), never data-sized.
    """
    from polars_order_book_spark.operators.similarity import _dot  # noqa: PLC0415

    v = F.expr(_v_expr(vec_col))
    exploded = vectors.where(
        F.col(cohort_col).isin(base_label, current_label)
    ).select(
        F.col(by),
        F.col(cohort_col).alias("_c"),
        F.posexplode(F.slice(v, 1, dim)).alias("_d", "_x"),
    )
    sums = exploded.groupBy(by, "_c", "_d").agg(
        F.sum(F.col("_x").cast("decimal(30,12)")).alias("_s"),
        F.count(F.lit(1)).alias("_n"),
    )
    means = sums.select(
        by,
        "_c",
        "_d",
        (F.col("_s").cast("double") / F.col("_n").cast("double")).alias("_mean"),
        "_n",
    )
    cent = means.groupBy(by, "_c").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("_d", "_mean"))), lambda s: s["_mean"]
        ).alias("_cent"),
        F.min("_n").alias("_rows"),
    )
    a = cent.where(F.col("_c") == base_label).select(
        by, F.col("_cent").alias("_a"), F.col("_rows").alias("n_base")
    )
    b = cent.where(F.col("_c") == current_label).select(
        by, F.col("_cent").alias("_b"), F.col("_rows").alias("n_current")
    )
    return a.join(b, by).select(
        by,
        "n_base",
        "n_current",
        # covariance_matrix's rounding convention: the decimal quantization
        # of double inputs can differ by 1 ulp between engines (HALF_UP vs
        # HALF_EVEN at the 12th decimal), which surfaces as ~1e-14 in the
        # cosine — round at 1e-9, far above the noise, far below any signal
        F.round(
            _dot(F.col("_a"), F.col("_b"))
            / (
                F.sqrt(_dot(F.col("_a"), F.col("_a")))
                * F.sqrt(_dot(F.col("_b"), F.col("_b")))
            ),
            9,
        ).alias("centroid_cosine"),
    )
