"""Skew hardening for bucketed joins: dynamic salt-splitting of hot groups.

Bucketed designs (LSH bands, IVF cells) die on the one hot bucket: a group
with m rows makes the self-join task do m² work, and AQE's skew splitting
cannot subdivide a single join KEY — only oversized partitions. These helpers
re-key oversized groups by a deterministic salt so per-task work is bounded by
~cap², no matter how degenerate the data (e.g. every document identical ⇒ one
band bucket holding the whole corpus).

Both helpers are pure DataFrame transforms: one extra group-size aggregation
plus a broadcast-friendly join against it; no driver collect, no RDDs. Salting
never changes results — each pair still meets exactly once (proof in the
docstrings) — so callers keep their oracle equivalence.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SA, _SB, _N = "__salt_a__", "__salt_b__", "__grp_n__"


def _salt_count(cap: int):
    """Number of salt cells per group: ceil(n/cap), 1 for small groups."""
    return F.greatest(F.lit(1), F.ceil(F.col(_N) / F.lit(cap))).cast("int")


def salted_pair_join(
    rows: DataFrame,
    keys: Sequence[str],
    id_col: str,
    out_a: str,
    out_b: str,
    cap: int,
    *,
    payload: "Sequence[tuple[str, str, str]] | None" = None,
    pair_budget: int | None = None,
    budget_msg: str | None = None,
) -> DataFrame:
    """Self-equi-join of ``rows`` on ``keys`` → ordered id pairs
    (``out_a`` < ``out_b``), with per-task pair counts bounded by ~cap².

    Triangle decomposition: each group of size n splits into S = ceil(n/cap)
    salt cells by hash(id) mod S; a pair (x, y) meets exactly once — row x
    enters the left side at (salt(x), j) for every j and row y enters the
    right side at (i, salt(y)) for every i, so they join only in cell
    (salt(x), salt(y)); the mirrored meeting in (salt(y), salt(x)) carries
    (y, x) and is removed by the ``<`` filter. Replication cost is S× per row
    — paid only inside oversized groups. Output may contain duplicates across
    different key values (same as the unsalted join); callers dedup as before.

    ``payload``: optional (col, out_left, out_right) triples — each named
    input column rides through the join and lands twice in the output, once
    from each pair member (e.g. ``("n_sh", "na", "nb")`` for a length
    filter applied downstream).

    ``pair_budget``: optional fail-fast on the join's EXACT output
    cardinality Σ n_k² (the second frequency moment — see
    :func:`join_size_estimate`). The bound is computed from the same
    group-size aggregate salting already needs, broadcast as one row, and
    enforced with ``assert_true`` on the rows FEEDING the join — tasks die
    on their first row instead of OOMing mid-quadratic-stage, inside the
    one lazy plan (no eager driver action, caller keeps a plain DataFrame).
    ``budget_msg`` names the caller (and its recommended unbounded-scale
    alternative) in the error.
    """
    keys = list(keys)
    # Only OVER-CAP groups need salting, and there are few of them by
    # construction (each holds > cap rows) — broadcast that tiny relation
    # instead of equi-joining the full group-size table; rows without a match
    # keep S = 1 and the salted join degenerates to the plain one for them.
    grp = rows.groupBy(*keys).agg(F.count(F.lit(1)).alias(_N))
    hot = grp.where(F.col(_N) > cap)
    r = rows.join(F.broadcast(hot), on=keys, how="left")
    if pair_budget is not None:
        # Σ n² in double: an estimate-grade bound (exact until ~2^53 pairs,
        # far past any budget a caller would set). NULL-key groups never
        # match in the equi-join (SQL semantics; same exclusion as
        # join_size_estimate below), so they must not count toward the
        # budget — a corpus with many NULL-block rows would otherwise trip
        # the fail-fast on a join whose real output is tiny (review
        # finding).
        est = grp.where(
            F.expr(" AND ".join(f"`{k}` IS NOT NULL" for k in keys))
        ).agg(
            F.sum(F.col(_N).cast("double") * F.col(_N).cast("double")).alias(
                "__pair_est__"
            )
        )
        msg = F.concat(
            F.lit(f"{budget_msg or 'salted_pair_join'}: estimated candidate "
                  f"pairs "),
            F.col("__pair_est__").cast("bigint").cast("string"),
            F.lit(f" exceed pair_budget={pair_budget}"),
        )
        r = (
            r.crossJoin(F.broadcast(est))
            .where(
                F.assert_true(
                    F.coalesce(F.col("__pair_est__"), F.lit(0.0))
                    <= F.lit(float(pair_budget)),
                    msg,
                ).isNull()
            )
            .drop("__pair_est__")
        )
    payload = list(payload or [])
    s = F.coalesce(_salt_count(cap), F.lit(1))
    salt = F.pmod(F.xxhash64(F.col(id_col)), s).cast("int")
    left = r.select(
        *keys,
        salt.alias(_SA),
        F.explode(F.sequence(F.lit(0), s - 1)).alias(_SB),
        F.col(id_col).alias(out_a),
        *[F.col(c).alias(la) for c, la, _ in payload],
    )
    right = r.select(
        *keys,
        F.explode(F.sequence(F.lit(0), s - 1)).alias(_SA),
        salt.alias(_SB),
        F.col(id_col).alias(out_b),
        *[F.col(c).alias(rb) for c, _, rb in payload],
    )
    return (
        left.join(right, on=[*keys, _SA, _SB])
        .where(F.col(out_a) < F.col(out_b))
        .select(out_a, out_b, *[la for _, la, _ in payload],
                *[rb for _, _, rb in payload])
    )


def salted_probe_join(
    build: DataFrame,
    probe: DataFrame,
    keys: Sequence[str],
    build_id_col: str,
    cap: int,
) -> DataFrame:
    """Equi-join ``build`` ⋈ ``probe`` on ``keys`` with hot build groups
    salt-split: build rows take salt = hash(id) mod S, probe rows replicate
    across all S salts of their group, so each (probe, build) pair meets
    exactly once and per-task build rows are bounded by ~cap. Returns the
    joined frame with all columns from both sides (salt columns dropped).

    The replication multiplier applies to the PROBE side (queries), which in
    ANN workloads is orders of magnitude smaller than the vector side — the
    standard asymmetry this helper assumes.
    """
    keys = list(keys)
    # Same hot-groups-only broadcast as salted_pair_join: un-hot groups keep
    # S = 1 (salt 0 on both sides), so they pay nothing beyond the broadcast
    # lookup.
    hot = build.groupBy(*keys).agg(F.count(F.lit(1)).alias(_N)).where(F.col(_N) > cap)
    s = F.coalesce(_salt_count(cap), F.lit(1))
    b = build.join(F.broadcast(hot), on=keys, how="left").withColumn(
        "__salt__", F.pmod(F.xxhash64(F.col(build_id_col)), s).cast("int")
    ).drop(_N)
    p = (
        probe.join(F.broadcast(hot), on=keys, how="left")
        .withColumn("__salt__", F.explode(F.sequence(F.lit(0), s - 1)))
        .drop(_N)
    )
    return b.join(p, on=[*keys, "__salt__"]).drop("__salt__")


def salted_bipartite_join(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    left_id_col: str,
    right_id_col: str,
    cap: int,
    *,
    pair_budget: int | None = None,
    budget_msg: str | None = None,
) -> DataFrame:
    """Equi-join ``left`` ⋈ ``right`` on ``keys`` with BOTH sides salt-split:
    per join group, left rows hash into S_L = ceil(n_L/cap) cells and right
    rows into S_R = ceil(n_R/cap); each left row replicates across the
    right side's cells and vice versa, so a pair meets exactly once in cell
    (salt_L, salt_R) and per-task pair work is bounded by ~cap² no matter
    WHICH side the hot group is on (``salted_probe_join`` bounds only the
    build side — use it when the probe side is known small, this when
    neither side is). Replication cost: each row duplicates by the OTHER
    side's salt count — paid only inside groups that are actually hot.
    Returns the joined frame minus the salt plumbing.

    ``pair_budget``/``budget_msg``: same contract as
    :func:`salted_pair_join` — fail fast when the join's EXACT output
    cardinality Σ n_L(k)·n_R(k) (computed from the two group-size
    aggregates, NULL-key groups excluded because the equi-join excludes
    them) exceeds the budget, with ``assert_true`` on the rows FEEDING the
    join so tasks die before the quadratic stage, inside the lazy plan.
    """
    keys = list(keys)
    grp_l = left.groupBy(*keys).agg(F.count(F.lit(1)).alias(_N))
    grp_r = right.groupBy(*keys).agg(F.count(F.lit(1)).alias(_N))
    hot_l = grp_l.where(F.col(_N) > cap)
    hot_r = grp_r.where(F.col(_N) > cap)
    sl_of = F.coalesce(_salt_count(cap), F.lit(1))
    if pair_budget is not None:
        nn = " AND ".join(f"`{k}` IS NOT NULL" for k in keys)
        est = (
            grp_l.where(F.expr(nn))
            .withColumnRenamed(_N, "__nl")
            .join(grp_r.where(F.expr(nn)).withColumnRenamed(_N, "__nr"), on=keys)
            .agg(
                F.sum(
                    F.col("__nl").cast("double") * F.col("__nr").cast("double")
                ).alias("__pair_est__")
            )
        )
        msg = F.concat(
            F.lit(f"{budget_msg or 'salted_bipartite_join'}: estimated "
                  f"candidate pairs "),
            F.col("__pair_est__").cast("bigint").cast("string"),
            F.lit(f" exceed pair_budget={pair_budget}"),
        )
        ok = F.assert_true(
            F.coalesce(F.col("__pair_est__"), F.lit(0.0))
            <= F.lit(float(pair_budget)),
            msg,
        )
        left = left.crossJoin(F.broadcast(est)).where(ok.isNull()).drop("__pair_est__")

    l = (
        left.join(F.broadcast(hot_l), on=keys, how="left")
        .withColumn("__sl", F.pmod(F.xxhash64(F.col(left_id_col)), sl_of).cast("int"))
        .drop(_N)
        .join(F.broadcast(hot_r.withColumnRenamed(_N, "__nr")), on=keys, how="left")
        .withColumn(
            "__sr",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.coalesce(
                        F.greatest(F.lit(1), F.ceil(F.col("__nr") / F.lit(cap))).cast("int"),
                        F.lit(1),
                    )
                    - 1,
                )
            ),
        )
        .drop("__nr")
    )
    r = (
        right.join(F.broadcast(hot_r), on=keys, how="left")
        .withColumn("__sr", F.pmod(F.xxhash64(F.col(right_id_col)), sl_of).cast("int"))
        .drop(_N)
        .join(F.broadcast(hot_l.withColumnRenamed(_N, "__nl")), on=keys, how="left")
        .withColumn(
            "__sl",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.coalesce(
                        F.greatest(F.lit(1), F.ceil(F.col("__nl") / F.lit(cap))).cast("int"),
                        F.lit(1),
                    )
                    - 1,
                )
            ),
        )
        .drop("__nl")
    )
    return l.join(r, on=[*keys, "__sl", "__sr"]).drop("__sl", "__sr")


def join_size_estimate(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    *,
    top_k: int = 10,
    total_label: str = "__total__",
) -> DataFrame:
    """EXACT inner-join cardinality accounting WITHOUT running the join —
    the audit that decides whether a join needs ``salted_*`` treatment (or a
    different key) before paying for it.

    Per-key counts on each side are rollup-sized aggregations (map-side
    partial), their equi-join is counts x counts (distinct-key-sized, never
    row-sized), and ``n_left * n_right`` summed over keys IS the inner-join
    cardinality — for a self-join this is the second frequency moment
    Σ n_k², the classic skew statistic. Returns the ``top_k`` heaviest keys
    (ordered by contribution desc, key asc — deterministic under ties) plus
    one ``total_label`` row whose columns are the sums over ALL matched
    keys. ``join_rows`` is DECIMAL(38,0): 100 TB-scale products overflow
    BIGINT long before they overflow the accounting.

    Null join keys never match in an equi-join, so they are excluded here
    too (same SQL semantics both engines).

    Label caveat: multi-key labels concatenate with ``'|'`` and the total
    row reuses ``total_label`` verbatim, so a key VALUE containing the
    separator (or equal to the label) is ambiguous in the report — this is
    a human-facing audit summary, not a machine join target; consumers that
    need exact keys should call the per-key ``cells`` computation directly
    (two groupBys + the counts join) rather than parse labels back.
    """
    keys = list(keys)
    lc = left.groupBy(*keys).agg(F.count(F.lit(1)).alias("n_left"))
    rc = right.groupBy(*keys).agg(F.count(F.lit(1)).alias("n_right"))
    cells = lc.join(rc, on=keys, how="inner").withColumn(
        "join_rows",
        (
            F.col("n_left").cast("decimal(19,0)")
            * F.col("n_right").cast("decimal(19,0)")
        ).cast("decimal(38,0)"),
    )
    key_str = F.concat_ws("|", *[F.col(k).cast("string") for k in keys])
    # n_left/n_right are decimal(38,0) like join_rows: the total row sums
    # them over ALL matched keys, and at the 100 TB scales this audits a
    # plain BIGINT sum can silently wrap (non-ANSI Spark) — keep the whole
    # accounting overflow-proof, not just the products.
    labeled = cells.select(
        key_str.alias("key"),
        F.col("n_left").cast("decimal(38,0)").alias("n_left"),
        F.col("n_right").cast("decimal(38,0)").alias("n_right"),
        "join_rows",
    )
    top = labeled.orderBy(F.col("join_rows").desc(), F.col("key")).limit(top_k)
    total = labeled.agg(
        F.sum("n_left").cast("decimal(38,0)").alias("n_left"),
        F.sum("n_right").cast("decimal(38,0)").alias("n_right"),
        F.sum("join_rows").cast("decimal(38,0)").alias("join_rows"),
    ).select(F.lit(total_label).alias("key"), "n_left", "n_right", "join_rows")
    return top.unionByName(total)
