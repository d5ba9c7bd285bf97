"""Table profiling — the intake step of a curation pipeline (null rates,
cardinalities, length stats) computed in ONE aggregation pass.

Everything is a built-in aggregate over one scan: no per-column jobs, no
collect loops — the profile of a 100 TB table costs exactly one map-side
partial aggregation + one 1-row reduce. Exact counts use count/sum (engine-
portable); approximate cardinalities (HLL) are offered separately because
sketches promise bounds, not bits (same tolerance-oracle policy as the
approx host queries).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def profile_table(
    df: DataFrame,
    *,
    exact_distinct: Sequence[str] = (),
    length_of: Sequence[str] = (),
) -> DataFrame:
    """One-row profile of a DataFrame in a single aggregation pass.

    Always emitted: ``n_rows`` plus, per column, ``<c>_nulls`` (exact null
    count). ``exact_distinct`` columns add ``<c>_distinct`` (exact — shuffles
    by value internally, reserve for bounded-cardinality columns like lang /
    source). ``length_of`` string columns add ``<c>_len_min/max/avg``.
    """
    aggs: list[Column] = [F.count(F.lit(1)).alias("n_rows")]
    for c in df.columns:
        aggs.append(
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"{c}_nulls")
        )
    for c in exact_distinct:
        aggs.append(F.countDistinct(F.col(c)).alias(f"{c}_distinct"))
    for c in length_of:
        lc = F.length(F.col(c))
        aggs.append(F.min(lc).alias(f"{c}_len_min"))
        aggs.append(F.max(lc).alias(f"{c}_len_max"))
        aggs.append(F.avg(lc).alias(f"{c}_len_avg"))
    return df.agg(*aggs)


def profile_approx_distinct(
    df: DataFrame, cols: Sequence[str], rsd: float = 0.05
) -> DataFrame:
    """HLL cardinalities for high-cardinality columns — one pass, mergeable
    sketch state, no value shuffle; accuracy ±rsd (check in tolerance mode)."""
    return df.agg(
        *[
            F.approx_count_distinct(F.col(c), rsd).alias(f"{c}_approx_distinct")
            for c in cols
        ]
    )


def distribution_drift(
    df: DataFrame,
    *,
    by: "Sequence[str]",
    cohort_col: str,
    bucket_col: str,
    base_label: str = "base",
    current_label: str = "current",
) -> DataFrame:
    """Per-segment distribution drift between two cohorts — the monitor a
    pipeline runs between ingestion snapshots (did this feed's value
    distribution move?) and between training mixes. Emits, per ``by``
    segment, total-variation distance and the Kolmogorov-Smirnov statistic
    over the bucketed distributions:

    * ``tv`` = ½ Σ_b |p_b − q_b|  (total variation; ½ L1)
    * ``ks`` = max_b |P_b − Q_b|  (max CDF gap over bucket order)

    Exactness discipline: with N base rows and M current rows, both reduce
    to EXACT integer forms — tv = Σ|n_b·M − m_b·N| / (2NM) and
    ks = max|cumn_b·M − cumm_b·N| / (NM) — accumulated in DECIMAL(38,0)
    (order-independent) with ONE final IEEE division each. No floats before
    the last step, no libm (this is why TV/KS rather than the
    log-ratio-based PSI/KL, which would drag in transcendental rounding).

    Segments where either cohort is EMPTY are dropped (drift against
    nothing is undefined) — count segments upstream if absence itself is
    the signal.

    Scale: one groupBy on (segment, bucket) with map-side partials
    (bucket-domain-sized output), one segment-sized totals join, one
    window over the bounded bucket order, one final segment groupBy —
    nothing data-sized past the first aggregation.
    """
    keys = list(by)
    c = F.col(cohort_col)
    counts = (
        df.where(c.isin(base_label, current_label))
        .groupBy(*keys, bucket_col)
        .agg(
            F.sum(F.when(c == base_label, 1).otherwise(0)).alias("_n"),
            F.sum(F.when(c == current_label, 1).otherwise(0)).alias("_m"),
        )
    )
    return _drift_chain(counts, keys, bucket_col)


def drift_from_counts(
    base_counts: DataFrame,
    current_counts: DataFrame,
    *,
    by: "Sequence[str]",
    bucket_col: str,
    count_col: str = "n_rows",
) -> DataFrame:
    """:func:`distribution_drift` evaluated from two PRE-AGGREGATED
    histograms — (by, bucket, count) relations — instead of raw rows. This
    is the serving shape: a frozen baseline histogram persisted offline and
    a maintained current histogram (e.g. streaming/agg_stream.py's rollup)
    compared WITHOUT rescanning either cohort's facts. Exact chain and
    output schema are shared with distribution_drift (same code), so a
    stream that accumulated counts batch-by-batch drifts to bit-identical
    TV/KS as the batch recompute — which is the driver-oracle contract.
    Buckets absent from one histogram count as zero (full-outer join)."""
    keys = list(by)
    b = base_counts.select(
        *keys, bucket_col, F.col(count_col).cast("long").alias("_n")
    )
    cur = current_counts.select(
        *keys, bucket_col, F.col(count_col).cast("long").alias("_m")
    )
    counts = (
        b.join(cur, [*keys, bucket_col], "full_outer")
        .select(
            *keys,
            bucket_col,
            F.coalesce(F.col("_n"), F.lit(0)).alias("_n"),
            F.coalesce(F.col("_m"), F.lit(0)).alias("_m"),
        )
    )
    return _drift_chain(counts, keys, bucket_col)


def _drift_chain(counts: DataFrame, keys: "list[str]", bucket_col: str) -> DataFrame:
    """Shared exact TV/KS chain over a (keys, bucket, _n, _m) count relation
    — see :func:`distribution_drift` for the arithmetic contract."""
    totals = counts.groupBy(*keys).agg(
        F.sum("_n").alias("_tn"), F.sum("_m").alias("_tm")
    )
    joined = counts.join(totals, keys).where((F.col("_tn") > 0) & (F.col("_tm") > 0))
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col(bucket_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    dec = "decimal(38,0)"
    diff = (
        F.col("_n").cast(dec) * F.col("_tm").cast(dec)
        - F.col("_m").cast(dec) * F.col("_tn").cast(dec)
    )
    cum_diff = (
        F.sum("_n").over(w).cast(dec) * F.col("_tm").cast(dec)
        - F.sum("_m").over(w).cast(dec) * F.col("_tn").cast(dec)
    )
    terms = joined.select(
        *keys,
        F.col("_tn"),
        F.col("_tm"),
        F.abs(diff).alias("_ad"),
        F.abs(cum_diff).alias("_acd"),
    )
    return (
        terms.groupBy(*keys)
        .agg(
            F.min("_tn").alias("n_base"),
            F.min("_tm").alias("n_current"),
            F.sum("_ad").alias("_tvnum"),
            F.max("_acd").alias("_ksnum"),
        )
        .select(
            *keys,
            "n_base",
            "n_current",
            (
                F.col("_tvnum").cast("double")
                / (
                    F.lit(2.0)
                    * F.col("n_base").cast("double")
                    * F.col("n_current").cast("double")
                )
            ).alias("tv"),
            (
                F.col("_ksnum").cast("double")
                / (F.col("n_base").cast("double") * F.col("n_current").cast("double"))
            ).alias("ks"),
        )
    )


def pareto_frontier(
    df: DataFrame,
    keys: "list[str]",
    x_col: str,
    y_col: str,
    *,
    id_col: str,
    salt_parts: int = 32,
) -> DataFrame:
    """Per-key 2-D Pareto frontier (skyline, maxima in both dimensions): keep
    each row not dominated by another row of the same key — dominated means
    the other row is >= in BOTH measures and strictly greater in at least
    one. Mutually-equal points are all kept (neither dominates). The
    multi-objective selection step of a curation pipeline ("longest AND
    richest documents", "cheapest AND freshest snapshot") that a top-k on
    any single score gets wrong.

    One skyline pass is two window functions over (key [, x]): the max y
    among STRICTLY greater x (a value-range frame — exact for integer x)
    and the max y within the same x; a row survives iff neither beats it.

    Scale shape — the classic two-phase distributed skyline: a per-key
    window puts the whole key on one task, so phase 1 computes LOCAL
    skylines per (key, salt(id) mod salt_parts) partition and phase 2
    re-runs the same pass per key over the survivors only. Correct because
    skyline is composable: a globally non-dominated row has no dominator in
    ANY subset, so it survives every local pass; phase 2 removes the
    locally-undominated impostors. Survivor sets are frontier-sized
    (~O(log n) per salt for non-degenerate data), so the phase-2 window is
    tiny no matter how large the key group. Both measures must be integer
    (exact value-range frames both engines agree on); NULL keys/measures
    are excluded up front (ordered-family convention).
    """
    if salt_parts < 1:
        raise ValueError(f"salt_parts must be >= 1, got {salt_parts}")
    # The strictly-greater-x dominance frame is a value-range frame ending 1
    # BEFORE the current value — exact only for integer x. A fractional x
    # would silently hide dominators within (x, x+1) and emit dominated rows
    # as frontier; refuse rather than be quietly wrong. y shares the
    # integer-exactness contract (range [0,0] groups equal values).
    dtypes = dict((f.name, f.dataType.simpleString()) for f in df.schema.fields)
    for c in (x_col, y_col):
        if dtypes.get(c) not in ("tinyint", "smallint", "int", "bigint"):
            raise ValueError(
                f"pareto_frontier requires INTEGER measures; {c} is "
                f"{dtypes.get(c)} — quantize first (floor to units)"
            )
    x, y = F.col(x_col), F.col(y_col)
    # Build the null-key filter as a Column conjunction: ' AND '.join over
    # keys=[] would be F.expr("") — a plan-time ParseException — while the
    # global (un-keyed) skyline is perfectly well-defined and the window
    # passes below handle partitionBy() fine.
    not_null = x.isNotNull() & y.isNotNull()
    for k in keys:
        not_null = not_null & F.col(k).isNotNull()
    base = df.where(not_null)

    def skyline(rel: DataFrame, part: "list[str]") -> DataFrame:
        # Both window frames share ONE partitioning and ordering (x desc),
        # so Spark computes them in a single exchange + sort: the strict-x
        # max via the value-range frame ending 1 before the current value,
        # the equal-x group max via the [0, 0] value-range frame. A
        # partitionBy(part, x) spec for the equal-x max would force a
        # second exchange per pass (measured in PLANS.md).
        w_gt = (
            Window.partitionBy(*part)
            .orderBy(F.col(x_col).desc())
            .rangeBetween(Window.unboundedPreceding, -1)
        )
        w_eq = (
            Window.partitionBy(*part)
            .orderBy(F.col(x_col).desc())
            .rangeBetween(0, 0)
        )
        max_gt = F.max(y).over(w_gt)
        max_eq = F.max(y).over(w_eq)
        return (
            rel.withColumn("__mg", max_gt)
            .withColumn("__me", max_eq)
            .where((F.col("__mg").isNull() | (F.col("__mg") < y)) & (F.col("__me") == y))
            .drop("__mg", "__me")
        )

    local = skyline(
        base.withColumn(
            "__salt", F.pmod(F.xxhash64(F.col(id_col)), F.lit(salt_parts)).cast("int")
        ),
        [*keys, "__salt"],
    ).drop("__salt")
    return skyline(local, list(keys))
