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

from pyspark.sql import Column, DataFrame
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
