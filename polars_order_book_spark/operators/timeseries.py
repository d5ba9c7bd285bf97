"""Time-series regularization: gap-fill a per-key integer grid and linearly
interpolate missing values.

The reference's world is event streams sorted by timestamp (reference
``README.md:182``); the downstream consumer of any such stream eventually
needs it on a REGULAR grid (bars, daily features, model inputs). This
operator densifies a sparse (key, grid_index) relation to every index in
each key's observed [min, max] range and fills holes by linear
interpolation between the nearest observed neighbors.

Exactness discipline: callers pass values that are exact (integers or
decimal-cast); the interpolation weight ``(i - prev_i) / (next_i - prev_i)``
is a ratio of BIGINTs and the fill is one fused double expression — the
same expression text on any engine yields bit-identical IEEE results, so
the operator is oracle-hashable (no libm calls anywhere).

Scale shape (three shuffles, all on the key):
1. per-key min/max agg (output = keys-sized);
2. ``sequence() + explode`` grid generation — map-side, grid-sized output,
   then a left join observed-onto-grid co-partitioned on (key, idx);
3. ONE window pass per direction (prev via unbounded-preceding, next via
   unbounded-following) — Spark evaluates both frames in a single sort per
   key, no per-gap iteration, no driver loop. Dense keys with huge ranges
   are the caller's contract: the grid is |range| rows per key, same as any
   resample.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def gap_fill_linear(
    observed: DataFrame,
    *,
    by: "list[str]",
    idx_col: str = "idx",
    value_col: str = "value",
) -> DataFrame:
    """Densify ``observed`` (one row per (by, idx), idx integer) to every
    idx in each key's [min(idx), max(idx)] and linearly interpolate nulls.

    Returns ``by + [idx_col, value_col, "is_observed"]``. The grid spans
    each key's [min, max] index OVER NON-NULL OBSERVATIONS — null-valued
    input rows count as holes (interpolated if interior) and never extend
    the range, so leading/trailing extrapolation points cannot occur and
    every emitted hole really is bracketed by observations. A key with no
    non-null value at all yields no rows.
    """
    keys = list(by)
    if not keys:
        raise ValueError("gap_fill_linear requires at least one key column")

    bounds = (
        observed.where(F.col(value_col).isNotNull())
        .groupBy(*keys)
        .agg(F.min(idx_col).alias("_lo"), F.max(idx_col).alias("_hi"))
    )
    grid = bounds.select(
        *keys, F.explode(F.sequence("_lo", "_hi")).alias(idx_col)
    )
    dense = grid.join(
        observed.select(*keys, idx_col, F.col(value_col).alias("_v")),
        [*keys, idx_col],
        "left",
    )

    w_prev = (
        Window.partitionBy(*keys)
        .orderBy(idx_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_next = (
        Window.partitionBy(*keys)
        .orderBy(idx_col)
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    obs_idx = F.when(F.col("_v").isNotNull(), F.col(idx_col))
    pv = F.last("_v", ignorenulls=True).over(w_prev)
    pi = F.last(obs_idx, ignorenulls=True).over(w_prev)
    nv = F.first("_v", ignorenulls=True).over(w_next)
    ni = F.first(obs_idx, ignorenulls=True).over(w_next)

    frac = (F.col(idx_col) - pi).cast("double") / (ni - pi).cast("double")
    interp = pv.cast("double") + (nv.cast("double") - pv.cast("double")) * frac
    filled = (
        F.when(F.col("_v").isNotNull(), F.col("_v").cast("double"))
        .when(pv.isNotNull() & nv.isNotNull(), interp)
        .when(pv.isNotNull(), pv.cast("double"))
        .otherwise(nv.cast("double"))
    )
    return dense.select(
        *keys,
        idx_col,
        filled.alias(value_col),
        F.col("_v").isNotNull().alias("is_observed"),
    )
