"""Incremental aggregate maintenance — fold a delta batch into a persisted
aggregate table without rescanning the base data.

The warehouse pattern: a 100 TB fact table has a per-key aggregate rollup
(per-customer totals, per-domain document stats). A daily delta arrives;
recomputing the rollup from scratch rescans the full history for keys that
did not change. Incremental view maintenance (Blakeley et al., SIGMOD 1986 —
"self-maintainable" aggregates) folds the delta's partial aggregates into
the existing rollup instead: O(|delta| + |touched keys|) work.

Self-maintainability contract (insert-only deltas): ``count`` and ``sum``
combine by addition, ``min``/``max`` by least/greatest. Under DELETES,
min/max are NOT self-maintainable (removing the current min requires
rescanning that key) — callers with retractions must re-aggregate the
affected keys from base data; this module deliberately supports the
insert-only fast path and raises nothing silently (it never sees deletes —
the input is a relation of new rows).

Scale shape: the delta is aggregated first (one shuffle over delta-sized
data, map-side partial), then combined with the base rollup via a full-outer
join on the key. The base side of that join is ROLLUP-sized, not
fact-table-sized — the whole point. When the delta's key set is small (the
common daily case), Spark/AQE broadcasts the delta side, so the base rollup
streams through map-side untouched. With the rollup stored bucketed on the
key, even the base-side exchange disappears. Exact decimal sums keep the
fold associative and order-independent — the incremental result is
bit-identical to a full recompute, which is exactly the oracle this module
is verified against.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def combine_aggregates(
    base: DataFrame,
    delta: DataFrame,
    keys: Sequence[str],
    *,
    counts: Sequence[str] = (),
    sums: Sequence[str] = (),
    mins: Sequence[str] = (),
    maxs: Sequence[str] = (),
) -> DataFrame:
    """Merge two aggregate tables with identical schemas into one.

    Both inputs carry ``keys`` plus the named measure columns; the result
    has the same schema with measures combined per self-maintainability
    rules: counts/sums add, mins take the minimum, maxs the maximum. Keys
    present in only one side pass through unchanged.

    Implemented as union + re-aggregate rather than a full-outer equi-join:
    groupBy groups NULL keys together exactly like the full recompute the
    result must equal, where a join's ``NULL != NULL`` would silently split
    a NULL-keyed rollup row into two partial rows (e.g. a dimension
    attribute that is NULL for some facts). Same cost — one rollup-sized
    exchange either way.
    """
    keys = list(keys)
    measures = [*counts, *sums, *mins, *maxs]
    if not keys or not measures:
        raise ValueError("need at least one key and one measure column")
    for side_name, side in (("base", base), ("delta", delta)):
        missing = [c for c in [*keys, *measures] if c not in side.columns]
        if missing:
            raise ValueError(f"{side_name} is missing columns {missing}")
    unioned = base.select(*keys, *measures).unionByName(
        delta.select(*keys, *measures)
    )

    def _agg(m: str) -> F.Column:
        if m in mins:
            return F.min(m)
        if m in maxs:
            return F.max(m)
        # counts and sums: additive; a side absent for a key contributes
        # no row, which sums the same as the old coalesce-to-zero
        return F.sum(m)

    return unioned.groupBy(*keys).agg(*[_agg(m).alias(m) for m in measures])


def incremental_agg(
    base_agg: DataFrame,
    delta_rows: DataFrame,
    keys: Sequence[str],
    *,
    count_col: str = "n_rows",
    sum_exprs: "dict[str, F.Column] | None" = None,
    min_exprs: "dict[str, F.Column] | None" = None,
    max_exprs: "dict[str, F.Column] | None" = None,
) -> DataFrame:
    """Fold raw ``delta_rows`` into the persisted ``base_agg`` rollup.

    ``base_agg`` has columns ``keys + [count_col] + sum/min/max names``;
    ``delta_rows`` is the raw new-fact relation. The delta is aggregated
    with the given expressions (one delta-sized shuffle, map-side partial),
    then combined with :func:`combine_aggregates`. The result equals a full
    recompute over ``union(base_facts, delta_rows)`` exactly — use decimal
    sum expressions so addition is order-independent.
    """
    sum_exprs = dict(sum_exprs or {})
    min_exprs = dict(min_exprs or {})
    max_exprs = dict(max_exprs or {})
    aggs = [F.count(F.lit(1)).alias(count_col)]
    aggs += [e.alias(name) for name, e in sum_exprs.items()]
    aggs += [e.alias(name) for name, e in min_exprs.items()]
    aggs += [e.alias(name) for name, e in max_exprs.items()]
    delta_agg = delta_rows.groupBy(*[F.col(k) for k in keys]).agg(*aggs)
    return combine_aggregates(
        base_agg,
        delta_agg,
        keys,
        counts=[count_col],
        sums=list(sum_exprs),
        mins=list(min_exprs),
        maxs=list(max_exprs),
    )


def join_delta(
    base_r: DataFrame,
    delta_r: DataFrame,
    base_s: DataFrame,
    delta_s: DataFrame,
    on,
) -> DataFrame:
    """Insert-only delta of the inner join R ⨝ S.

    With inserts ΔR and ΔS, the new join state is
    ``(R ∪ ΔR) ⨝ (S ∪ ΔS) = R⨝S ∪ ΔR⨝S ∪ R⨝ΔS ∪ ΔR⨝ΔS`` (bag semantics —
    distributivity of ⨝ over ∪). This returns the last three terms: the rows
    the stored view gains, WITHOUT recomputing R⨝S. Inner join only: outer
    joins are not insert-only self-maintainable (a ΔS match retracts an
    R-side null-padded row), so callers with outer views must re-derive the
    affected keys.

    Scale shape: every term has a delta on at least one side, so the work is
    O(|Δ| x join selectivity) — the 100 TB base-x-base recompute never runs.
    A day-sized delta broadcasts; with the base bucketed on the join key the
    base side's exchange disappears entirely.
    """
    return (
        delta_r.join(base_s, on, "inner")
        .unionByName(base_r.join(delta_s, on, "inner"))
        .unionByName(delta_r.join(delta_s, on, "inner"))
    )


def incremental_join_agg(
    base_view: DataFrame,
    base_r: DataFrame,
    delta_r: DataFrame,
    base_s: DataFrame,
    delta_s: DataFrame,
    on,
    keys: Sequence[str],
    *,
    count_col: str = "n_rows",
    sum_exprs: "dict[str, F.Column] | None" = None,
    min_exprs: "dict[str, F.Column] | None" = None,
    max_exprs: "dict[str, F.Column] | None" = None,
) -> DataFrame:
    """Maintain an aggregate VIEW over a join under insert-only deltas.

    ``base_view`` is the stored rollup of ``base_r ⨝ base_s`` grouped by
    ``keys``. The join's insert delta (:func:`join_delta`) is aggregated with
    the given expressions (one delta-sized shuffle) and folded into the view
    with :func:`combine_aggregates` — rollup-sized combine, never a base
    rescan. Result equals a full recompute over
    ``(base_r ∪ delta_r) ⨝ (base_s ∪ delta_s)`` exactly (the oracle this is
    verified against); exact decimal sums keep the fold order-independent.
    """
    sum_exprs = dict(sum_exprs or {})
    min_exprs = dict(min_exprs or {})
    max_exprs = dict(max_exprs or {})
    delta = join_delta(base_r, delta_r, base_s, delta_s, on)
    aggs = [F.count(F.lit(1)).alias(count_col)]
    aggs += [e.alias(name) for name, e in sum_exprs.items()]
    aggs += [e.alias(name) for name, e in min_exprs.items()]
    aggs += [e.alias(name) for name, e in max_exprs.items()]
    delta_agg = delta.groupBy(*[F.col(k) for k in keys]).agg(*aggs)
    return combine_aggregates(
        base_view,
        delta_agg,
        keys,
        counts=[count_col],
        sums=list(sum_exprs),
        mins=list(min_exprs),
        maxs=list(max_exprs),
    )


def retract_agg(
    base_agg: DataFrame,
    deleted_rows: DataFrame,
    keys: Sequence[str],
    *,
    count_col: str = "n_rows",
    sum_exprs: "dict[str, F.Column] | None" = None,
) -> DataFrame:
    """Remove deleted facts from an additive rollup WITHOUT rescanning base
    facts — the deletion dual of :func:`incremental_agg` and the shape of a
    GDPR/right-to-be-forgotten propagation into derived tables.

    count/sum ARE self-maintainable under deletion (subtract the delta
    aggregate); min/max are NOT (removing the current extremum requires
    rescanning that key), so this operator deliberately accepts only
    counts/sums — callers with min/max re-aggregate the affected keys from
    base facts. Keys where EVERY measure cancels to zero DROP from the
    rollup (the forgotten user disappears, not a zero-row tombstone); a key
    whose count cancels but whose sums do not is KEPT — that state is only
    reachable by deleting rows that were never aggregated, and hiding it
    would defeat the negative-count alerting contract below.

    Contract: ``deleted_rows`` must be a subset of the facts the rollup
    aggregated — deleting never-aggregated rows would drive counts negative,
    which this operator surfaces loudly by keeping such rows with their
    negative count, INCLUDING deletions whose key is absent from the rollup
    entirely (full-outer join, base side coalesced to zero → the orphan
    deletion appears as ``n = -k``; a left join would have silently
    swallowed exactly the reconciliation bug this is meant to expose).
    Callers alert on ``n < 0``. Pinned by test.

    Scale shape: one deletion-sized aggregation (map-side partial) + one
    rollup-sized full-outer join — base facts are never touched, the same
    budget as the insert path. NULL keys: a NULL-keyed deletion cannot
    equi-join its NULL-keyed rollup row, so both surface unmatched (the
    rollup row unchanged, the deletion as a negative orphan) — loud, not
    wrong, and documented.
    """
    sum_exprs = dict(sum_exprs or {})
    keys = list(keys)
    aggs = [F.count(F.lit(1)).alias(count_col)]
    aggs += [e.alias(name) for name, e in sum_exprs.items()]
    del_agg = deleted_rows.groupBy(*[F.col(k) for k in keys]).agg(*aggs)
    measures = [count_col, *sum_exprs]
    b = base_agg.select(
        *keys, *[F.col(m).alias(f"__b_{m}") for m in measures]
    )
    d = del_agg.select(*keys, *[F.col(m).alias(f"__d_{m}") for m in measures])
    joined = b.join(d, on=keys, how="full_outer")
    out = joined.select(
        *keys,
        *[
            (
                F.coalesce(F.col(f"__b_{m}"), F.lit(0))
                - F.coalesce(F.col(f"__d_{m}"), F.lit(0))
            ).alias(m)
            for m in measures
        ],
    )
    # Keep-it-loud: drop a key only when EVERY measure cancelled to zero.
    # Filtering on count alone would silently swallow a contract violation
    # where deleted counts exactly cancel base counts but sums differ —
    # precisely the reconciliation bug the negative-count convention exists
    # to surface.
    keep = F.col(count_col) != 0
    for m in sum_exprs:
        keep = keep | (F.col(m) != 0)
    return out.where(keep)
