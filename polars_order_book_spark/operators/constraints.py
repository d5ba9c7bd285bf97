"""Declarative data-quality constraints evaluated in one pass.

A 100 TB ingest needs its invariants CHECKED, not assumed: key uniqueness,
non-null columns, value ranges, referential integrity. This is the
expectations layer (the deequ/dbt-test shape) as plain DataFrame algebra:

* row-level predicates (not-null, range, custom boolean SQL) fold into ONE
  conditional aggregate pass over the table — one scan, map-side partials,
  no matter how many rules;
* ``unique`` rules need a distinct count — same scan feeds a grouped count;
* ``foreign_key`` rules are left-anti joins against the referenced key set
  (broadcast when the referenced side is dimension-sized).

Output: one row per rule — (rule, kind, n_violations, n_checked) — so the
report is rules-sized, never data-sized, and a scheduler can gate a pipeline
on ``max(n_violations) == 0``.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Rule:
    """One constraint. ``kind``: 'predicate' (expr must hold on every row),
    'unique' (cols must be a key), or 'foreign_key' (cols must exist in
    ``ref`` — pass the referenced DataFrame via check_constraints' refs)."""

    name: str
    kind: str
    expr: str = ""
    cols: "tuple[str, ...]" = field(default_factory=tuple)
    ref: str = ""


def not_null(name: str, col: str) -> Rule:
    return Rule(name, "predicate", expr=f"`{col}` IS NOT NULL")


def in_range(name: str, col: str, lo, hi) -> Rule:
    def lit(v):
        # Quote non-numeric bounds: a raw '2024-01-01' would parse as
        # integer subtraction (2024-1-1 = 2022) and silently corrupt the
        # predicate. Strings/dates/timestamps render as SQL string
        # literals, which Spark coerces against the column's type.
        if isinstance(v, bool) or not isinstance(v, (int, float)):
            escaped = str(v).replace("'", "''")
            return f"'{escaped}'"
        return repr(v)

    return Rule(name, "predicate", expr=f"`{col}` BETWEEN {lit(lo)} AND {lit(hi)}")


def predicate(name: str, expr: str) -> Rule:
    return Rule(name, "predicate", expr=expr)


def unique(name: str, *cols: str) -> Rule:
    return Rule(name, "unique", cols=tuple(cols))


def foreign_key(name: str, col: str, ref: str) -> Rule:
    return Rule(name, "foreign_key", cols=(col,), ref=ref)


def observe_quality(df: DataFrame, rules: "list[Rule]", name: str = "quality"):
    """Attach predicate-rule violation counters to a DataFrame as OBSERVED
    metrics: the counts are computed INSIDE whatever job the caller runs on
    the returned frame — zero extra scans, the way a 100 TB pipeline gets
    its quality numbers for free while writing its real output.

    Only row-level 'predicate' rules qualify (unique/foreign_key need their
    own shuffles — use :func:`check_constraints` for a full report).
    Returns ``(df_with_observation, observation)``; after ANY action on the
    returned frame, ``observation.get`` yields ``{rule_name: violations,
    __n: rows}``. Metrics are exact for batch queries (computed once per
    row regardless of task retries — Spark's observe contract)."""
    preds = [r for r in rules if r.kind == "predicate"]
    if not preds or len(preds) != len(rules):
        raise ValueError("observe_quality takes only 'predicate' rules (>=1)")
    from pyspark.sql import Observation

    obs = Observation(name)
    # coalesce: sum() observes NULL on an empty frame — a gate comparing
    # to 0 would see neither pass nor fail (r8 self-review, same fix as
    # check_constraints)
    exprs = [
        F.coalesce(F.sum(F.when(F.expr(r.expr), 0).otherwise(1)), F.lit(0)).alias(
            r.name
        )
        for r in preds
    ] + [F.count(F.lit(1)).alias("__n")]
    return df.observe(obs, *exprs), obs


def check_constraints(
    df: DataFrame,
    rules: "list[Rule]",
    *,
    refs: "dict[str, DataFrame] | None" = None,
    broadcast_refs: bool = True,
) -> DataFrame:
    """Evaluate every rule; return (rule, kind, n_violations, n_checked).

    All predicate rules share ONE aggregate pass. A 'unique' violation count
    is (rows - distinct keys): 0 for a perfect key, and each extra copy of a
    duplicated key counts once. NULL-keyed rows count as violations of a
    'unique' rule (count_distinct excludes them from the distinct side) —
    a real key admits no nulls; pair with not_null when you want the null
    count attributed separately. Foreign-key violation count = rows whose
    key has no match in the referenced frame (nulls violate, as in a
    mandatory relationship). ``n_checked`` is the table's row count for
    every rule — the denominator a quality dashboard normalizes by.
    """
    if not rules:
        raise ValueError("rules must be non-empty")
    refs = refs or {}
    preds = [r for r in rules if r.kind == "predicate"]
    uniqs = [r for r in rules if r.kind == "unique"]
    fks = [r for r in rules if r.kind == "foreign_key"]
    unknown = [r.name for r in rules if r.kind not in ("predicate", "unique", "foreign_key")]
    if unknown:
        raise ValueError(f"unknown rule kinds for: {unknown}")
    missing = [r.name for r in fks if r.ref not in refs]
    if missing:
        raise ValueError(f"foreign_key rules missing refs entries: {missing}")

    aggs = [F.count(F.lit(1)).alias("__n")]
    for r in preds:
        # coalesce: sum() over ZERO rows is NULL, so an empty table would
        # report n_violations NULL for predicate rules (but 0 for unique
        # rules) — a scheduler gating on max(n_violations) == 0 sees
        # neither pass nor fail (r8 self-review). An empty table violates
        # nothing: 0.
        aggs.append(
            F.coalesce(
                F.sum(F.when(F.expr(r.expr), 0).otherwise(1)), F.lit(0)
            ).alias(f"__v_{r.name}")
        )
    for r in uniqs:
        aggs.append(
            (F.count(F.lit(1)) - F.count_distinct(*[F.col(c) for c in r.cols])).alias(
                f"__v_{r.name}"
            )
        )
    base = df.agg(*aggs)

    out = None
    for r in preds + uniqs:
        row = base.select(
            F.lit(r.name).alias("rule"),
            F.lit(r.kind).alias("kind"),
            F.col(f"__v_{r.name}").cast("long").alias("n_violations"),
            F.col("__n").cast("long").alias("n_checked"),
        )
        out = row if out is None else out.unionByName(row)
    for r in fks:
        ref_df = refs[r.ref].select(*[F.col(c) for c in r.cols]).distinct()
        if broadcast_refs:
            ref_df = F.broadcast(ref_df)
        viol = df.join(ref_df, list(r.cols), "left_anti").agg(
            F.count(F.lit(1)).cast("long").alias("n_violations")
        )
        row = viol.crossJoin(F.broadcast(base.select(F.col("__n").cast("long").alias("n_checked")))).select(
            F.lit(r.name).alias("rule"),
            F.lit(r.kind).alias("kind"),
            "n_violations",
            "n_checked",
        )
        out = row if out is None else out.unionByName(row)
    return out
