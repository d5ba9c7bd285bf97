"""Snapshot diffing: what changed between two versions of a table.

Reprocessing a 100 TB curation pipeline ends with "is the new output what we
expect?" — a row-level diff against the previous snapshot: which keys were
added, which removed, which rows changed in place. This is the validation
primitive behind safe backfills, CDC reconciliation, and regression-testing
a pipeline change before promoting it.

Plan shape: ONE full-outer shuffle join on the key (the only correct shape —
every key must meet its counterpart), comparing a single pre-computed row
fingerprint instead of N per-column equalities, so the join's residual is
one string compare regardless of schema width. Unchanged rows are dropped
BEFORE any downstream consumer sees them: the output is proportional to the
churn, not the table.

Fingerprint portability: md5 over '\\x1f'-joined column strings with a
'\\x00' null sentinel — engine-portable for string/integer/decimal columns.
DOUBLE columns format differently across engines (cast or scale them first,
e.g. floor(x*100 + 0.5) for money); the caller picks ``compare_cols``
accordingly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SEP = "\x1f"
_NULL = "\x00"


def row_fingerprint(cols: "list[str | Column]") -> Column:
    """md5 fingerprint of the given columns, null-safe and engine-portable
    (see module docstring for the double-column caveat)."""
    parts = [
        F.coalesce((F.col(c) if isinstance(c, str) else c).cast("string"), F.lit(_NULL))
        for c in cols
    ]
    return F.md5(F.concat_ws(_SEP, *parts))


def diff_snapshots(
    old: DataFrame,
    new: DataFrame,
    key_cols: "list[str]",
    *,
    compare_cols: "list[str | Column] | None" = None,
    keep_unchanged: bool = False,
) -> DataFrame:
    """Row-level diff of two snapshots keyed by ``key_cols``.

    Output: key columns + ``change_type`` ('added' | 'removed' | 'changed'
    [| 'unchanged' when ``keep_unchanged``]) + ``old_fingerprint`` /
    ``new_fingerprint`` (null on the absent side). ``compare_cols`` defaults
    to every non-key column the two schemas SHARE — schema-evolution columns
    present on one side only are ignored unless named explicitly.

    ``key_cols`` must uniquely identify rows on EACH side, ENFORCED per row
    (r8 self-review): a duplicated key — including two NULL-keyed rows,
    which eqNullSafe groups together — cross-pairs M×N in the full-outer
    join and reports phantom 'changed' rows on identical snapshots. The
    check is a count window over the join's own key partitioning, so the
    exchange is reused; a violating snapshot fails loudly instead of
    emitting churn a backfill gate would act on.
    """
    if not key_cols:
        raise ValueError("key_cols must be non-empty")
    if compare_cols is None:
        shared = [c for c in old.columns if c in set(new.columns)]
        compare_cols = [c for c in shared if c not in set(key_cols)]
        if not compare_cols:
            raise ValueError(
                "no shared non-key columns to compare; pass compare_cols"
            )
    from pyspark.sql import Window

    def keyed_side(df: DataFrame, prefix: str, fp_name: str, side: str) -> DataFrame:
        rel = df.select(
            *[F.col(k).alias(f"{prefix}{k}") for k in key_cols],
            row_fingerprint(compare_cols).alias(fp_name),
        )
        w = Window.partitionBy(*[f"{prefix}{k}" for k in key_cols])
        dup_ok = F.assert_true(
            F.count(F.lit(1)).over(w) == 1,
            F.concat(
                F.lit(f"diff_snapshots: duplicate key in the {side} snapshot ("),
                F.concat_ws(
                    ", ",
                    *[
                        F.coalesce(F.col(f"{prefix}{k}").cast("string"), F.lit("NULL"))
                        for k in key_cols
                    ],
                ),
                F.lit(") — key_cols must uniquely identify rows; a duplicate "
                      "(incl. multiple NULL keys) would cross-pair in the "
                      "full-outer join and report phantom changes"),
            ),
        )
        # window expressions are not allowed directly in WHERE — project
        # the guard first, then filter on the materialized column
        return (
            rel.withColumn("__dup_ok", dup_ok)
            .where(F.col("__dup_ok").isNull())
            .drop("__dup_ok")
        )

    o = keyed_side(old, "__ok_", "old_fingerprint", "old")
    n = keyed_side(new, "__nk_", "new_fingerprint", "new")
    cond = None
    for k in key_cols:
        # eqNullSafe: a null key must match its counterpart — plain equality
        # is null for null keys, the full-outer join then never pairs them,
        # and an unchanged null-keyed row would report as removed AND added.
        eq = o[f"__ok_{k}"].eqNullSafe(n[f"__nk_{k}"])
        cond = eq if cond is None else (cond & eq)
    change = (
        F.when(F.col("old_fingerprint").isNull(), F.lit("added"))
        .when(F.col("new_fingerprint").isNull(), F.lit("removed"))
        .when(F.col("old_fingerprint") != F.col("new_fingerprint"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    out = (
        o.join(n, cond, "full_outer")
        .select(
            *[
                F.coalesce(F.col(f"__ok_{k}"), F.col(f"__nk_{k}")).alias(k)
                for k in key_cols
            ],
            change.alias("change_type"),
            "old_fingerprint",
            "new_fingerprint",
        )
    )
    if not keep_unchanged:
        out = out.where(F.col("change_type") != "unchanged")
    return out
