"""Space-filling-curve layout control for data-skipping scans.

Parquet readers prune row groups with min/max statistics; a table sorted on
one column skips well on that column and not at all on others. Sorting by a
Z-order (Morton) key interleaves the bits of several columns so rows close in
the key are close in EVERY dimension — min/max stats become selective for
predicates on any participating column. This is the layout trick behind
Delta/Iceberg ``OPTIMIZE ZORDER BY``, expressed here as plain Spark column
arithmetic (shift/mask/or — whole-stage codegen, no UDF).

Scale shape: computing the key is map-only; laying out the table is one
range-repartition + within-partition sort (`zorder_sort`) — the same single
shuffle any global sort pays.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_key(
    cols: Sequence[Column], bits: int = 16, validate: bool = False
) -> Column:
    """Morton key interleaving ``bits`` low bits of each column.

    Inputs must be non-negative integers < 2**bits (the caller normalizes —
    e.g. bucket ids, ranks, or range-scaled values). Values OUTSIDE that
    range do not error by default: only the low ``bits`` bits are read, so
    out-of-range values silently ALIAS (x and x + 2**bits interleave
    identically) and clustering on that dimension quietly degrades. Pass
    ``validate=True`` to raise per row instead (one extra branch per value).
    With k columns the key has k*bits significant bits (≤ 62 to stay in a
    signed long): bit i of column j lands at position i*k + j.
    """
    cols = list(cols)
    k = len(cols)
    if k < 2:
        raise ValueError("zorder_key needs at least 2 columns")
    if bits < 1 or k * bits > 62:
        raise ValueError(
            f"k*bits must be in [2, 62] to fit a signed long, got {k}*{bits}"
        )
    key = F.lit(0).cast("long")
    for j, c in enumerate(cols):
        lc = c.cast("long")
        if validate:
            lc = F.when(
                (lc < 0) | (lc >= 2**bits),
                F.raise_error(
                    F.concat(
                        F.lit(f"zorder_key: value out of [0, {2**bits}) range: "),
                        lc.cast("string"),
                    )
                ).cast("long"),
            ).otherwise(lc)
        for i in range(bits):
            bit = F.shiftright(lc, i).bitwiseAND(F.lit(1))
            key = key.bitwiseOR(F.shiftleft(bit, i * k + j))
    return key


def zorder_sort(
    df: DataFrame,
    cols: Sequence[str],
    bits: int = 16,
    partitions: int | None = None,
) -> DataFrame:
    """Return ``df`` laid out in Z-order over ``cols`` (dropping the key):
    one range-repartition on the Morton key + within-partition sort, so a
    subsequent partitioned/plain write produces files whose min/max stats
    skip on every participating column."""
    key = zorder_key([F.col(c) for c in cols], bits=bits)
    keyed = df.withColumn("__zkey", key)
    rep = (
        keyed.repartitionByRange(partitions, "__zkey")
        if partitions
        else keyed.repartitionByRange("__zkey")
    )
    return rep.sortWithinPartitions("__zkey").drop("__zkey")


def zorder_key_sql(cols: Sequence[str], bits: int = 16) -> str:
    """DuckDB/ANSI rendering of :func:`zorder_key` for oracle parity —
    the identical shift/mask/or expression as SQL text."""
    k = len(cols)
    if k < 2 or bits < 1 or k * bits > 62:
        raise ValueError("same domain as zorder_key")
    terms = []
    for j, c in enumerate(cols):
        for i in range(bits):
            # CAST to BIGINT mirrors zorder_key's long cast: without it a
            # 32-bit column overflows DuckDB's left shift at position >= 31
            # (bits=16, k=2 reaches 31).
            terms.append(
                f"(((CAST({c} AS BIGINT) >> {i}) & 1) << {i * k + j})"
            )
    return " | ".join(terms)
