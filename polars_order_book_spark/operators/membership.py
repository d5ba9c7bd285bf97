"""Bloom-filter membership: build a bounded bit-set from a key column and use
it as a pre-shuffle semi-join filter (the runtime-filter pattern).

Spark's own Bloom runtime filters (`spark.sql.optimizer.runtimeFilter.*`) do
this inside the optimizer for eligible equi-joins; this module is the
PORTABLE relational rendering — every bit is reproducible in a DuckDB oracle
— and it works where the optimizer's version cannot be steered (cross-format
probes, persisted filters reused across jobs, FP-rate auditing).

Representation — the filter stays RELATIONAL: a distinct set of ≤ ``bits``
integer rows. Building is a distinct over a BOUNDED space (map-side partial
collapses each task to ≤ k·|keys| but never more than ``bits`` rows), so the
exchange is O(tasks · bits) worst case regardless of build-side size. Probing
is ``k`` broadcast left joins (the bit set is tiny) — map-only on the probe
side, no explode, no per-row groupBy; ``k`` is a small compile-time constant
so the probe is one whole-stage-codegen pass over the 100 TB side.

Guarantee: no false negatives (a build-side key always probes true — pinned
by property test); false positives occur at roughly (1 - e^{-k·n/bits})^k and
are counted exactly by :func:`bloom_probe_stats`'s comparison against the
true semi-join.

Hashes are the portable md5-derived ``hash64`` of ``"<i>:<key>"`` mod
``bits`` (functions/hashing.py) — bit-for-bit reproducible cross-engine, no
UDFs anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from polars_order_book_spark.functions.hashing import hash64


def _bit(key: Column, i: int, bits: int) -> Column:
    return F.pmod(hash64(F.concat(F.lit(f"{i}:"), key.cast("string"))), F.lit(bits))


def bloom_build(df: DataFrame, key_col: str, *, bits: int = 65536, k: int = 5) -> DataFrame:
    """Distinct bit positions set by the non-null keys of ``df`` — a
    single-column (``bit`` long) relation with ≤ ``bits`` rows."""
    if k < 1 or bits < 2:
        raise ValueError(f"need k >= 1, bits >= 2; got k={k}, bits={bits}")
    key = F.col(key_col)
    return (
        df.where(key.isNotNull())
        .select(
            F.explode(F.array(*[_bit(key, i, bits) for i in range(k)])).alias("bit")
        )
        .distinct()
    )


def bloom_probe(
    df: DataFrame,
    key_col: str,
    bloom: DataFrame,
    *,
    bits: int = 65536,
    k: int = 5,
    flag_col: str = "bloom_pass",
) -> DataFrame:
    """``df`` plus a boolean ``flag_col``: true iff every one of the key's
    ``k`` bits is present in ``bloom``. Null keys probe false. Implemented as
    ``k`` broadcast left joins against the bit set — map-only on ``df``."""
    key = F.col(key_col)
    out = df
    hit_cols = []
    for i in range(k):
        marker = f"__bloom_hit_{i}"
        hit_cols.append(marker)
        side = F.broadcast(bloom.select(F.col("bit").alias(f"__bit_{i}"), F.lit(True).alias(marker)))
        out = out.join(side, _bit(key, i, bits) == F.col(f"__bit_{i}"), "left").drop(f"__bit_{i}")
    flag = key.isNotNull()
    for marker in hit_cols:
        flag = flag & F.coalesce(F.col(marker), F.lit(False))
    return out.withColumn(flag_col, flag).drop(*hit_cols)


def bloom_probe_stats(
    probe_df: DataFrame,
    probe_key: str,
    build_df: DataFrame,
    build_key: str,
    group_cols: list[str],
    *,
    bits: int = 65536,
    k: int = 5,
) -> DataFrame:
    """End-to-end audit of the filter: probe every row of ``probe_df``
    against a Bloom filter built from ``build_df[build_key]`` AND against the
    exact (broadcast, distinct-key) semi-join, grouped by ``group_cols``.
    Returns (*group_cols, n_rows, n_bloom_pass, n_true_match, n_false_pos)
    — ``n_false_pos = n_bloom_pass - n_true_match`` holds because there are
    no false negatives. The exact side broadcasts the DISTINCT build keys, so
    the audit itself stays map-only on the probe side.
    """
    bloom = bloom_build(build_df, build_key, bits=bits, k=k)
    flagged = bloom_probe(probe_df, probe_key, bloom, bits=bits, k=k)
    truth = F.broadcast(
        build_df.where(F.col(build_key).isNotNull())
        .select(F.col(build_key).alias("__true_key"))
        .distinct()
        .withColumn("__true", F.lit(True))
    )
    flagged = flagged.join(
        truth, F.col(probe_key) == F.col("__true_key"), "left"
    ).withColumn("__true", F.coalesce(F.col("__true"), F.lit(False)))
    longsum = lambda c: F.sum(F.col(c).cast("long"))  # noqa: E731
    return (
        flagged.withColumn("__one", F.lit(1))
        .groupBy(*group_cols)
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            longsum("bloom_pass").alias("n_bloom_pass"),
            longsum("__true").alias("n_true_match"),
            (longsum("bloom_pass") - longsum("__true")).alias("n_false_pos"),
        )
    )
