"""Deterministic sampling for training-data pipelines.

`df.sample()` is seed-and-partitioning dependent — rerunning after a
repartition (or on another engine) yields a different subset, which breaks
reproducible dataset curation. These samplers decide membership from a
PORTABLE hash of the row's own key (functions.hashing.hash64: md5-derived,
bit-identical in DuckDB), so the sample is a pure function of the data:
stable across runs, partitionings, engines, and appends (a row's membership
never changes as the dataset grows — the property curation pipelines rely on
for incremental reprocessing).

Scale shape: a map-only filter — no shuffle, no state; pushes through any
downstream plan like an ordinary predicate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from polars_order_book_spark.functions.hashing import hash64

_BUCKETS = 1_000_000  # ppm resolution


def hash_sample_col(key: Column, rate: float, salt: str = "") -> Column:
    """Boolean membership column: True for ~rate of distinct keys."""
    if not (0.0 <= rate <= 1.0):
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    keyed = F.concat(key.cast("string"), F.lit(salt))
    return F.pmod(hash64(keyed), F.lit(_BUCKETS)) < int(round(rate * _BUCKETS))


def hash_sample(
    df: DataFrame,
    key_col: str,
    rate: float,
    *,
    salt: str = "",
) -> DataFrame:
    """Keep ~``rate`` of rows, decided by hash(key||salt) — deterministic and
    engine-portable. ``salt`` yields independent samples from the same keys
    (e.g. train/validation splits: disjoint salts, disjoint randomness)."""
    return df.where(hash_sample_col(F.col(key_col), rate, salt))


def hash_split(
    df: DataFrame,
    key_col: str,
    weights: "list[float]",
    *,
    salt: str = "",
) -> "list[DataFrame]":
    """Disjoint deterministic splits (e.g. [0.9, 0.05, 0.05] train/val/test):
    bucket = hash(key||salt) mod 1e6 falls into consecutive weight ranges, so
    every key lands in exactly one split, stably."""
    if any(w < 0 for w in weights) or abs(sum(weights) - 1.0) > 1e-9:
        raise ValueError("weights must be non-negative and sum to 1")
    keyed = F.concat(F.col(key_col).cast("string"), F.lit(salt))
    bucket = F.pmod(hash64(keyed), F.lit(_BUCKETS))
    out = []
    lo = 0.0
    for w in weights:
        hi = lo + w
        out.append(
            df.where(
                (bucket >= int(round(lo * _BUCKETS))) & (bucket < int(round(hi * _BUCKETS)))
            )
        )
        lo = hi
    return out
