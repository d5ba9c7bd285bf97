"""Exchange-message → event-stream conversion helpers.

Mirrors the documented workflow at ref: README.md:131-162: raw feeds carry
``side`` strings, float prices, and message types; the operator wants
``is_bid: bool``, integer prices, signed quantities. All pure built-in
column expressions — JVM-side, codegen-friendly, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def side_to_is_bid(side: Column | str, bid_values: tuple[str, ...] = ("bid", "b", "buy")) -> Column:
    """'bid'/'ask'-style strings → boolean (ref: README.md:147-151)."""
    c = F.col(side) if isinstance(side, str) else side
    return F.lower(c).isin(list(bid_values))


def scale_price(price: Column | str, price_factor: int) -> Column:
    """Float price → integer ticks: round(price * factor) cast long
    (PRICE_FACTOR recipe, ref: README.md:145-158)."""
    c = F.col(price) if isinstance(price, str) else price
    return F.round(c * F.lit(price_factor)).cast("long")


def unscale_prices(df: DataFrame, price_factor: int, pattern: str = r"^(bid|ask)_price_\d+$") -> DataFrame:
    """Scale snapshot price columns back to floats (ref: README.md:158 uses
    pl.selectors.matches; Spark idiom is a comprehension over df.columns)."""
    import re

    rx = re.compile(pattern)
    return df.select(
        *[
            (F.col(c) / F.lit(price_factor)).alias(c) if rx.match(c) else F.col(c)
            for c in df.columns
        ]
    )


def signed_qty(message_type: Column | str, qty: Column | str,
               delete_types: tuple[str, ...] = ("delete", "trade")) -> Column:
    """delete/trade message types → negative mutation qty (ref: README.md:149-151)."""
    mt = F.col(message_type) if isinstance(message_type, str) else message_type
    q = F.col(qty) if isinstance(qty, str) else qty
    return F.when(F.lower(mt).isin(list(delete_types)), -q).otherwise(q)


def hash_stable_double(col: Column | str, digits: int = 6) -> Column:
    """Round a double for cross-engine hash-stable emission: ``round(x, d)
    + 0.0``. The ``+ 0.0`` maps IEEE ``-0.0`` → ``+0.0`` (round-to-nearest
    addition of opposite-signed zeros yields +0.0), closing the one hash
    divergence float emission can hit after rounding: a tiny negative that
    rounds to zero keeps its sign bit under Spark's round() on some inputs
    and DuckDB's on others, compares ``==`` equal, but hashes differently.
    Every float column a query emits should pass through this helper (and
    its SQL twin below) in BOTH renderings.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c, digits) + F.lit(0.0)


def hash_stable_double_sql(expr: str, digits: int = 6) -> str:
    """DuckDB/ANSI rendering of :func:`hash_stable_double`; embed in
    oracle_sql strings: ``(round(<expr>, d) + 0.0)``."""
    return f"(round({expr}, {digits}) + 0.0)"
