"""`bookgen` — a custom Spark 4 Python DataSource generating deterministic
order-book mutation events, batch AND streaming.

Why it exists: the reference ingests exchange event files (CSV replays, ref:
order_book/benches/ninja.rs:26-38); a Spark-native engine should ALSO show
the other half of the connector story — a first-class pluggable source with
partition planning and filter pushdown, not just file readers. This is the
smallest real instance of Spark 4's Python DataSource V2 API:

* ``partitions()`` splits the seq domain into ranges — each range reads
  independently on an executor (parallelism = n_partitions, no driver
  bottleneck);
* ``pushFilters()`` accepts equality/range filters on ``seq`` and ``book``
  and the generator SKIPS non-matching rows at the source — the same
  scan-reduction contract parquet PushedFilters give us, proving the plumbing
  end-to-end in a source we fully control;
* ``simpleStreamReader()`` serves the same rows as an offset-tracked stream
  (micro-batches of ``batch_size`` seqs), so one connector backs both
  ``spark.read`` and ``spark.readStream``.

Everything is a pure function of ``seq`` (modular arithmetic, no RNG), so a
DuckDB ``generate_series`` oracle reproduces the stream bit-for-bit.

Usage::

    from polars_order_book_spark.sources import bookgen
    bookgen.register(spark)  # registers the source AND enables
                             # spark.sql.python.filterPushdown.enabled —
                             # without it Spark REFUSES a Python reader
                             # that implements pushFilters()
    df = (spark.read.format("bookgen")
          .option("n_events", 20000).option("n_partitions", 8).load())
"""

from __future__ import annotations

from typing import Iterator, Tuple

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    Filter,
    GreaterThanOrEqual,
    InputPartition,
    LessThanOrEqual,
    SimpleDataSourceStreamReader,
)

SCHEMA = "seq bigint, book bigint, is_bid boolean, price bigint, qty bigint"

# The row formulas — shared by batch, streaming, and the SQL oracle
# (BOOKGEN_ORACLE_SQL renders the same arithmetic for DuckDB).
N_BOOKS = 7
N_PRICES = 20


def row_of(seq: int) -> Tuple[int, int, bool, int, int]:
    return (
        seq,
        seq % N_BOOKS,
        seq % 2 == 0,
        (seq * 31) % N_PRICES + 1,
        (seq * 17) % 5 + 1,
    )


def oracle_sql(n_events: int) -> str:
    """DuckDB SQL producing exactly the source's rows."""
    return f"""
SELECT seq, seq % {N_BOOKS} AS book, seq % 2 = 0 AS is_bid,
       (seq * 31) % {N_PRICES} + 1 AS price, (seq * 17) % 5 + 1 AS qty
FROM (SELECT CAST(range AS BIGINT) AS seq FROM range(0, {int(n_events)}))
"""


class _Range(InputPartition):
    def __init__(self, start: int, end: int):
        self.start, self.end = start, end


class BookGenReader(DataSourceReader):
    def __init__(self, options):
        self.n_events = int(options.get("n_events", 10_000))
        self.n_partitions = int(options.get("n_partitions", 8))
        if self.n_events < 0 or self.n_partitions < 1:
            raise ValueError("n_events must be >= 0 and n_partitions >= 1")
        # pushed-down bounds: seq range narrows the generated domain;
        # book equality skips rows inside it
        self._seq_lo = 0
        self._seq_hi = self.n_events  # exclusive
        # a SET, not a scalar: a conjunction of conflicting equalities
        # (book = 1 AND book = 2) pushes BOTH filters — keeping only the
        # last would return book-2 rows where the correct answer is empty
        # (r8 self-review). Two or more members = no row can satisfy all.
        self._book_eqs: "set[int]" = set()

    def pushFilters(self, filters: "list[Filter]"):
        for f in filters:
            col = f.attribute[0] if f.attribute else None
            if isinstance(f, EqualTo) and col == "book":
                self._book_eqs.add(int(f.value))
            elif isinstance(f, GreaterThanOrEqual) and col == "seq":
                self._seq_lo = max(self._seq_lo, int(f.value))
            elif isinstance(f, LessThanOrEqual) and col == "seq":
                self._seq_hi = min(self._seq_hi, int(f.value) + 1)
            else:
                yield f  # unsupported -> Spark re-applies it post-scan

    def partitions(self):
        lo, hi = self._seq_lo, max(self._seq_lo, self._seq_hi)
        span = hi - lo
        k = min(self.n_partitions, span) or 1
        step = -(-span // k) if span else 1
        return [_Range(s, min(s + step, hi)) for s in range(lo, hi, step)] or [
            _Range(lo, lo)
        ]

    def read(self, partition: _Range) -> Iterator[Tuple]:
        books = self._book_eqs
        if len(books) > 1:
            return  # conflicting equalities: no row satisfies all
        book = next(iter(books)) if books else None
        for seq in range(partition.start, partition.end):
            if book is not None and seq % N_BOOKS != book:
                continue
            yield row_of(seq)


class BookGenStreamReader(SimpleDataSourceStreamReader):
    """Offset-tracked stream over the same generator: offset = next unread
    seq; each micro-batch serves ``batch_size`` seqs until ``n_events`` is
    exhausted (then empty batches). Deterministic replay between any two
    offsets — exactly the contract checkpoint recovery requires."""

    def __init__(self, options):
        self.n_events = int(options.get("n_events", 10_000))
        self.batch_size = int(options.get("batch_size", 1_000))
        if self.batch_size < 1:
            raise ValueError("batch_size must be >= 1")

    def initialOffset(self) -> dict:
        return {"seq": 0}

    def read(self, start: dict) -> "Tuple[Iterator[Tuple], dict]":
        lo = int(start["seq"])
        hi = min(lo + self.batch_size, self.n_events)
        return iter([row_of(s) for s in range(lo, hi)]), {"seq": hi}

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[Tuple]:
        return iter([row_of(s) for s in range(int(start["seq"]), int(end["seq"]))])


class BookGenDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "bookgen"

    def schema(self) -> str:
        return SCHEMA

    def reader(self, schema) -> BookGenReader:
        return BookGenReader(self.options)

    def simpleStreamReader(self, schema) -> BookGenStreamReader:
        return BookGenStreamReader(self.options)


def register(spark) -> None:
    # Python-source filter pushdown is opt-in (off by default in Spark 4);
    # without it Spark refuses a reader that implements pushFilters().
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(BookGenDataSource)
