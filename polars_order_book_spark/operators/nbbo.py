"""NBBO — consolidated best bid/offer across books.

The reference maintains ONE book per key (ref: README.md:184-197 multi-product
group_by); the consolidated view one level up — "best bid/ask across all
venues, with total displayed size at that price" — is the National BBO
(Reg-NMS shape). Input is the keyed n=1 snapshot stream the existing
operators already produce; output is one row per event with the
cross-book best.

Semantics per event seq:
* every book's state = its most recent snapshot at or before seq (forward
  fill over the global timeline);
* ``nbb_price`` = max bid across books, ``nbo_price`` = min ask;
* ``nbb_qty`` / ``nbo_qty`` = TOTAL size across all books quoting exactly
  the best price (consolidated displayed size).

Empty-side correctness: a book whose bid side empties must STOP contributing
— a bare ignore-nulls forward fill would carry its stale price forever. Each
snapshot therefore encodes "now empty" as a sentinel before the fill and
decodes after (prices must exceed ``empty_sentinel``; the default -1 suits
positive integer ticks).

Scale contract: the book count B is venue-bounded (dimension-sized — tens,
not millions), so the pivot is 4·B columns wide. The forward fill is ONE
global ordered window — the NBBO timeline is inherently sequential, the same
single-task bound as an unkeyed book fold; shard by seq ranges (fold's
``seq_chunks`` recipe) when one task cannot hold the timeline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def nbbo(
    snapshots: DataFrame,
    books: "list",
    *,
    book_col: str = "book",
    seq_col: str = "seq",
    empty_sentinel: int = -1,
) -> DataFrame:
    """Consolidate keyed level-1 snapshots into the cross-book NBBO.

    ``snapshots`` must carry one row per (book, event) with columns
    (book_col, seq_col, bid_price_1, bid_qty_1, ask_price_1, ask_qty_1) —
    the keyed ``top_n_levels_*(n=1)`` output. ``books`` is the explicit book
    id list (venue universe = static configuration, keeping the plan fully
    lazy; ids absent from the data simply never contribute).
    """
    if not books:
        raise ValueError("books must be non-empty")
    sent = F.lit(empty_sentinel)
    enc = snapshots.select(
        F.col(seq_col).alias("seq"),
        F.col(book_col).alias("__book"),
        F.coalesce(F.col("bid_price_1"), sent).alias("bp"),
        F.coalesce(F.col("bid_qty_1"), sent).alias("bq"),
        F.coalesce(F.col("ask_price_1"), sent).alias("ap"),
        F.coalesce(F.col("ask_qty_1"), sent).alias("aq"),
    )
    piv = (
        enc.groupBy("seq")
        .pivot("__book", list(books))
        .agg(
            F.first("bp").alias("bp"),
            F.first("bq").alias("bq"),
            F.first("ap").alias("ap"),
            F.first("aq").alias("aq"),
        )
    )
    w = Window.orderBy("seq").rowsBetween(Window.unboundedPreceding, Window.currentRow)

    def filled(b, c):
        col = F.last(F.col(f"{b}_{c}"), ignorenulls=True).over(w)
        return F.when(col == empty_sentinel, F.lit(None)).otherwise(col)

    cols = {f"{c}{b}": filled(b, c) for b in books for c in ("bp", "bq", "ap", "aq")}
    state = piv.select("seq", *[v.alias(k) for k, v in cols.items()])
    bids = [F.col(f"bp{b}") for b in books]
    asks = [F.col(f"ap{b}") for b in books]
    nbb = F.greatest(*bids) if len(bids) > 1 else bids[0]
    nbo = F.least(*asks) if len(asks) > 1 else asks[0]

    def size_at(price_col, price_of, qty_of):
        terms = [
            F.when(F.col(price_of(b)) == price_col, F.col(qty_of(b))).otherwise(F.lit(0))
            for b in books
        ]
        total = terms[0]
        for t in terms[1:]:
            total = total + t
        return F.when(price_col.isNull(), F.lit(None)).otherwise(total)

    return state.select(
        "seq",
        nbb.alias("nbb_price"),
        size_at(nbb, lambda b: f"bp{b}", lambda b: f"bq{b}").alias("nbb_qty"),
        nbo.alias("nbo_price"),
        size_at(nbo, lambda b: f"ap{b}", lambda b: f"aq{b}").alias("nbo_qty"),
    )
