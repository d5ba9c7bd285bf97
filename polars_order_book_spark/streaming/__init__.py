from polars_order_book_spark.streaming.book_stream import top_n_levels_stream
from polars_order_book_spark.streaming.session_stream import sessionize_stream
from polars_order_book_spark.streaming.dedup_stream import (
    dedup_stream_with_survivor,
    drop_exact_duplicates_stream,
)

__all__ = [
    "top_n_levels_stream",
    "sessionize_stream",
    "dedup_stream_with_survivor",
    "drop_exact_duplicates_stream",
]
