from polars_order_book_spark.streaming.book_stream import top_n_levels_stream
from polars_order_book_spark.streaming.session_stream import sessionize_stream
from polars_order_book_spark.streaming.dedup_stream import (
    dedup_stream_with_survivor,
    drop_duplicates_within_watermark,
    drop_exact_duplicates_stream,
)
from polars_order_book_spark.streaming.join_stream import interval_join_stream
from polars_order_book_spark.streaming.profile_stream import user_profile_stream
from polars_order_book_spark.streaming.frequency_stream import heavy_hitters_stream
from polars_order_book_spark.streaming.merge_stream import (
    apply_changes_stream,
    init_table,
    read_current,
)

__all__ = [
    "top_n_levels_stream",
    "sessionize_stream",
    "interval_join_stream",
    "user_profile_stream",
    "heavy_hitters_stream",
    "dedup_stream_with_survivor",
    "drop_exact_duplicates_stream",
    "drop_duplicates_within_watermark",
    "apply_changes_stream",
    "init_table",
    "read_current",
]
