from polars_order_book_spark.streaming.book_stream import top_n_levels_stream

__all__ = ["top_n_levels_stream"]
