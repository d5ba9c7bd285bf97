"""shuffle_partitions fallback chain: numeric conf, non-numeric conf (managed
runtimes report "auto" — stock Spark won't even let conf.set store it, which
is exactly why operators can't bare-int() the value), and the
DataFrame/default fallbacks."""

from polars_order_book_spark.functions.runtime import shuffle_partitions


def test_numeric_conf_wins(spark):
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "17")
        assert shuffle_partitions(spark) == 17
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)


def test_non_numeric_conf_falls_back_to_df_partitions(spark, monkeypatch):
    # stock Spark validates the conf as numeric on set, so simulate a
    # managed runtime by patching the getter
    monkeypatch.setattr(spark.conf, "get", lambda *a, **kw: "auto")
    df = spark.range(100).repartition(5)
    assert shuffle_partitions(spark, fallback_df=df) == 5


def test_non_numeric_conf_without_df_uses_default(spark, monkeypatch):
    monkeypatch.setattr(spark.conf, "get", lambda *a, **kw: "auto")
    assert shuffle_partitions(spark, default=42) == 42
