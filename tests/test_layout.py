"""Z-order (Morton) layout: key correctness vs a Python reference, sort
clustering, and argument validation."""

import random

import pytest

from pyspark.sql import functions as F

from polars_order_book_spark.functions.layout import (
    zorder_key,
    zorder_key_sql,
    zorder_sort,
)


def _morton_ref(vals, bits):
    key = 0
    for j, v in enumerate(vals):
        for i in range(bits):
            key |= ((v >> i) & 1) << (i * len(vals) + j)
    return key


def test_zorder_key_matches_reference(spark):
    rng = random.Random(5)
    rows = [(i, rng.randrange(0, 1024), rng.randrange(0, 1024)) for i in range(200)]
    df = spark.createDataFrame(rows, ["id", "x", "y"])
    got = {
        r["id"]: r["zk"]
        for r in df.select(
            "id", zorder_key([F.col("x"), F.col("y")], bits=10).alias("zk")
        ).collect()
    }
    for i, x, y in rows:
        assert got[i] == _morton_ref([x, y], 10), (i, x, y)


def test_zorder_key_sql_mirror_matches(spark):
    """The SQL rendering must compute the identical key (oracle parity)."""
    rows = [(i, i * 37 % 256, i * 91 % 256) for i in range(64)]
    df = spark.createDataFrame(rows, ["id", "x", "y"])
    df.createOrReplaceTempView("zorder_probe")
    expr = zorder_key_sql(["x", "y"], bits=8)
    via_sql = {
        r["id"]: r["zk"]
        for r in spark.sql(
            f"SELECT id, {expr} AS zk FROM zorder_probe"
        ).collect()
    }
    via_col = {
        r["id"]: r["zk"]
        for r in df.select(
            "id", zorder_key([F.col("x"), F.col("y")], bits=8).alias("zk")
        ).collect()
    }
    assert via_sql == via_col


def test_zorder_sort_clusters_both_dimensions(spark):
    """After z-order layout, each partition's x-range AND y-range must be
    much narrower than the global range (that's the data-skipping point);
    a plain x-sort would leave y unclustered."""
    rng = random.Random(7)
    rows = [(rng.randrange(0, 256), rng.randrange(0, 256)) for _ in range(4000)]
    df = spark.createDataFrame(rows, ["x", "y"])
    laid = zorder_sort(df, ["x", "y"], bits=8, partitions=16)
    spans = (
        laid.withColumn("pid", F.spark_partition_id())
        .groupBy("pid")
        .agg(
            (F.max("x") - F.min("x")).alias("xs"),
            (F.max("y") - F.min("y")).alias("ys"),
        )
        .collect()
    )
    assert len(spans) >= 8
    avg_x = sum(r["xs"] for r in spans) / len(spans)
    avg_y = sum(r["ys"] for r in spans) / len(spans)
    # global span is 255; z-order partitions should average well under half
    assert avg_x < 140, avg_x
    assert avg_y < 140, avg_y
    # and the data survives intact
    assert sorted(map(tuple, laid.collect())) == sorted(rows)


def test_zorder_validation():
    with pytest.raises(ValueError, match="at least 2"):
        zorder_key([F.col("x")])
    with pytest.raises(ValueError, match="signed long"):
        zorder_key([F.col("x"), F.col("y")], bits=32)
    with pytest.raises(ValueError):
        zorder_key_sql(["x"], bits=8)


def test_zorder_validate_raises_on_out_of_range(spark):
    from pyspark.sql.utils import PythonException
    df = spark.createDataFrame([(5, 300)], ["x", "y"])
    # default: silent aliasing (documented) — no error
    ok = df.select(zorder_key([F.col("x"), F.col("y")], bits=8).alias("zk")).collect()
    assert ok[0]["zk"] == _morton_ref([5, 300 % 256], 8)
    # validate=True: loud per-row failure
    with pytest.raises(Exception, match="out of"):
        df.select(
            zorder_key([F.col("x"), F.col("y")], bits=8, validate=True).alias("zk")
        ).collect()


def test_zorder_written_files_have_narrow_stats(spark, tmp_path):
    """End-to-end data-skipping evidence: after zorder_sort + write, the
    parquet FILE-level min/max footer stats (what scanners prune with) are
    narrow on BOTH dimensions — a plain x-sort leaves y unprunable."""
    import glob

    import pyarrow.parquet as pq

    rng = random.Random(3)
    rows = [(rng.randrange(0, 256), rng.randrange(0, 256)) for _ in range(6000)]
    df = spark.createDataFrame(rows, ["x", "y"])

    def file_spans(path):
        spans = []
        for f in glob.glob(f"{path}/*.parquet"):
            md = pq.read_metadata(f)
            lo = {c: None for c in ("x", "y")}
            hi = {c: None for c in ("x", "y")}
            for rg in range(md.num_row_groups):
                g = md.row_group(rg)
                for ci in range(g.num_columns):
                    col = g.column(ci)
                    name = col.path_in_schema
                    if name in lo and col.statistics is not None:
                        mn, mx = col.statistics.min, col.statistics.max
                        lo[name] = mn if lo[name] is None else min(lo[name], mn)
                        hi[name] = mx if hi[name] is None else max(hi[name], mx)
            spans.append((hi["x"] - lo["x"], hi["y"] - lo["y"]))
        return spans

    zpath = str(tmp_path / "z")
    zorder_sort(df, ["x", "y"], bits=8, partitions=12).write.parquet(zpath)
    z_spans = file_spans(zpath)
    assert len(z_spans) >= 8
    avg_zx = sum(s[0] for s in z_spans) / len(z_spans)
    avg_zy = sum(s[1] for s in z_spans) / len(z_spans)

    xpath = str(tmp_path / "xsort")
    df.repartitionByRange(12, "x").sortWithinPartitions("x").write.parquet(xpath)
    x_spans = file_spans(xpath)
    avg_xy = sum(s[1] for s in x_spans) / len(x_spans)

    # z-order: both dims clustered; x-sort: y stats span ~the whole domain
    assert avg_zx < 140 and avg_zy < 140, (avg_zx, avg_zy)
    assert avg_xy > 200, avg_xy
    assert avg_zy < avg_xy / 2


def test_zorder_sql_parity_at_default_bits_with_int_columns(spark):
    """bits=16 drives shift positions past 31 — the SQL mirror must cast to
    BIGINT like the Spark side or DuckDB overflows on 32-bit columns."""
    import duckdb

    from pyspark.sql import functions as F

    from polars_order_book_spark.functions.layout import zorder_key, zorder_key_sql

    rows = [(i, (i * 2654435761) % 60000, (i * 40503) % 60000) for i in range(64)]
    df = spark.createDataFrame(rows, "id long, x int, y int")
    got = {r["id"]: r["zk"] for r in df.select(
        "id", zorder_key([F.col("x"), F.col("y")], bits=16).alias("zk")).collect()}
    con = duckdb.connect()
    con.register("t", df.toPandas())
    sql = zorder_key_sql(["x", "y"], bits=16)
    want = {i: z for i, z in con.execute(f"SELECT id, {sql} FROM t").fetchall()}
    assert got == want
