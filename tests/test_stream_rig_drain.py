"""Memory-sink streaming rigs must not leak session state (r10 change 8).

A memory-sink table lives on the driver heap until the session stops, so a
260-query oracle gate or full-registry bench quietly accumulates every
rig's full output in the JVM that executes every later query. The rigs now
drain through ``_drain_memory_sink`` (eager localCheckpoint → dropTempView
→ checkpoint-dir rmtree): results must be identical AND the catalog must
stay clean afterwards.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = "/root/testdata/sf0.001"


def _temp_tables(spark):
    return [t.name for t in spark.catalog.listTables() if t.isTemporary]


def test_memory_sink_rig_leaves_no_temp_tables(spark):
    import __spark_entry__ as E

    qs = E.queries()
    before = set(_temp_tables(spark))
    out = qs["events_user_profile_stream"](spark, SF_DIR)
    rows = out.collect()
    assert len(rows) > 0
    # schema survives the drain (eager localCheckpoint preserves it)
    assert [c for c in out.columns] == [
        "user_id", "n_events", "value_sum_micros", "last_us",
    ]
    assert set(_temp_tables(spark)) == before, "rig leaked its memory-sink table"


def test_drained_rig_matches_batch_twin(spark):
    """The drained streaming profile equals the batch aggregation it
    mirrors — the drain must not change WHAT the query computes."""
    import __spark_entry__ as E
    from pyspark.sql import functions as F

    from polars_order_book_spark.sources.tables import load_table

    qs = E.queries()
    got = {
        r["user_id"]: (r["n_events"], r["value_sum_micros"], r["last_us"])
        for r in qs["events_user_profile_stream"](spark, SF_DIR).collect()
    }
    ev = load_table(spark, SF_DIR, "events")
    want = {
        r["user_id"]: (r["n_events"], r["value_sum_micros"], r["last_us"])
        for r in ev.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(
                F.floor(F.col("value") * 1000000 + F.lit(0.5)).cast("bigint")
            ).alias("value_sum_micros"),
            F.max(F.unix_micros("ts")).alias("last_us"),
        )
        .collect()
    }
    assert got == want
