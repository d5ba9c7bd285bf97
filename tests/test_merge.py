"""merge_upsert contracts: update/delete/insert semantics, last-writer-wins,
schema validation, and the broadcast-delta plan shape."""

import pytest

from pyspark.sql import functions as F
from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from polars_order_book_spark.operators.merge import latest_changes, merge_upsert

BASE_SCHEMA = StructType([
    StructField("id", LongType(), False),
    StructField("val", StringType(), True),
    StructField("score", DoubleType(), True),
])

CHANGE_SCHEMA = StructType(
    BASE_SCHEMA.fields
    + [StructField("version", LongType(), False), StructField("tombstone", BooleanType(), True)]
)


def _base(spark):
    return spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", 2.0), (3, "c", 3.0), (4, "d", 4.0)], BASE_SCHEMA
    )


def test_merge_update_delete_insert_and_lww(spark):
    changes = spark.createDataFrame(
        [
            (2, "b-new-v1", 2.1, 1, False),   # loses to v2
            (2, "b-new-v2", 2.2, 2, False),   # wins
            (3, None, None, 1, True),         # delete
            (9, "ins", 9.0, 1, False),        # insert
        ],
        CHANGE_SCHEMA,
    )
    out = merge_upsert(_base(spark), changes, ["id"], "version", "tombstone")
    rows = {r["id"]: r.asDict() for r in out.collect()}
    assert set(rows) == {1, 2, 4, 9}
    assert rows[1]["val"] == "a"            # untouched passes through
    assert rows[2]["val"] == "b-new-v2"     # last writer wins
    assert rows[9]["val"] == "ins"          # inserted
    assert sorted(out.columns) == sorted(BASE_SCHEMA.fieldNames())  # no meta cols


def test_merge_tombstoned_insert_is_dropped(spark):
    changes = spark.createDataFrame([(9, "x", 9.0, 1, True)], CHANGE_SCHEMA)
    out = merge_upsert(_base(spark), changes, ["id"], "version", "tombstone")
    assert 9 not in {r["id"] for r in out.collect()}


def test_merge_rejects_schema_drift(spark):
    bad_extra = spark.createDataFrame(
        [(1, "a", 1.0, 1, False, "oops")],
        StructType(CHANGE_SCHEMA.fields + [StructField("extra", StringType())]),
    )
    with pytest.raises(ValueError, match="not in base schema"):
        merge_upsert(_base(spark), bad_extra, ["id"], "version", "tombstone")
    bad_missing = spark.createDataFrame(
        [(1, 1, False)],
        StructType([
            StructField("id", LongType()),
            StructField("version", LongType()),
            StructField("tombstone", BooleanType()),
        ]),
    )
    with pytest.raises(ValueError, match="missing base columns"):
        merge_upsert(_base(spark), bad_missing, ["id"], "version", "tombstone")


def test_latest_changes_deterministic_tiebreak(spark):
    # equal versions: the column-order tiebreak picks one deterministic row,
    # independent of input partitioning
    changes = spark.createDataFrame(
        [(1, "zz", 0.0, 1, False), (1, "aa", 0.0, 1, False)], CHANGE_SCHEMA
    )
    one = latest_changes(changes, ["id"], "version").collect()
    other = latest_changes(changes.repartition(7), ["id"], "version").collect()
    assert len(one) == len(other) == 1
    assert one[0]["val"] == other[0]["val"]


def test_merge_broadcasts_change_keys(spark):
    changes = spark.createDataFrame([(2, "u", 2.5, 1, False)], CHANGE_SCHEMA)
    out = merge_upsert(_base(spark), changes, ["id"], "version", "tombstone")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan, plan


def test_apply_changes_stream_folds_batches_and_versions(spark, tmp_path):
    """Two change micro-batches fold into the maintained table; each batch
    leaves a version directory and the marker points at the last one."""
    import os

    from polars_order_book_spark.streaming.merge_stream import (
        apply_changes_stream,
        init_table,
        read_current,
    )

    tbl = str(tmp_path / "table")
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    init_table(_base(spark), tbl)

    batches = [
        [(2, "b2", 2.2, 1, False), (9, "ins", 9.0, 1, False)],  # update + insert
        [(9, "ins-v2", 9.1, 2, False), (3, None, None, 1, True)],  # re-update + delete
    ]
    for i, rows in enumerate(batches):
        pdir = tmp_path / f"part_{i}"
        spark.createDataFrame(rows, CHANGE_SCHEMA).coalesce(1).write.parquet(str(pdir))
        pq = [f for f in os.listdir(pdir) if f.endswith(".parquet")][0]
        os.rename(str(pdir / pq), str(in_dir / f"{i:03d}.parquet"))

    stream = (
        spark.readStream.schema(CHANGE_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(in_dir))
    )
    q = apply_changes_stream(stream, tbl, ["id"], checkpoint=str(tmp_path / "ckpt"))
    assert q.awaitTermination(120)

    rows = {r["id"]: r.asDict() for r in read_current(spark, tbl).collect()}
    assert set(rows) == {1, 2, 4, 9}
    assert rows[2]["val"] == "b2"
    assert rows[9]["val"] == "ins-v2"  # batch-1 update of a batch-0 insert
    assert os.path.exists(os.path.join(tbl, "_v0"))
    assert os.path.exists(os.path.join(tbl, "_v1"))
    with open(os.path.join(tbl, "_CURRENT"), encoding="utf-8") as f:
        assert f.read().strip() == "_v1"
