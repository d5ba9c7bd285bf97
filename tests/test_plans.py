"""Physical-plan quality gates: the properties the 100 TB design relies on.

Each assertion inspects the executed/physical plan string — the same evidence
`.explain("formatted")` prints. These pin:
* dimension joins broadcast (no shuffle join against region/nation/customer)
* filters and column pruning pushed into the parquet scan
* map-side partial aggregation before the shuffle
* no CartesianProduct anywhere (broadcast nested loop is allowed only for
  the deliberate bounded cross joins in ANN / grid assembly)
* the relational book's running aggregate shuffles on the seq-bucket key
  (parallelism not capped by the price domain)
"""

import os

import pytest

from pyspark.sql import functions as F

from polars_order_book_spark import top_n_levels_relational
from polars_order_book_spark.plans import book_streams as bs
from polars_order_book_spark.plans import queries as hq
from polars_order_book_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.001"

needs_testdata = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason="driver testdata not present"
)


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@needs_testdata
def test_q3_broadcasts_customer_dim(spark):
    plan = plan_of(hq.q3_top_revenue_orders(spark, SF_DIR))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


@needs_testdata
def test_q5_broadcasts_all_dims_no_cartesian(spark):
    plan = plan_of(hq.q5_nation_revenue(spark, SF_DIR))
    assert plan.count("BroadcastHashJoin") >= 2  # nation+region (+dims side)
    assert "CartesianProduct" not in plan


@needs_testdata
def test_q1_filter_pushed_to_parquet_scan(spark):
    plan = plan_of(hq.q1_pricing_summary(spark, SF_DIR))
    # partial agg before the shuffle, final after
    assert "partial_sum" in plan or "HashAggregate" in plan
    assert plan.count("HashAggregate") >= 2


@needs_testdata
def test_part_projection_prunes_columns(spark):
    plan = plan_of(hq.part_categorize(spark, SF_DIR))
    # ReadSchema should carry only the 5 referenced columns, not the table
    read = [l for l in plan.splitlines() if "ReadSchema" in l]
    assert read, plan
    schema_line = read[0]
    assert "p_partkey" in schema_line and "p_size" in schema_line
    assert "p_comment" not in schema_line  # untouched column pruned


@needs_testdata
def test_filter_pushdown_reaches_scan(spark):
    df = load_table(spark, SF_DIR, "part").where(F.col("p_size") > 40).select("p_partkey")
    plan = plan_of(df)
    assert "PushedFilters: [IsNotNull(p_size), GreaterThan(p_size,40)" in plan, plan


@needs_testdata
def test_relational_book_shuffles_on_seq_bucket(spark):
    stream = bs.mutations_stream(load_table(spark, SF_DIR, "events"))
    plan = plan_of(top_n_levels_relational(stream, n=2, variant="mutations"))
    assert "__bkt" in plan  # segmented-scan partition key present
    assert "hashpartitioning(__bkt" in plan


@needs_testdata
def test_whole_stage_codegen_covers_text_ops(spark):
    from polars_order_book_spark.operators import text

    plan = plan_of(text.quality_features(load_table(spark, SF_DIR, "documents")))
    # "*(n)" prefixes mark WholeStageCodegen stages in the plan string
    assert "*(1)" in plan
    assert "BatchEvalPython" not in plan  # no row-at-a-time Python in the path
