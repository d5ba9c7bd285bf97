"""One query text, two engines: the ANSI-dialect oracle SQL strings must also
run VERBATIM on spark.sql over registered views and agree with the DataFrame
formulation — SQL-first users get the same engine surface.

(DuckDB-specific functions — epoch/list_*/string_split_regex — keep the text/
dedup oracles out of scope; this covers the relational analytics set.)
"""

import os

import pytest

from polars_order_book_spark.plans import queries as hq
from polars_order_book_spark.sources.tables import register_views

SF_DIR = "/root/testdata/sf0.001"

needs_testdata = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason="driver testdata not present"
)

PARITY = [
    ("q1_pricing_summary", hq.q1_pricing_summary, hq.Q1_SQL),
    ("q3_top_revenue_orders", hq.q3_top_revenue_orders, hq.Q3_SQL),
    ("q5_nation_revenue", hq.q5_nation_revenue, hq.Q5_SQL),
    ("topk_orders_per_customer", hq.topk_orders_per_customer, hq.TOPK_ORDERS_SQL),
    ("customers_without_orders", hq.customers_without_orders, hq.CUSTOMERS_WITHOUT_ORDERS_SQL),
    ("part_categorize", hq.part_categorize, hq.PART_CATEGORIZE_SQL),
    ("q4_priority_count", hq.q4_priority_count, hq.Q4_SQL),
    ("q7_volume_shipping", hq.q7_volume_shipping, hq.Q7_SQL),
    ("q14_promo_revenue", hq.q14_promo_revenue, hq.Q14_SQL),
    ("q19_disjunctive_revenue", hq.q19_disjunctive_revenue, hq.Q19_SQL),
    ("events_cohort_setops", hq.events_cohort_setops, hq.EVENTS_COHORT_SETOPS_SQL),
    ("q13_customer_distribution", hq.q13_customer_distribution, hq.Q13_SQL),
    ("q15_top_supplier", hq.q15_top_supplier, hq.Q15_SQL),
    ("q22_dormant_customers", hq.q22_dormant_customers, hq.Q22_SQL),
    # q18 oracle uses DuckDB epoch_us(); not Spark-dialect portable.
]


def rows_set(df):
    return {tuple(r[c] for c in sorted(df.columns)) for r in df.collect()}


@needs_testdata
@pytest.mark.parametrize("name,fn,sql", PARITY, ids=[p[0] for p in PARITY])
def test_oracle_sql_runs_verbatim_on_spark(spark, name, fn, sql):
    register_views(spark, SF_DIR)
    via_df = fn(spark, SF_DIR)
    via_sql = spark.sql(sql)
    assert sorted(via_df.columns) == sorted(via_sql.columns)
    assert rows_set(via_df) == rows_set(via_sql)
