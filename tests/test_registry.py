"""Driver-contract guard: every queries() entry must analyze cleanly and have
a matching oracle (or be knowingly oracle-less), without running the driver.

Catalyst analysis (df.columns) catches missing columns, bad casts, and typos
per query at sf0.001 cost — cheap insurance that a refactor can't ship a
registry entry that only fails inside the driver's harness.
"""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as E

SF_DIR = "/root/testdata/sf0.001"

needs_testdata = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason="driver testdata not present"
)

QUERIES = sorted(E.queries().items())


@needs_testdata
def test_every_query_has_an_oracle(spark):
    missing = set(E.queries()) - set(E.oracle_sql())
    assert not missing, f"queries without oracle SQL: {sorted(missing)}"
    dangling = set(E.oracle_sql()) - set(E.queries())
    assert not dangling, f"oracles without queries: {sorted(dangling)}"


@needs_testdata
@pytest.mark.parametrize("name,fn", QUERIES, ids=[n for n, _ in QUERIES])
def test_query_analyzes(spark, name, fn):
    if name.startswith("ob_stream"):
        pytest.skip("streaming query executes on construction; covered by driver + streaming tests")
    df = fn(spark, SF_DIR)
    assert df.columns, name


# Entries allowed past the driver's 50-entry correctness cap. Criterion:
# at least one green driver CORRECTNESS row (most have two, r2+r3; three —
# dedup_components, documents_hash_sample, events_user_distinct_approx —
# are r3-green only) PLUS full local oracle + pytest coverage. Everything
# else MUST sit inside the first 50 dict entries or it gets no driver
# signal (r3 verdict item 1).
DEMOTED_TAIL = {
    # displaced by the six r5 head additions; each has ≥2 green driver rows
    # (r2/r3) plus local oracle + pytest coverage
    "text_docfreq_score",
    "text_redact_pii",
    "ann_cosine_topk",
    "ann_cosine_topk_ivf",
    "dedup_embedding",
    "text_quality",
    "dedup_ngram_jaccard",
    "documents_budget_pack",
    "documents_domain_mix",
    "ob_chunked_mutations_top2",
    "ob_conversion_top2",
    "text_fingerprint",
    "text_lang_id",
    "ann_cosine_topk_lsh",
    "dedup_components",
    "documents_hash_sample",
    "dedup_simhash",
    "events_user_distinct_approx",
    "ob_mutations_top2",
    "ob_modify_top2",
    "ob_keyed_mutations_top2",
    "q5_nation_revenue",
    "ob_relational_updates_top3",
    "ob_relational_modify_top2",
    "ob_relational_keyed_mutations_top2",
    "q3_top_revenue_orders",
    "events_hourly",
    "topk_orders_per_customer",
    "customers_without_orders",
    "part_categorize",
    "events_user_running_total",
    "events_rollup",
    "events_value_quantiles",
    "dedup_components_star",
    "documents_deduped",
    "ann_cosine_topk_blas",
    "text_winnow_fingerprints",
}


def test_priority_queries_within_driver_cap():
    names = list(E.queries())
    first50 = set(names[:50])
    needs_signal = [n for n in names if n not in DEMOTED_TAIL]
    missed = [n for n in needs_signal if n not in first50]
    assert not missed, (
        f"registry entries needing driver signal fell past the 50-entry cap: "
        f"{missed} — demote a double-green variant instead"
    )


@needs_testdata
def test_entry_contract(spark):
    df = E.entry(spark)
    assert len(df.columns) >= 13
    assert df.count() > 0
