"""inverted_index / oov_rate (operators/text.py): cap semantics, posting
order determinism, vocab tie-breaks — the parts the sf0.01 oracle exercises
only incidentally."""

import pytest

from pyspark.sql import functions as F

from polars_order_book_spark.operators.text import inverted_index, oov_rate


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "a a b c"),
        (2, "a b b"),
        (3, "a c"),
        (4, "z"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestInvertedIndex:
    def test_exact_counts_and_postings(self, spark, docs):
        got = {r["token"]: r for r in inverted_index(docs, max_postings=8).collect()}
        assert got["a"]["doc_freq"] == 3 and got["a"]["total_tf"] == 4
        assert got["a"]["postings_head"] == "1,2,3"
        assert got["b"]["doc_freq"] == 2 and got["b"]["total_tf"] == 3
        assert got["b"]["postings_head"] == "1,2"
        assert got["z"]["postings_head"] == "4"

    def test_cap_bounds_postings(self, spark):
        many = spark.createDataFrame(
            [(i, "tok") for i in range(30)], "doc_id long, text string"
        )
        row = inverted_index(many, max_postings=5).collect()[0]
        assert row["doc_freq"] == 30
        # capped AND sorted: the 5 smallest ids despite collect_list order
        assert row["postings_head"] == "0,1,2,3,4"


class TestOovRate:
    def test_small_vocab_marks_rest_oov(self, spark, docs):
        # vocab_size=1 -> top token by df is 'a' (df 3); everything else OOV
        got = {r["doc_id"]: r for r in oov_rate(docs, vocab_size=1).collect()}
        assert got[1]["n_tokens"] == 4 and got[1]["n_oov"] == 2
        assert got[1]["oov_rate"] == pytest.approx(0.5)
        assert got[4]["n_oov"] == 1 and got[4]["oov_rate"] == 1.0

    def test_tie_break_is_token_asc(self, spark):
        # 'b' and 'c' tie on df; vocab_size=2 must take 'a' (df 2) then 'b'
        rows = [(1, "a b"), (2, "a c")]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {r["doc_id"]: r for r in oov_rate(df, vocab_size=2).collect()}
        assert got[1]["n_oov"] == 0  # a,b both in vocab
        assert got[2]["n_oov"] == 1  # c lost the tie to b

    def test_rate_bounds(self, spark, docs):
        for r in oov_rate(docs, vocab_size=2).collect():
            assert 0.0 <= r["oov_rate"] <= 1.0
            assert r["n_oov"] <= r["n_tokens"]
