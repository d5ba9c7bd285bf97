"""Streaming similarity search: a continuous query-vector stream against a
static corpus.

The batch ANN operators (operators.similarity) answer a bounded query set; a
serving/curation loop sees query embeddings ARRIVE continuously (new documents
to place, user queries to route). The Spark-native shape is ``foreachBatch``:
each micro-batch of queries is a bounded DataFrame, so the full batch API —
the banded-LSH candidate join and the window top-k — applies unchanged, and
per-query results are FINAL the moment the query's batch commits (a query id
appears in exactly one micro-batch, so no cross-batch merge is ever needed).
Each batch's results land in their own ``batch_id=N`` directory with
overwrite semantics, so a replayed batch rewrites the same path — delivery
is exactly-once per batch with plain parquet.

At 100 TB corpus scale the candidate join inside each batch is the same
bucketed equi-join as batch LSH — never an all-pairs scan — and the corpus
bucket relation is computed once up front and cached, so each micro-batch
pays only its own query-side hashing + the join. State is ZERO rows: all
cross-batch exactly-once bookkeeping lives in the sink/checkpoint, not the
state store.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from polars_order_book_spark.operators.similarity import cosine_topk_lsh


def topk_stream(
    query_stream: DataFrame,
    corpus: DataFrame,
    out_path: str,
    checkpoint: str,
    *,
    k: int = 10,
    n_planes: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
):
    """Start the streaming top-k query: every micro-batch of query vectors is
    answered with :func:`..operators.similarity.cosine_topk_lsh` against the
    (static, cached) corpus and appended to ``out_path`` as parquet.

    Returns the StreamingQuery; read results with
    ``spark.read.parquet(out_path)`` after (or while) it runs. Batches with
    zero candidate collisions append nothing — recall semantics are exactly
    the batch LSH operator's.
    """
    corpus = corpus.cache()

    def _answer(batch_df: DataFrame, batch_id: int) -> None:
        queries = batch_df.select(
            batch_df[query_id_col].alias("query_id"), batch_df[vec_col].alias(vec_col)
        )
        if not queries.take(1):
            return
        out = cosine_topk_lsh(
            corpus,
            queries,
            k=k,
            n_planes=n_planes,
            vec_col=vec_col,
            id_col=id_col,
        )
        # Replay safety (r8 self-review): a bare append is NOT idempotent —
        # a batch replayed after a post-write/pre-commit crash would append
        # a second copy under fresh part-file names. Writing each batch to
        # its own batch_id-keyed directory with overwrite makes the replay
        # rewrite the SAME path: exactly-once per batch with plain parquet
        # (the Delta/Iceberg txn-log equivalent for this layout).
        out.write.mode("overwrite").parquet(
            os.path.join(out_path, f"batch_id={batch_id}")
        )

    return (
        query_stream.writeStream.foreachBatch(_answer)
        .outputMode("update")
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def read_results(spark: SparkSession, out_path: str) -> DataFrame:
    """Results written so far: (query_id, neighbor_id, rank, cosine).
    Drops the hive-style batch_id partition column the replay-safe layout
    adds — it is sink bookkeeping, not a result column."""
    return spark.read.parquet(out_path).drop("batch_id")
