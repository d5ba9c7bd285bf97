"""Streaming quality-classifier serving: score an arriving document stream
with an offline-trained model.

The production split of operators/classifier.py: TRAIN is a batch job over
yesterday's corpus (logreg_train — bounded driver iterations); SERVE is this
stream — every micro-batch of newly crawled documents is scored with the
frozen integer-micros weights and appended to the curation ledger. Scoring
is a pure per-document function (hash features → margin → sigmoid), so each
doc's score is FINAL in its own batch: no cross-batch state, no watermark —
all exactly-once bookkeeping lives in the sink/checkpoint, exactly like
similarity_stream. The union of all batch outputs equals the single-shot
batch scoring of the same corpus, which is what the driver oracle checks.

At scale each micro-batch pays one broadcast join against the (dim+1)-row
weight relation and two batch-local doc-keyed shuffles — the batch
operator's own shape, just bounded to the batch.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def score_stream(
    doc_stream: DataFrame,
    weights_micro: "list[int]",
    out_path: str,
    checkpoint: str,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.5,
    feature: str = "presence",
):
    """Start the stream: every micro-batch is scored with
    operators.classifier.logreg_score under the frozen ``weights_micro``
    and appended to ``out_path`` as parquet. Returns the StreamingQuery."""
    from polars_order_book_spark.operators.classifier import logreg_score

    def _score(batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.take(1):
            return
        out = logreg_score(
            batch_df,
            weights_micro,
            text_col=text_col,
            id_col=id_col,
            threshold=threshold,
            feature=feature,
        )
        # batch_id-keyed overwrite: a replayed batch rewrites the SAME
        # directory instead of appending a duplicate copy (r8 self-review;
        # same replay-safe layout as similarity_stream)
        out.write.mode("overwrite").parquet(
            os.path.join(out_path, f"batch_id={batch_id}")
        )

    return (
        doc_stream.writeStream.foreachBatch(_score)
        .outputMode("update")
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def read_results(spark: SparkSession, out_path: str) -> DataFrame:
    """Scores written so far: (doc_id, score_micro, pred). Drops the
    batch_id partition column of the replay-safe layout."""
    return spark.read.parquet(out_path).drop("batch_id")
