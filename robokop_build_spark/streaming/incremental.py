"""Incremental document ingest via Structured Streaming.

The reference is strictly batch (SURVEY.md §2.9: no streaming anywhere in
the tree), and the KG build itself stays batch with Iceberg-style
checkpoints. This module is the *ingest front door* a production corpus
needs anyway: new document files landing in a directory are incrementally
exploded + mention-detected exactly once (file-source + checkpointLocation),
with Trigger.AvailableNow so a scheduled batch job drains the backlog and
exits — the standard Spark pattern for continuous corpus growth without
reprocessing 10^12 historical docs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..schemas import DOCUMENTS


def read_document_stream(spark: SparkSession, input_dir: str) -> DataFrame:
    """File-source stream over a directory of documents parquet files.
    Schema pinned (streams cannot infer), new files discovered per batch."""
    return (
        spark.readStream.schema(DOCUMENTS)
        .option("maxFilesPerTrigger", 8)
        .parquet(input_dir)
    )


def incremental_mentions(
    stream_docs: DataFrame,
    lexicon: DataFrame,
    entity_embeddings: DataFrame | None = None,
) -> DataFrame:
    """Same extract+link stages as batch (explode_spans + Arrow UDF) applied
    to the stream — transformations are identical DataFrame code."""
    from ..operators.extract import detect_mentions, explode_spans

    return detect_mentions(explode_spans(stream_docs), lexicon, entity_embeddings)


def run_available_now(
    mentions_stream: DataFrame, out_dir: str, checkpoint_dir: str
) -> None:
    """Drain everything currently unprocessed, exactly once, then stop.
    Re-running after new files land processes only the new files (offsets
    tracked in checkpoint_dir)."""
    q = (
        mentions_stream.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
