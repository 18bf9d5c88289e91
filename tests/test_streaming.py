"""Incremental ingest: two file drops, two availableNow drains, exactly-once
per file (offsets in the stream checkpoint)."""

import os
import shutil

from robokop_build_spark.sources.readers import read_fixture
from robokop_build_spark.streaming.incremental import (
    incremental_mentions,
    read_document_stream,
    run_available_now,
)


def test_incremental_exactly_once(spark, fixture_dir, tmp_path):
    docs = read_fixture(spark, fixture_dir, "documents").limit(200).cache()
    lex = read_fixture(spark, fixture_dir, "lexicon")
    emb = read_fixture(spark, fixture_dir, "entity_embeddings")

    in_dir = str(tmp_path / "incoming")
    out_dir = str(tmp_path / "mentions_out")
    ckpt = str(tmp_path / "stream_ckpt")
    os.makedirs(in_dir)

    first, second = docs.limit(120), docs.subtract(docs.limit(120))
    first.write.mode("overwrite").parquet(str(tmp_path / "chunk1"))
    for f in os.listdir(str(tmp_path / "chunk1")):
        if f.endswith(".parquet"):
            shutil.copy(str(tmp_path / "chunk1" / f), os.path.join(in_dir, "a_" + f))

    stream = incremental_mentions(read_document_stream(spark, in_dir), lex, emb)
    run_available_now(stream, out_dir, ckpt)
    n1 = spark.read.parquet(out_dir).count()
    assert n1 > 0

    # second drop: only the new files are processed on the next drain
    second.write.mode("overwrite").parquet(str(tmp_path / "chunk2"))
    for f in os.listdir(str(tmp_path / "chunk2")):
        if f.endswith(".parquet"):
            shutil.copy(str(tmp_path / "chunk2" / f), os.path.join(in_dir, "b_" + f))
    stream2 = incremental_mentions(read_document_stream(spark, in_dir), lex, emb)
    run_available_now(stream2, out_dir, ckpt)
    n2 = spark.read.parquet(out_dir).count()
    assert n2 > n1

    # batch-equivalence: streamed mentions == batch mentions over all docs
    from robokop_build_spark.operators.extract import detect_mentions, explode_spans

    batch = detect_mentions(explode_spans(docs), lex, emb)
    streamed = spark.read.parquet(out_dir)
    assert streamed.count() == batch.count()
    key = ["doc_id", "span_pos", "mention_start", "curie"]
    assert streamed.select(*key).subtract(batch.select(*key)).count() == 0

    # third drain with no new files: nothing reprocessed
    stream3 = incremental_mentions(read_document_stream(spark, in_dir), lex, emb)
    run_available_now(stream3, out_dir, ckpt)
    assert spark.read.parquet(out_dir).count() == n2
