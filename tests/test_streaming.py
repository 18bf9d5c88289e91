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


def test_windowed_mention_rates_matches_batch(spark, tmp_path):
    """Watermarked windowed agg (update mode): streamed per-window counts
    equal the batch groupBy over the same events."""
    import datetime as dt

    from pyspark.sql import functions as F

    from robokop_build_spark.streaming.incremental import windowed_mention_rates

    base = dt.datetime(2026, 1, 1, 0, 0, 0)
    rows = [
        (f"d{i}", "disease" if i % 2 else "gene", base + dt.timedelta(minutes=7 * i))
        for i in range(40)
    ]
    batch_df = spark.createDataFrame(rows, ["doc_id", "node_type", "event_time"])
    src = str(tmp_path / "events_in")
    batch_df.write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema(batch_df.schema).parquet(src)
    q = (
        windowed_mention_rates(stream)
        .writeStream.format("memory")
        .queryName("rates")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r["window_start"], r["node_type"]): r["n_mentions"]
        for r in spark.sql("SELECT * FROM rates").collect()
    }
    want = {
        (r["window"]["start"], r["node_type"]): r["n"]
        for r in batch_df.groupBy(
            F.window("event_time", "10 minutes"), "node_type"
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .select("window", "node_type", "n")
        .collect()
    }
    assert got == want and got


def test_dedup_stream_drops_replays(spark, tmp_path):
    """dropDuplicatesWithinWatermark: replayed content within the horizon is
    dropped across drains; bounded state."""
    import datetime as dt

    from robokop_build_spark.streaming.incremental import dedup_stream_exact

    base = dt.datetime(2026, 1, 1, 0, 0, 0)
    src = str(tmp_path / "dd_in")
    out = str(tmp_path / "dd_out")
    ckpt = str(tmp_path / "dd_ckpt")
    schema_rows = [
        ("a", "same text", base),
        ("b", "same text", base + dt.timedelta(minutes=1)),  # replay
        ("c", "other text", base + dt.timedelta(minutes=2)),
    ]
    df = spark.createDataFrame(schema_rows, ["doc_id", "text", "event_time"])
    df.write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema(df.schema).parquet(src)
    q = (
        dedup_stream_exact(stream)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    kept = spark.read.parquet(out)
    hashes = [r["content_hash"] for r in kept.collect()]
    assert len(hashes) == 2 and len(set(hashes)) == 2  # one per distinct text


def test_streaming_lsh_candidates_stateful_cross_batch(spark, tmp_path):
    """The applyInPandasWithState LSH detector must (a) emit each candidate
    pair exactly when its second member arrives, (b) carry per-bucket state
    ACROSS availableNow drains via the checkpoint, and (c) reproduce the
    batch self-join's candidate set (as unordered pairs)."""
    from robokop_build_spark.operators.dedup import minhash_lsh_pairs
    from robokop_build_spark.streaming.incremental import streaming_lsh_candidates

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet").cache()
    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ck")
    os.makedirs(in_dir)

    half = docs.filter("doc_id < 250")
    rest = docs.filter("doc_id >= 250")

    def drop(df, tag):
        d = str(tmp_path / f"chunk_{tag}")
        df.write.mode("overwrite").parquet(d)
        for f in os.listdir(d):
            if f.endswith(".parquet"):
                shutil.copy(os.path.join(d, f), os.path.join(in_dir, f"{tag}_{f}"))

    def drain():
        stream = spark.readStream.schema(docs.schema).parquet(in_dir)
        out = streaming_lsh_candidates(stream, num_hashes=16, bands=8)
        q = (
            out.writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    drop(half, "a")
    drain()
    got1 = {
        frozenset((r["id_a"], r["id_b"]))
        for r in spark.read.parquet(out_dir).collect()
    }
    want1 = {
        frozenset((str(r["id_a"]), str(r["id_b"])))
        for r in minhash_lsh_pairs(half, num_hashes=16, bands=8).collect()
    }
    assert got1 == want1 and got1

    drop(rest, "b")
    drain()
    got2 = {
        frozenset((r["id_a"], r["id_b"]))
        for r in spark.read.parquet(out_dir).collect()
    }
    want2 = {
        frozenset((str(r["id_a"]), str(r["id_b"])))
        for r in minhash_lsh_pairs(docs, num_hashes=16, bands=8).collect()
    }
    assert got2 == want2
    # cross-batch pairs exist: state genuinely survived the first drain
    cross = {
        p for p in got2
        if len({int(x) < 250 for x in p}) == 2
    }
    assert cross


def test_streaming_lsh_trim_sentinel(spark, tmp_path):
    """max_bucket_ids trimming is observable: a bucket whose state hits the
    cap emits a TRIM_SENTINEL row (a trimmed bucket silently misses /
    re-emits pairs, so exactness-gated callers must be able to detect it);
    with max_bucket_ids=None no sentinel can appear."""
    from robokop_build_spark.streaming.incremental import (
        TRIM_SENTINEL,
        streaming_lsh_candidates,
    )

    # 6 identical docs: every (band, bkey) bucket collects all 6 ids
    rows = [(str(i), "alpha beta gamma delta epsilon zeta eta") for i in range(6)]
    docs = spark.createDataFrame(rows, "doc_id string, text string")
    in_dir = str(tmp_path / "in")
    docs.write.mode("overwrite").parquet(in_dir)

    def drain(tag, cap):
        stream = spark.readStream.schema(docs.schema).parquet(in_dir)
        q = (
            streaming_lsh_candidates(
                stream, num_hashes=16, bands=8, max_bucket_ids=cap
            )
            .writeStream.format("parquet")
            .option("path", str(tmp_path / f"out_{tag}"))
            .option("checkpointLocation", str(tmp_path / f"ck_{tag}"))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return spark.read.schema("id_a string, id_b string").parquet(
            str(tmp_path / f"out_{tag}")
        )

    capped = drain("capped", 3)
    sentinels = capped.filter(capped.id_a == TRIM_SENTINEL).collect()
    assert sentinels, "cap was hit but no sentinel emitted"
    assert all("|" in r["id_b"] for r in sentinels)  # names the bucket

    uncapped = drain("uncapped", None)
    assert uncapped.filter(uncapped.id_a == TRIM_SENTINEL).count() == 0
    # unbounded state ⇒ exact pair multiset: C(6,2)=15 distinct pairs
    assert (
        uncapped.select("id_a", "id_b").distinct().count() == 15
    )


def test_streaming_sessions_merge_across_batches(spark, tmp_path):
    """A session whose events arrive in DIFFERENT micro-batches must come
    out as ONE session (the state-store merge), and the rollup must equal
    the batch sessionize on the same data."""
    import datetime as dt

    from pyspark.sql import functions as F

    from robokop_build_spark.operators.events import sessionize
    from robokop_build_spark.streaming.incremental import streaming_sessions

    def t(minute):
        return dt.datetime(2024, 1, 1) + dt.timedelta(minutes=minute)

    # file 0: first half of a session + a lone old event; file 1 (a later
    # micro-batch): the second half of the same session, within the gap
    part0 = [(1, 7, t(0)), (2, 7, t(10))]
    part1 = [(3, 7, t(25)), (4, 7, t(70)), (5, 8, t(0))]
    schema = "event_id long, user_id long, ts timestamp"
    in_dir = str(tmp_path / "in")
    spark.createDataFrame(part0, schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(in_dir)
    spark.createDataFrame(part1, schema).coalesce(1).write.mode(
        "append"
    ).parquet(in_dir)

    out_dir, ck = str(tmp_path / "out"), str(tmp_path / "ck")
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )
    q = (
        streaming_sessions(stream)
        .writeStream.outputMode("complete")
        .foreachBatch(
            lambda df, _b: df.write.mode("overwrite").parquet(out_dir)
        )
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert len(q.recentProgress) >= 2, "drain must span multiple micro-batches"

    got = sorted(
        (r["user_id"], r["n_events"], r["start_us"], r["end_us"])
        for r in spark.read.parquet(out_dir).collect()
    )
    batch = sorted(
        (r["user_id"], r["n_events"], r["start_us"], r["end_us"])
        for r in sessionize(
            spark.createDataFrame(part0 + part1, schema)
        ).collect()
    )
    assert got == batch
    # events 1,2 (batch 0) and 3 (batch 1) merged into one 3-event session
    assert (7, 3) in {(u, n) for u, n, _, _ in got}
