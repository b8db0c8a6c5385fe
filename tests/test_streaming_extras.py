"""Streaming dedup, session windows, sliding windows, late-data drop,
metrics listener — the rest of the north rule's streaming surface."""

from __future__ import annotations

from datetime import datetime, timedelta

from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from dataflow_geobeam_spark.streaming import extras, pipeline
from dataflow_geobeam_spark.streaming.metrics import EpochMetricsListener

T0 = datetime(2026, 1, 1)

EVENT_SCHEMA = StructType(
    [
        StructField("clip_id", StringType()),
        StructField("bucket", StringType()),
        StructField("ts", TimestampType()),
        StructField("dur_ms", IntegerType()),
    ]
)


def _write_stream_files(spark, tmp_path, batches):
    """Write one parquet file per micro-batch (list of row-tuples).

    FileStreamSource orders files by (modificationTime, path); stamp each
    batch's files with increasing mtimes so arrival order is deterministic.
    """
    import glob
    import os
    import time

    d = str(tmp_path / "in")
    base = time.time() - 3600
    for i, rows in enumerate(batches):
        spark.createDataFrame(rows, EVENT_SCHEMA).coalesce(1).write.mode(
            "append" if i else "overwrite"
        ).parquet(d)
        for f in glob.glob(os.path.join(d, "*.parquet")):
            st = os.stat(f)
            if st.st_mtime >= base + 3000:  # only newly-written files
                os.utime(f, (base + i * 10, base + i * 10))
    return d


def _run_available_now(df, tmp_path, name):
    out = str(tmp_path / f"out_{name}")
    q = (
        df.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / f"ckpt_{name}"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return out


def test_streaming_dedup_within_watermark(spark, tmp_path):
    rows = [
        ("c1", "aa", T0, 100),
        ("c1", "aa", T0 + timedelta(seconds=5), 100),  # dup within watermark
        ("c2", "aa", T0 + timedelta(seconds=10), 200),
    ]
    d = _write_stream_files(spark, tmp_path, [rows])
    stream = (
        spark.readStream.schema(EVENT_SCHEMA).option("maxFilesPerTrigger", "1").parquet(d)
    )
    out = _run_available_now(extras.dedup_clips_stream(stream), tmp_path, "dedup")
    got = sorted(r.clip_id for r in spark.read.parquet(out).collect())
    assert got == ["c1", "c2"]


def test_streaming_session_windows_emit_after_watermark(spark, tmp_path):
    batch1 = [
        ("c1", "aa", T0, 100),
        ("c2", "aa", T0 + timedelta(seconds=10), 100),  # same session (gap 30s)
        ("c3", "bb", T0, 100),
    ]
    # batch2 advances the watermark far past session ends -> sessions emit
    batch2 = [("cx", "zz", T0 + timedelta(minutes=30), 100)]
    d = _write_stream_files(spark, tmp_path, [batch1, batch2])
    stream = (
        spark.readStream.schema(EVENT_SCHEMA).option("maxFilesPerTrigger", "1").parquet(d)
    )
    agg = extras.session_agg_stream(stream.withWatermark("ts", "1 minute"))
    out = _run_available_now(agg, tmp_path, "session")
    got = {(r.bucket, r.n_clips, r.sum_dur_ms) for r in spark.read.parquet(out).collect()}
    assert ("aa", 2, 200) in got and ("bb", 1, 100) in got


def test_streaming_late_data_never_reemits_finalized_window(spark, tmp_path):
    """Spark's hard watermark guarantee in append mode is no RE-emission:
    once a window is finalized+emitted, a late row for it must not produce a
    second output row (drop of not-yet-emitted late data is best-effort and
    intentionally not asserted)."""
    batch1 = [("c1", "aa", T0, 100)]
    batch2 = [("c2", "aa", T0 + timedelta(minutes=10), 100)]  # advances wm, emits W(T0)
    batch3 = [("late", "aa", T0 + timedelta(seconds=1), 100)]  # late into emitted W(T0)
    batch4 = [("cx", "zz", T0 + timedelta(minutes=40), 100)]  # flush
    d = _write_stream_files(spark, tmp_path, [batch1, batch2, batch3, batch4])
    stream = (
        spark.readStream.schema(EVENT_SCHEMA).option("maxFilesPerTrigger", "1").parquet(d)
    )
    agg = (
        stream.withWatermark("ts", "1 minute")
        .groupBy(F.window("ts", "10 seconds"), "bucket")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("window.start").alias("ws"), "bucket", "n")
    )
    out = _run_available_now(agg, tmp_path, "late")
    rows = spark.read.parquet(out).collect()
    w_t0 = [r for r in rows if r.ws == T0 and r.bucket == "aa"]
    # observed Spark 4.1 semantics: the watermark gates EMISSION, not
    # ingestion — a late row arriving in the same batch the window
    # finalizes still merges (n may be 2), but the window is emitted
    # exactly once; no key ever re-emits
    assert len(w_t0) == 1 and w_t0[0].n in (1, 2)
    keys = [(r.ws, r.bucket) for r in rows]
    assert len(keys) == len(set(keys))


def test_sliding_stream_counts(spark, tmp_path):
    batch1 = [("c1", "aa", T0 + timedelta(seconds=7), 100)]
    batch2 = [("cx", "zz", T0 + timedelta(minutes=30), 100)]
    d = _write_stream_files(spark, tmp_path, [batch1, batch2])
    stream = (
        spark.readStream.schema(EVENT_SCHEMA).option("maxFilesPerTrigger", "1").parquet(d)
    )
    agg = extras.sliding_agg_stream(stream.withWatermark("ts", "1 minute"))
    out = _run_available_now(agg, tmp_path, "sliding")
    got = sorted(
        r.window_start.second for r in spark.read.parquet(out).where("bucket='aa'").collect()
    )
    assert got == [0, 5]  # row at t=7 in [0,10) and [5,15)


def test_metrics_listener_collects_epochs(spark, fixture_dir, tmp_path):
    listener = EpochMetricsListener()
    spark.streams.addListener(listener)
    try:
        query, sink = pipeline.run_streaming_window_agg(
            spark,
            fixture_dir,
            str(tmp_path / "out"),
            str(tmp_path / "ckpt"),
            n_files=4,
        )
        query.awaitTermination(300)
        # listener events are delivered asynchronously; poll briefly
        import time

        for _ in range(40):
            if len(listener.progress) >= len(sink.committed_manifests()):
                break
            time.sleep(0.25)
        assert len(listener.progress) >= len(sink.committed_manifests()) > 0
        s = listener.summary()
        assert s["input_rows"] > 0 and s["epochs"] > 0
        # lineage columns trace rows to their epoch + task partition
        lineage = sink.read(spark).select("_epoch_id", "_source_partition").distinct()
        assert lineage.count() >= 1
    finally:
        spark.streams.removeListener(listener)


def test_stream_static_enrichment_join(spark, fixture_dir, tmp_path):
    """Stream-static broadcast join: every streamed clip row is enriched
    with its codec's static attributes; rows with unknown codecs keep NULL
    attributes (left join)."""
    import os
    import time

    from dataflow_geobeam_spark.sources.clips import CLIPS_SCHEMA
    from dataflow_geobeam_spark.streaming.extras import enrich_with_static_dim

    dim = spark.createDataFrame(
        [("wav", False), ("flac", False), ("ogg", True), ("mp3", True)],
        "codec string, lossy boolean",
    )
    src = str(tmp_path / "src")
    clips = spark.read.parquet(os.path.join(fixture_dir, "clips.parquet")).limit(300)
    n_in = clips.count()
    clips.write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(CLIPS_SCHEMA).parquet(src)
    out = enrich_with_static_dim(stream.select("clip_id", "codec", "ts"), dim)
    name = f"enrich_{int(time.time() * 1000)}"
    q = (
        out.writeStream.format("memory").queryName(name).outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(300)
    rows = spark.sql(f"SELECT * FROM {name}").collect()
    assert len(rows) == n_in  # left join keeps every stream row
    by_codec = {r.codec: r.lossy for r in rows if r.codec in ("wav", "ogg")}
    assert by_codec.get("wav") is False and by_codec.get("ogg") is True
    unknown = [r for r in rows if r.codec == "unknown"]
    assert all(r.lossy is None for r in unknown)


def test_partition_stats_from_lineage(spark, tmp_path):
    """Per-partition committed-row stats reconstruct from lineage columns."""
    from dataflow_geobeam_spark.streaming.metrics import partition_stats
    from dataflow_geobeam_spark.streaming.sink import ExactlyOnceParquetSink

    sink = ExactlyOnceParquetSink(str(tmp_path / "ps"))
    df = spark.range(100).repartition(4).selectExpr("id AS k")
    sink.write_batch(df, 0)
    sink.write_batch(df, 1)
    stats = partition_stats(sink, spark).collect()
    assert sum(r.rows_committed for r in stats) == 200
    assert {r._epoch_id for r in stats} == {0, 1}
    assert len({r._source_partition for r in stats}) >= 2


def test_contamination_stream_vs_eval_equals_batch(spark, tmp_path):
    """The crawl-admission screen: documents streamed as 4 micro-batches
    against a static eval set commit exactly the batch operator's
    contaminated set through the exactly-once sink."""
    import pyarrow.parquet as apq

    from dataflow_geobeam_spark.operators.dedup import contamination
    from dataflow_geobeam_spark.operators.split import assign_split
    from dataflow_geobeam_spark.streaming.extras import contamination_stream_vs_eval
    from dataflow_geobeam_spark.streaming.sink import ExactlyOnceParquetSink

    src = "/root/testdata/sf0.01/documents.parquet"
    docs = spark.read.parquet(src).select("doc_id", "text")
    labeled = assign_split(docs, "doc_id")
    train = labeled.where("split = 'train'").drop("split")
    eval_df = labeled.where("split != 'train'").drop("split").localCheckpoint(eager=True)

    want = {tuple(r) for r in contamination(train, eval_df).collect()}
    assert len(want) > 0

    # stream the train docs as 4 files
    t = apq.read_table(src, columns=["doc_id", "text"])
    stream_dir = tmp_path / "doc_stream"
    stream_dir.mkdir()
    per = (t.num_rows + 3) // 4
    for f in range(4):
        apq.write_table(t.slice(f * per, per), str(stream_dir / f"part-{f:04d}.parquet"))
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", "1")
        .parquet(str(stream_dir))
    )
    # the admission screen filters to train inside the stream projection
    from dataflow_geobeam_spark.operators.split import split_expr
    from pyspark.sql import functions as F

    train_stream = stream.where(split_expr(F.col("doc_id")) == "train")
    sink = ExactlyOnceParquetSink(str(tmp_path / "contam_table"))
    q = contamination_stream_vs_eval(
        train_stream, eval_df, sink, str(tmp_path / "ckpt")
    )
    q.awaitTermination(300)
    got = {
        tuple(r)
        for r in sink.read_latest(spark, ["doc_id"])
        .select("doc_id", "n_overlap")
        .collect()
    }
    assert got == want


def test_pack_greedy_stream_equals_batch(spark, tmp_path):
    """Streaming packing with a per-group running counter in typed state:
    when shard files deliver docs in doc_id order, the chunk assignment
    equals the batch operator exactly — state carries the token counter
    across micro-batches."""
    import pyarrow as pa
    import pyarrow.parquet as apq

    from dataflow_geobeam_spark.functions.text import token_count
    from dataflow_geobeam_spark.operators.packing import pack_greedy
    from dataflow_geobeam_spark.streaming.extras import pack_greedy_stream
    from pyspark.sql import functions as F

    src = "/root/testdata/sf0.01/documents.parquet"
    docs = (
        spark.read.parquet(src)
        .select("doc_id", "source", token_count("text").alias("n_tok"))
        .orderBy("doc_id")
    )
    want = {
        (r["doc_id"], r["source"]): (r["cum_tokens"], r["chunk_id"])
        for r in pack_greedy(docs, "source", "doc_id", "n_tok", 512).collect()
    }

    t = pa.Table.from_pandas(docs.toPandas())
    stream_dir = tmp_path / "pack_stream"
    stream_dir.mkdir()
    per = (t.num_rows + 3) // 4
    for f in range(4):
        apq.write_table(t.slice(f * per, per), str(stream_dir / f"part-{f:04d}.parquet"))
    stream = (
        spark.readStream.schema("doc_id long, source string, n_tok long")
        .option("maxFilesPerTrigger", "1")
        .parquet(str(stream_dir))
    )
    q = (
        pack_greedy_stream(stream, 512)
        .writeStream.format("memory")
        .queryName("pack_stream_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = {
        (r["doc_id"], r["source"]): (r["cum_tokens"], r["chunk_id"])
        for r in spark.sql("select * from pack_stream_test").collect()
    }
    assert got == want and len(want) == 500


def test_pack_greedy_stream_resumes_counter_from_checkpoint(spark, tmp_path):
    """The packing counter SURVIVES a query stop/restart: two availableNow
    runs over the same checkpoint (files added between them) produce the
    same assignment as one batch pass — the state store carries each
    group's cum_tokens across the restart."""
    import pyarrow as pa
    import pyarrow.parquet as apq

    from dataflow_geobeam_spark.functions.text import token_count
    from dataflow_geobeam_spark.operators.packing import pack_greedy
    from dataflow_geobeam_spark.streaming.extras import pack_greedy_stream

    src = "/root/testdata/sf0.01/documents.parquet"
    docs = (
        spark.read.parquet(src)
        .select("doc_id", "source", token_count("text").alias("n_tok"))
        .orderBy("doc_id")
    )
    want = {
        (r["doc_id"], r["source"]): (r["cum_tokens"], r["chunk_id"])
        for r in pack_greedy(docs, "source", "doc_id", "n_tok", 512).collect()
    }

    from dataflow_geobeam_spark.streaming.sink import ExactlyOnceParquetSink

    t = pa.Table.from_pandas(docs.toPandas())
    stream_dir = tmp_path / "pack_stream_resume"
    stream_dir.mkdir()
    ckpt = str(tmp_path / "pack_ckpt")
    sink = ExactlyOnceParquetSink(str(tmp_path / "pack_table"))
    per = (t.num_rows + 3) // 4

    def run_wave(files):
        for f in files:
            apq.write_table(
                t.slice(f * per, per), str(stream_dir / f"part-{f:04d}.parquet")
            )
        stream = (
            spark.readStream.schema("doc_id long, source string, n_tok long")
            .option("maxFilesPerTrigger", "1")
            .parquet(str(stream_dir))
        )
        q = (
            pack_greedy_stream(stream, 512)
            .writeStream.foreachBatch(sink.foreach_batch())
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)

    run_wave([0, 1])  # first half, then the query STOPS
    run_wave([2, 3])  # restart from the same checkpoint
    got = {
        (r["doc_id"], r["source"]): (r["cum_tokens"], r["chunk_id"])
        for r in sink.read(spark)
        .select("doc_id", "source", "cum_tokens", "chunk_id")
        .collect()
    }
    assert got == want and len(want) == 500
