"""Additional streaming operators: watermarked dedup, session/sliding
streams, late-data accounting.

North-rule items beyond the flagship tumbling job (SURVEY.md §2.4 table):
streaming dedup (the WRITE_TRUNCATE idempotence analog done right), session
windows under watermark, and explicit late-data drop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dedup_clips_stream(
    clips: DataFrame, watermark: str = "2 minutes", within_watermark: bool = True
) -> DataFrame:
    """Streaming exact-dedup on clip_id.

    ``dropDuplicatesWithinWatermark`` keeps state only until the watermark
    passes each key's event time — bounded state at any scale, the right
    default for at-least-once upstreams that can re-deliver within a window.
    ``within_watermark=False`` uses global dropDuplicates state (exact across
    the whole stream; state grows with distinct keys).
    """
    wm = clips.withWatermark("ts", watermark)
    if within_watermark:
        return wm.dropDuplicatesWithinWatermark(["clip_id"])
    return wm.dropDuplicates(["clip_id"])


def session_agg_stream(decoded: DataFrame, gap: str = "30 seconds") -> DataFrame:
    """Session-window aggregate over a watermarked decoded stream.

    Spark merges session state across micro-batches; append mode emits a
    session once the watermark passes its end.
    """
    return (
        decoded.groupBy(F.session_window("ts", gap), "bucket")
        .agg(
            F.count(F.lit(1)).alias("n_clips"),
            F.sum(F.col("dur_ms").cast("long")).alias("sum_dur_ms"),
        )
        .select(
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "bucket",
            "n_clips",
            "sum_dur_ms",
        )
    )


def sliding_agg_stream(
    decoded: DataFrame, duration: str = "10 seconds", slide: str = "5 seconds"
) -> DataFrame:
    return (
        decoded.groupBy(F.window("ts", duration, slide), "bucket")
        .agg(F.count(F.lit(1)).alias("n_clips"))
        .select(
            F.col("window.start").alias("window_start"),
            "bucket",
            "n_clips",
        )
    )


def enrich_with_static_dim(
    stream: DataFrame, dim: DataFrame, key: str = "codec"
) -> DataFrame:
    """Stream-static broadcast enrichment join.

    The static side is re-planned per micro-batch (so a slowly-changing
    dimension table re-reads its source on every trigger) and broadcast —
    no shuffle on the stream side, the standard pattern for attaching
    reference data (codec properties, language lexicons, label maps) to a
    high-volume stream. Static-side rows with no match drop stream rows
    only under inner; default left keeps every stream row.
    """
    return stream.join(F.broadcast(dim), key, "left")


def corpus_minhash_index(
    corpus_docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    k: int = 64,
    bands: int = 16,
    rows: int = 4,
    max_bucket_size: int | None = 1000,
) -> tuple[DataFrame, DataFrame]:
    """Static-side MinHash index for stream-vs-corpus near-dup detection:
    (buckets, shingles).

    ``buckets`` = (corpus_id, band, bucket) via the scale path
    (explode + partial-min aggregate, operators.dedup.minhash_band_buckets)
    with the hot-bucket cap applied — a stream row hitting a boilerplate
    bucket joins at most ``max_bucket_size`` corpus rows. ``shingles`` =
    (corpus_id, c_shingles) for the exact-Jaccard verify. Callers should
    ``persist()`` (or materialize to parquet) both: Structured Streaming
    re-plans static sides every micro-batch.
    """
    from pyspark.sql.window import Window

    from dataflow_geobeam_spark.functions import text as T
    from dataflow_geobeam_spark.operators.dedup import minhash_band_buckets

    sh = corpus_docs.select(
        F.col(id_col).alias("_id"), T.shingles(text_col, n).alias("shingles")
    ).where(F.size("shingles") > 0)
    buckets = minhash_band_buckets(sh, k, bands, rows)
    if max_bucket_size is not None:
        w = Window.partitionBy("band", "bucket")
        buckets = (
            buckets.withColumn("_bsz", F.count(F.lit(1)).over(w))
            .where(F.col("_bsz") <= max_bucket_size)
            .drop("_bsz")
        )
    buckets = buckets.withColumnRenamed("_id", "corpus_id")
    shingles = sh.select(F.col("_id").alias("corpus_id"), F.col("shingles").alias("c_shingles"))
    return buckets, shingles


def near_dup_stream_vs_corpus(
    stream_docs: DataFrame,
    corpus_index: tuple[DataFrame, DataFrame],
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    k: int = 64,
    bands: int = 16,
    rows: int = 4,
    threshold: float = 0.5,
) -> DataFrame:
    """Streaming near-dup detection of incoming documents AGAINST an
    existing corpus — the dedup a training-data pipeline runs on a live
    crawl before admitting documents (drop what the corpus already has).

    Per micro-batch, entirely map-local on the stream side: shingles ->
    higher-order MinHash signature (functions.text.minhash_signature — no
    aggregation, so no streaming-agg output-mode constraints) -> band
    buckets (functions.text.lsh_bands; identical bucket values to the
    static index's explode+groupBy path, both hash the comma-joined band
    slots). Candidates come from a stream-STATIC equi-join on (band,
    bucket) — Spark broadcasts/replans the static side per batch; the
    stream side never accumulates join state. Exact Jaccard verifies
    candidates against the corpus shingle table; a final streaming
    ``dropDuplicates`` emits each (stream_id, corpus_id) pair once
    (state = emitted pairs; bound it with a watermark +
    dropDuplicatesWithinWatermark when the stream carries event time).

    Output: (stream_id, corpus_id, jaccard >= threshold).

    A shingle-array copy rides each of the ``bands`` exploded rows on the
    stream side (the self-join form instead joins shingles back by id,
    which a stream cannot do without a stream-stream join); at crawl
    ingest rates that per-row fanout is the cheap side of the trade.
    """
    from dataflow_geobeam_spark.functions import text as T

    buckets_c, shingles_c = corpus_index
    n_parts = int(stream_docs.sparkSession.conf.get("spark.sql.shuffle.partitions", "32"))
    s = stream_docs.select(
        F.col(id_col).alias("stream_id"), T.shingles(text_col, n).alias("s_shingles")
    ).where(F.size("s_shingles") > 0)
    # exchange boundary before the signature expression: CollapseProject
    # would otherwise inline the shingle/tokenizer expr into every one of
    # the k hash lambdas (see operators.dedup.with_minhash)
    s = s.repartition(n_parts)
    sig = s.withColumn("sig", T.minhash_signature(F.col("s_shingles"), k))
    sb = sig.select(
        "stream_id",
        "s_shingles",
        F.explode(T.lsh_bands(F.col("sig"), bands, rows)).alias("b"),
    ).select(
        "stream_id",
        "s_shingles",
        F.col("b.band").alias("band"),
        F.col("b.bucket_hash").alias("bucket"),
    )
    cand = sb.join(buckets_c, ["band", "bucket"]).join(shingles_c, "corpus_id")
    inter = F.size(F.array_intersect("s_shingles", "c_shingles")).cast("double")
    union = F.size(F.array_union("s_shingles", "c_shingles")).cast("double")
    return (
        cand.withColumn("jaccard", F.round(inter / union, 6))
        .where(F.col("jaccard") >= threshold)
        .select("stream_id", "corpus_id", "jaccard")
        .dropDuplicates(["stream_id", "corpus_id"])
    )


def salted_windowed_agg_stream(
    decoded: DataFrame,
    duration: str = "10 seconds",
    salt_plan: DataFrame | None = None,
    default_salts: int = 8,
    id_col: str = "clip_id",
    key_col: str = "bucket",
) -> DataFrame:
    """Skew-salted tumbling windowed aggregate ON THE STREAM — the north
    rule's "salted repartitioning on dur_ms-weighted key buckets before
    the windowed hash-aggregate" in its streaming form (the batch form is
    operators/skew.salted_two_phase_agg).

    Two CHAINED streaming aggregations (append mode — Spark 4 supports
    multiple stateful operators under one watermark):

    1. partial on (window, key, salt): the hot key's rows fan out over its
       salt slots, so no single state-store partition owns the hot key's
       whole window;
    2. final on (re-windowed window, key): combines the per-salt partials;
       algebraic aggs compose exactly, mean derives as sum/count.

    ``salt_plan`` is the (key, _k) fan-out table from
    operators.skew.weighted_salt_plan — computed on HISTORICAL data and
    broadcast stream-static (a live stream cannot run the stats pass over
    itself); keys absent from the plan (or plan=None) get
    ``default_salts``. Salt is pmod(xxhash64(id), k): uniform within a
    key, deterministic.

    Output schema matches streaming.pipeline.windowed_agg_stream.
    """
    df = decoded
    if salt_plan is not None:
        df = df.join(F.broadcast(salt_plan), on=key_col, how="left")
        k = F.coalesce(F.col("_k"), F.lit(default_salts))
    else:
        k = F.lit(default_salts)
    df = df.withColumn("salt", F.pmod(F.xxhash64(F.col(id_col)), k).cast("int"))
    partial = (
        df.groupBy(F.window("ts", duration), F.col(key_col), "salt")
        .agg(
            F.count(F.lit(1)).alias("_n"),
            F.sum(F.col("dur_ms").cast("long")).alias("_sum_dur"),
            F.sum("rms").alias("_sum_rms"),
            F.sum("n_samples").alias("_sum_samples"),
        )
    )
    final = (
        partial.groupBy(F.window(F.col("window"), duration), F.col(key_col))
        .agg(
            F.sum("_n").alias("n_clips"),
            F.sum("_sum_dur").alias("sum_dur_ms"),
            (F.sum("_sum_rms") / F.sum("_n")).alias("mean_rms"),
            F.sum("_sum_samples").alias("sum_samples"),
        )
    )
    return final.select(
        F.col("window.start").alias("window_start"),
        F.col("window.end").alias("window_end"),
        key_col,
        "n_clips",
        "sum_dur_ms",
        "mean_rms",
        "sum_samples",
    )


def audio_fingerprint_index(
    corpus_clips: DataFrame,
    id_col: str = "clip_id",
    stride: int = 1,
    bucket_cap: int = 200,
) -> tuple[DataFrame, DataFrame]:
    """Static-side spectral-fingerprint index for stream-vs-corpus audio
    near-dup detection: (tokens, fps).

    ``tokens`` = (corpus_id, pos, tok) — every ``stride``-th 16-bit frame
    token with its position, hot-key capped exactly like the batch
    operator (operators.dedup.audio_near_dup_pairs), so a stream clip
    hitting a degenerate token (silence) joins a bounded candidate set.
    ``fps`` = (corpus_id, c_fp, c_n) for the exact bit-error-rate verify.
    Callers should ``persist()`` (or materialize to parquet) both:
    Structured Streaming re-plans static sides every micro-batch, and the
    decode+FFT pass must not rerun per batch.
    """
    from pyspark.sql.window import Window

    from dataflow_geobeam_spark.functions.audio import with_fingerprints

    fp = (
        with_fingerprints(corpus_clips)
        .where(F.col("fp").isNotNull() & (F.size("fp") > 0))
        .select(F.col(id_col).alias("corpus_id"), "fp", F.size("fp").alias("c_n"))
    )
    toks = fp.select(
        "corpus_id", F.posexplode("fp").alias("pos", "tok")
    ).where(F.col("pos") % stride == 0)
    w = Window.partitionBy("pos", "tok")
    tokens = (
        toks.withColumn("_ksz", F.count(F.lit(1)).over(w))
        .where(F.col("_ksz") <= bucket_cap)
        .drop("_ksz")
    )
    fps = fp.select("corpus_id", F.col("fp").alias("c_fp"), "c_n")
    return tokens, fps


def audio_near_dup_stream_vs_corpus(
    stream_clips: DataFrame,
    corpus_index: tuple[DataFrame, DataFrame],
    id_col: str = "clip_id",
    stride: int = 1,
    max_ber: float = 0.10,
) -> DataFrame:
    """Streaming near-dup detection of incoming AUDIO clips against an
    existing corpus — crawl-admission dedup for audio training data
    (drop re-encoded / volume-shifted / noisy copies of clips the corpus
    already holds), the audio mirror of ``near_dup_stream_vs_corpus``.

    Per micro-batch, map-local on the stream side: ONE mapInArrow pass
    decodes + fingerprints each clip (functions.audio.with_fingerprints
    — identical tokens to the static index's pass), then posexplode to
    (position, token) sub-keys. Candidates come from a stream-STATIC
    equi-join on (pos, tok); the stream side never accumulates join
    state. The exact BER verify is pure Catalyst (zip_with XOR +
    bit_count + aggregate) against the corpus fingerprint table, equal
    token counts only (the duration-preserving transform contract); a
    final streaming ``dropDuplicates`` emits each (stream_id, corpus_id)
    pair once (bound the state with a watermark +
    dropDuplicatesWithinWatermark when the stream carries event time).

    The fingerprint array (~100 ints) rides each exploded stream-side
    row — two orders of magnitude lighter than the text variant's
    shingle arrays, so the fanout is immaterial at ingest rates.

    Output: (stream_id, corpus_id, ber <= max_ber).
    """
    from dataflow_geobeam_spark.functions.audio import with_fingerprints

    tokens_c, fps_c = corpus_index
    s = (
        with_fingerprints(stream_clips)
        .where(F.col("fp").isNotNull() & (F.size("fp") > 0))
        .select(F.col(id_col).alias("stream_id"), "fp", F.size("fp").alias("s_n"))
    )
    sb = s.select(
        "stream_id", "fp", "s_n", F.posexplode("fp").alias("pos", "tok")
    ).where(F.col("pos") % stride == 0)
    cand = (
        sb.join(tokens_c, ["pos", "tok"])
        .join(fps_c, "corpus_id")
        .where((F.col("c_n") == F.col("s_n")) & (F.col("corpus_id") != F.col("stream_id")))
    )
    mismatches = F.aggregate(
        F.zip_with("fp", "c_fp", lambda x, y: F.bit_count(x.bitwiseXOR(y))),
        F.lit(0),
        lambda acc, v: acc + v,
    )
    return (
        cand.withColumn("ber", F.round(mismatches / (16.0 * F.col("c_n")), 6))
        .where(F.col("ber") <= max_ber)
        .select("stream_id", "corpus_id", "ber")
        .dropDuplicates(["stream_id", "corpus_id"])
    )


def fp_match_stream_vs_corpus(
    stream_queries: DataFrame,
    corpus_fp: DataFrame,
    sink,
    checkpoint_dir: str,
    min_votes: int = 4,
    available_now: bool = True,
):
    """STREAMING query-by-example retrieval: snippets arrive as a stream
    and are resolved against a static corpus fingerprint index — the
    serving form of ``plans/audio.audio_fp_match`` (a recognition service
    answering "which catalog clip is this?" per uploaded snippet).

    Every snippet is wholly contained in its own stream row, so its
    bigram votes NEVER span micro-batches — per-batch matching with the
    exact BATCH operator (``operators.retrieval.fp_match_top1``, window
    top-1 and all) inside ``foreachBatch`` is semantically exact, not an
    approximation; no streaming state is needed beyond the sink's epoch
    protocol. Each epoch commits idempotently through the exactly-once
    sink, so a kill/restart replays to the identical committed match set.

    ``corpus_fp`` = (clip_id, fp) and MUST be materialized by the caller
    (persist/localCheckpoint/parquet): foreachBatch re-evaluates the
    static side per epoch, and the corpus decode+FFT pass must not rerun
    per micro-batch.

    Returns the started StreamingQuery; read matches back via
    ``sink.read_latest(spark, ["query_id"])``.
    """
    from dataflow_geobeam_spark.functions.audio import with_fingerprints
    from dataflow_geobeam_spark.operators.retrieval import fp_match_top1

    def _fn(batch_df: DataFrame, epoch_id: int) -> None:
        matched = fp_match_top1(
            corpus_fp,
            with_fingerprints(batch_df),
            min_votes=min_votes,
        ).select("query_id", "clip_id", "offset_frames", "votes")
        sink.write_batch(matched, epoch_id)

    writer = (
        stream_queries.writeStream.outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(_fn)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime="2 seconds")
    return writer.start()


def contamination_stream_vs_eval(
    stream_docs: DataFrame,
    eval_docs: DataFrame,
    sink,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
    available_now: bool = True,
):
    """STREAMING decontamination — the crawl-admission screen (round 5e):
    candidate documents arrive as a stream and are checked for n-gram
    overlap against a STATIC held-out eval set before admission to the
    training corpus, the streaming form of
    ``operators/dedup.contamination``.

    A document's grams are wholly contained in its own stream row, so
    per-batch screening with the exact BATCH operator inside
    ``foreachBatch`` is semantically exact (the fp_match_stream
    precedent) — no streaming state beyond the sink's epoch protocol;
    each epoch commits idempotently through the exactly-once sink, so a
    kill/restart replays to the identical committed contamination set.

    ``eval_docs`` MUST be materialized by the caller (persist/
    localCheckpoint/parquet) — foreachBatch re-evaluates the static side
    per epoch. Returns the started StreamingQuery; read flagged docs via
    ``sink.read_latest(spark, [id_col])``.
    """
    from dataflow_geobeam_spark.operators.dedup import contamination

    def _fn(batch_df: DataFrame, epoch_id: int) -> None:
        flagged = contamination(batch_df, eval_docs, id_col, text_col, n)
        sink.write_batch(flagged, epoch_id)

    writer = (
        stream_docs.writeStream.outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(_fn)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime="2 seconds")
    return writer.start()


def pack_greedy_stream(
    stream_docs: DataFrame,
    seq_len: int,
    group_col: str = "source",
    id_col: str = "doc_id",
    tokens_col: str = "n_tok",
):
    """STREAMING sequence packing (round 5e) — the stateful form of
    ``operators/packing.pack_greedy``: documents arrive in micro-batches
    and each group's running token counter lives in typed state
    (``applyInPandasWithState``), so chunk assignment continues
    seamlessly across epochs and, through the checkpoint, across
    restarts — the ingest-time "pack as you crawl" shape.

    Ordering contract: within each (group, micro-batch) docs pack in
    ``id_col`` order; batches pack in arrival order. When the stream
    delivers groups' docs in id order (e.g. time-ordered shard files),
    the assignment equals the batch operator exactly — pinned by
    tests/test_streaming_extras.py. Returns (id, group, n_tok,
    cum_tokens, chunk_id) rows.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    out_schema = StructType(
        [
            StructField(id_col, LongType(), False),
            StructField(group_col, StringType(), False),
            StructField(tokens_col, LongType(), False),
            StructField("cum_tokens", LongType(), False),
            StructField("chunk_id", LongType(), False),
        ]
    )
    state_schema = StructType([StructField("cum", LongType(), True)])

    def fn(key, pdfs, state: GroupState):
        import pandas as pd  # noqa: PLC0415 - worker-side import

        cum = state.get[0] if state.exists else 0
        frames = [pdf for pdf in pdfs if len(pdf)]
        if not frames:
            if state.exists:
                state.update((cum,))
            return
        batch = pd.concat(frames).sort_values(id_col)
        ids, toks, cums, chunks = [], [], [], []
        for did, n in zip(batch[id_col], batch[tokens_col]):
            n = int(n)
            start = cum
            cum += n
            ids.append(int(did))
            toks.append(n)
            cums.append(cum)
            chunks.append(start // seq_len)
        state.update((cum,))
        yield pd.DataFrame(
            {
                id_col: ids,
                group_col: str(key[0]),
                tokens_col: toks,
                "cum_tokens": cums,
                "chunk_id": chunks,
            }
        )

    return stream_docs.select(id_col, group_col, tokens_col).groupBy(
        group_col
    ).applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def sniff_ingest_stream(
    stream_df: DataFrame,
    sink,
    checkpoint_dir: str,
    available_now: bool = True,
):
    """STREAMING form of the label-free crawl ingest (round 5): each
    micro-batch of raw (clip_id, bytes) rows — no codec column — runs the
    magic-sniffing decode kernel (functions/audio.with_sniffed_pcm16:
    real wav/FLAC/AIFF/AU + stand-ins, truncated/garbage rows null out
    and drop) and commits (clip_id, container, sr_hz, n_samples,
    pcm16_md5) through the exactly-once manifest sink. Per-row decode is
    stateless, so foreachBatch is semantically exact; epoch replay after
    a kill re-commits the identical rows (idempotent sink protocol).

    Returns the started StreamingQuery; read results back via
    ``sink.read(spark)``.
    """
    from pyspark.sql import functions as F

    from dataflow_geobeam_spark.functions.audio import with_sniffed_pcm16

    def _fn(batch_df: DataFrame, epoch_id: int) -> None:
        out = (
            with_sniffed_pcm16(batch_df)
            .where(F.col("pcm16").isNotNull())
            .select(
                "clip_id",
                "container",
                F.col("sniff_sr").alias("sr_hz"),
                F.col("n_samples").cast("long").alias("n_samples"),
                F.md5("pcm16").alias("pcm16_md5"),
            )
        )
        sink.write_batch(out, epoch_id)

    writer = (
        stream_df.writeStream.outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(_fn)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime="2 seconds")
    return writer.start()
