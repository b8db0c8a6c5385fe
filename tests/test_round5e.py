"""Round-5e: query-by-example audio fingerprint retrieval
(operators/retrieval.py + plans/audio.audio_fp_match).

Covers the kernel-level subsequence invariant the operator relies on, the
Catalyst bigram-key expression vs a numpy mirror, end-to-end equality with
the exhaustive independent golden, and the plan contract (query side
broadcast, no cartesian product).
"""

from __future__ import annotations

import numpy as np
import pytest


def test_snippet_tokens_are_exact_corpus_subsequence():
    """A hop-aligned slice re-encoded through PCM16 yields tokens equal to
    the corpus token subsequence at the slice's hop index — at unit gain
    bit-exactly, and at gain 0.5 (exact in float32) likewise, because every
    band energy scales by 0.25 and the sign decisions are scale-invariant."""
    from dataflow_geobeam_spark.audio_synth import synth_pcm
    from dataflow_geobeam_spark.fixtures import independent

    sr = 16000
    pcm, _ = independent.decode(
        independent.encode(synth_pcm(12345, sr, 2400), sr, "wav"), "wav"
    )
    full = independent.audio_fingerprint(pcm, sr)
    frame = int(round(sr * 0.064))
    hop = frame // 2
    for k_hops, gain in ((2, 1.0), (4, 0.5)):
        snip = pcm[k_hops * hop : k_hops * hop + int(round(sr * 1.2))] * np.float32(gain)
        rt, _ = independent.decode(independent.encode(snip, sr, "wav"), "wav")
        toks = independent.audio_fingerprint(rt, sr)
        assert len(toks) >= 30
        assert toks == full[k_hops : k_hops + len(toks)]


def test_fp_bigram_keys_matches_numpy(spark):
    """The zip_with/slice bigram expression assembles the same 32-bit keys
    as the golden generator's (tok[t] << 16) | tok[t+1]."""
    from pyspark.sql import functions as F

    from dataflow_geobeam_spark.operators.retrieval import fp_bigram_keys

    rows = [([5, 65535, 0, 1234],), ([7],), ([],), (None,)]
    df = spark.createDataFrame(rows, "fp: array<int>")
    got = [r[0] for r in df.select(fp_bigram_keys("fp").alias("k")).collect()]
    assert got[0] == [(5 << 16) | 65535, (65535 << 16) | 0, (0 << 16) | 1234]
    assert got[1] == [] and got[2] == [] and got[3] is None
    # keys stay inside codegen: no python UDF node in the plan
    plan = df.select(fp_bigram_keys("fp"))._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_audio_fp_match_equals_independent_golden(spark, sf_dir):
    """End to end vs the exhaustive mirror: every fixture snippet resolves
    to its true donor clip at the planted hop offset."""
    import duckdb

    from dataflow_geobeam_spark.fixtures.generate import ensure_golden_fp_match
    from dataflow_geobeam_spark.plans.audio import audio_fp_match

    golden = ensure_golden_fp_match(sf_dir)
    want = {
        tuple(r)
        for r in duckdb.sql(
            f"SELECT query_id, clip_id, offset_frames, votes FROM read_parquet('{golden}')"
        ).fetchall()
    }
    got = {tuple(r) for r in audio_fp_match(spark, sf_dir).collect()}
    assert got == want and len(got) >= 20
    # the retrieval is not vacuous: donor id is embedded in the query id
    assert all(q[1:] == c[2:] for q, c, _, _ in got)


def test_fp_match_plan_broadcasts_queries_no_cartesian(spark, sf_dir):
    from dataflow_geobeam_spark.plans.audio import audio_fp_match

    df = audio_fp_match(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan  # corpus index must not shuffle to match


def test_fp_match_min_votes_drops_unconfident(spark):
    """A query sharing no content with the corpus yields no row (its best
    chance-collision cell stays under min_votes)."""
    from dataflow_geobeam_spark.audio_synth import synth_pcm
    from dataflow_geobeam_spark.fixtures import independent
    from dataflow_geobeam_spark.operators.retrieval import fp_match_top1

    sr = 16000
    corpus_rows = [
        (f"c{i}", independent.audio_fingerprint(
            independent.decode(
                independent.encode(synth_pcm(i, sr, 1500), sr, "wav"), "wav"
            )[0],
            sr,
        ))
        for i in range(5)
    ]
    alien = independent.audio_fingerprint(
        independent.decode(
            independent.encode(synth_pcm(99999, sr, 1500), sr, "wav"), "wav"
        )[0],
        sr,
    )
    corpus = spark.createDataFrame(corpus_rows, "clip_id: string, fp: array<int>")
    queries = spark.createDataFrame(
        [("q_alien", alien), ("q_hit", corpus_rows[2][1][3:25])],
        "query_id: string, fp: array<int>",
    )
    got = {r["query_id"]: r for r in fp_match_top1(corpus, queries).collect()}
    assert "q_alien" not in got
    assert got["q_hit"]["clip_id"] == "c2" and got["q_hit"]["offset_frames"] == 3


def test_audio_fp_match_stream_equals_batch(spark, sf_dir):
    """The streaming serving form (paced micro-batches -> foreachBatch
    batch-operator match -> exactly-once sink) commits exactly the batch
    query's rows, across multiple epochs."""
    from dataflow_geobeam_spark.plans.audio import audio_fp_match, audio_fp_match_stream

    got = {tuple(r) for r in audio_fp_match_stream(spark, sf_dir).collect()}
    want = {tuple(r) for r in audio_fp_match(spark, sf_dir).collect()}
    assert got == want and len(got) >= 20


def test_align_tokens_hand_built_exact(spark):
    """Two speech segments (300 ms + 100 ms of speech, a silence gap
    between), 4 tokens: token spans are T/n = 100 ms of SPEECH time each,
    so tokens 0-2 start inside segment 1 at 100 ms strides and token 3
    starts at the second segment's opening edge — silence never owns a
    token."""
    from dataflow_geobeam_spark.operators.alignment import align_tokens_to_segments

    segs = spark.createDataFrame(
        [("c1", 1, 200, 500), ("c1", 2, 900, 1000)],
        "clip_id string, seg_idx long, start_ms long, end_ms long",
    )
    tr = spark.createDataFrame(
        [("c1", "  a b c d "), ("c_nosegs", "x y"), ("c1_pad", "   ")],
        "clip_id string, transcript string",
    )
    got = {
        r["tok_idx"]: (r["token"], r["seg_idx"], r["t_start_ms"])
        for r in align_tokens_to_segments(segs, tr).collect()
    }
    assert got == {
        0: ("a", 1, 200.0),
        1: ("b", 1, 300.0),
        2: ("c", 1, 400.0),
        3: ("d", 2, 900.0),
    }


def test_align_tokens_invariants(spark, sf_dir):
    """Every aligned token lands inside its segment's [start, end) span,
    clips emit exactly their transcript token count (when they have any
    speech segment), and tok_idx is a gapless 0..n-1 run."""
    from pyspark.sql import functions as F

    from dataflow_geobeam_spark.plans.audio import audio_align_tokens, audio_vad_segments

    out = audio_align_tokens(spark, sf_dir)
    segs = audio_vad_segments(spark, sf_dir).select(
        "clip_id", "seg_idx", "start_ms", "end_ms"
    )
    j = out.join(segs, ["clip_id", "seg_idx"])
    bad = j.where(
        (F.col("t_start_ms") < F.col("start_ms"))
        | (F.col("t_start_ms") >= F.col("end_ms"))
    ).count()
    assert bad == 0
    per_clip = out.groupBy("clip_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("tok_idx").alias("lo"),
        F.max("tok_idx").alias("hi"),
    )
    holes = per_clip.where(
        (F.col("lo") != 0) | (F.col("hi") != F.col("n") - 1)
    ).count()
    assert holes == 0 and out.count() > 500


def test_augment_noise_engine_matches_independent_mirror():
    """The vectorized engine kernel (cumsum power fold, np.clip) and the
    scalar independent mirror produce bit-identical float64 output for the
    same (pcm, key) — including a loud clip that actually clips at +/-1."""
    from dataflow_geobeam_spark.audio_synth import synth_pcm
    from dataflow_geobeam_spark.fixtures import independent
    from dataflow_geobeam_spark.functions.audio import augment_noise_np

    sr = 16000
    pcm = synth_pcm(777, sr, 500).astype(np.float64)
    for key, gain in ((1, 1.0), (99, 0.98)):
        x = pcm * gain
        a = augment_noise_np(x, key)
        b = independent.augment_noise(x, sr, key)
        assert a.dtype == np.float64 and a.shape == x.shape
        assert np.array_equal(a, b)
    # silent clip: power 0 => scale 0 => output unchanged
    z = np.zeros(1000)
    assert np.array_equal(augment_noise_np(z, 5), z)
    # empty clip passes through
    assert augment_noise_np(np.array([]), 5).size == 0


def test_augment_noise_is_deterministic_and_keyed():
    """Same key => identical bytes (task-retry safety); different key =>
    different noise (per-clip independence)."""
    from dataflow_geobeam_spark.audio_synth import synth_pcm
    from dataflow_geobeam_spark.functions.audio import augment_noise_np

    pcm = synth_pcm(31337, 8000, 250).astype(np.float64)
    a1 = augment_noise_np(pcm, 42)
    a2 = augment_noise_np(pcm, 42)
    a3 = augment_noise_np(pcm, 43)
    assert np.array_equal(a1, a2)
    assert not np.array_equal(a1, a3)
    # measured SNR is close to the 15 dB target
    noise = a1 - pcm
    snr = 10 * np.log10(np.mean(pcm**2) / np.mean(noise**2))
    assert 13.0 < snr < 17.0


def test_with_augmented_noise_drops_undecodable_and_pins_bytes(spark, sf_dir):
    """One mapInArrow pass: invalid payloads yield no row; output n_samples
    equals the source decode length; bytes are valid RIFF/WAVE that decode
    back to the mixed signal."""
    from dataflow_geobeam_spark import codecs
    from dataflow_geobeam_spark.functions.audio import (
        augment_noise_np,
        with_augmented_noise,
    )
    from dataflow_geobeam_spark.plans.audio import ensure_fixtures, read_clips
    import zlib

    fx = ensure_fixtures(sf_dir)
    df = read_clips(spark, fx, columns=("clip_id", "bytes", "codec", "sr_hz"))
    out = with_augmented_noise(df).limit(5).collect()
    assert len(out) == 5
    src = {
        r["clip_id"]: r
        for r in df.where(
            df.clip_id.isin([r["clip_id"] for r in out])
        ).collect()
    }
    for row in out:
        s = src[row["clip_id"]]
        pcm, sr = codecs.decode(bytes(s["bytes"]), s["codec"])
        mixed = augment_noise_np(pcm, zlib.crc32(row["clip_id"].encode()))
        rt, rt_sr = codecs.decode(bytes(row["aug"]), "wav")
        assert row["n_samples"] == pcm.shape[0] == rt.shape[0]
        assert rt_sr == (s["sr_hz"] or sr)
        # PCM16 quantization: round-trip within one LSB of the mixed signal
        assert float(np.max(np.abs(rt - mixed))) <= 1.0 / 32767.0


def test_speed_perturb_kernel_properties():
    """Speed 0.9 lengthens (round(n/0.9)), 1.1 shortens; engine kernel is
    bit-identical to the independent mirror composition; speed 1.0 is the
    identity (same samples back)."""
    from dataflow_geobeam_spark.audio_synth import synth_pcm
    from dataflow_geobeam_spark.fixtures import independent
    from dataflow_geobeam_spark.functions.audio import speed_perturb_np

    sr = 16000
    pcm = synth_pcm(2024, sr, 400).astype(np.float64)
    n = pcm.shape[0]
    for s in (0.9, 1.1):
        y = speed_perturb_np(pcm, sr, s)
        assert y.shape[0] == round(n * sr / round(sr * s))
        mirror = independent.resample_linear(pcm, round(sr * s), sr)
        assert np.array_equal(y, mirror)
    assert np.array_equal(speed_perturb_np(pcm, sr, 1.0), pcm)


def test_with_speed_perturb_two_rows_per_clip(spark, sf_dir):
    """One Arrow pass emits exactly len(speeds) rows per decodable clip,
    and the emitted wav decodes to the expected perturbed length."""
    from dataflow_geobeam_spark import codecs
    from dataflow_geobeam_spark.functions.audio import with_speed_perturb
    from dataflow_geobeam_spark.plans.audio import ensure_fixtures, read_clips
    import pyspark.sql.functions as F

    fx = ensure_fixtures(sf_dir)
    df = read_clips(spark, fx, columns=("clip_id", "bytes", "codec", "sr_hz"))
    out = with_speed_perturb(df)
    counts = out.groupBy("clip_id").count().select("count").distinct().collect()
    assert [r["count"] for r in counts] == [2]
    row = out.where(F.col("speed") == 1.1).limit(1).collect()[0]
    rt, _sr = codecs.decode(bytes(row["sp"]), "wav")
    assert rt.shape[0] == row["n_samples"]


def test_cmvn_normalizes_to_zero_mean_unit_variance(spark):
    """Hand-built vectors: output per-coefficient corpus mean ~0 and
    population stddev ~1; a zero-variance coefficient maps to 0.0."""
    from dataflow_geobeam_spark.operators.normalize import cmvn

    rows = [(f"c{i}", [float(i), 2.0 * i + 1.0, 5.0]) for i in range(8)]
    df = spark.createDataFrame(rows, "clip_id string, v array<double>")
    out = cmvn(df, "v", 3, prefix="z").toPandas().sort_values("clip_id")
    import numpy as np

    for col, const in (("z00", False), ("z01", False), ("z02", True)):
        vals = out[col].to_numpy()
        if const:
            assert np.allclose(vals, 0.0)
        else:
            assert abs(vals.mean()) < 1e-9
            assert abs(vals.std() - 1.0) < 1e-9


def test_cmvn_plan_broadcasts_stats(spark):
    """The 1-row stats frame joins via BroadcastNestedLoopJoin — the big
    side is never shuffled for the normalize."""
    from dataflow_geobeam_spark.operators.normalize import cmvn

    df = spark.range(100).selectExpr(
        "cast(id as string) clip_id",
        "array(cast(id as double), cast(id*2 as double)) v",
    )
    plan = cmvn(df, "v", 2)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan
    assert plan.count("Exchange hashpartitioning") == 0


def test_split_deterministic_and_proportional(spark):
    """The split survives repartitioning bit-for-bit (the task-retry
    property), proportions land near the requested fractions at 20k ids,
    and a salt re-deals without changing proportions."""
    from pyspark.sql import functions as F

    from dataflow_geobeam_spark.operators.split import assign_split

    df = spark.range(20000).selectExpr("concat('id-', id) AS k")
    a = assign_split(df, "k")
    b = assign_split(df.repartition(7), "k")
    assert (
        a.join(b.withColumnRenamed("split", "split2"), "k")
        .where("split != split2")
        .count()
        == 0
    )
    frac = {r["split"]: r["n"] for r in a.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert abs(frac["train"] / 20000 - 0.90) < 0.01
    assert abs(frac["val"] / 20000 - 0.05) < 0.005
    assert abs(frac["test"] / 20000 - 0.05) < 0.005
    s = assign_split(df, "k", salt="exp2")
    moved = (
        a.join(s.withColumnRenamed("split", "split2"), "k")
        .where("split != split2")
        .count()
    )
    assert moved > 1000  # the salt genuinely re-deals


def test_split_sql_mirrors_spark_expr(spark):
    """split_sql's CASE in DuckDB agrees row-for-row with split_expr in
    Spark on the same ids — the exact engine-to-engine contract the gate
    relies on."""
    import duckdb

    from dataflow_geobeam_spark.operators.split import assign_split, split_sql

    ids = [f"clip-{i:05d}" for i in range(3000)]
    df = spark.createDataFrame([(i,) for i in ids], "k string")
    got = dict(assign_split(df, "k").collect())
    con = duckdb.connect()
    con.execute("CREATE TABLE t AS SELECT unnest(?) AS k", [ids])
    want = dict(con.execute(f"SELECT k, {split_sql('k')} FROM t").fetchall())
    assert got == want


def test_split_boundaries_validation():
    import pytest as _pytest

    from dataflow_geobeam_spark.operators.split import split_boundaries

    with _pytest.raises(ValueError):
        split_boundaries((("a", 0.5), ("b", 0.4)))
    bs = split_boundaries((("a", 0.25), ("b", 0.25), ("c", 0.5)))
    assert bs[0][1] == "40000000" and bs[1][1] == "80000000" and bs[2][1] is None


def test_specaugment_engine_matches_independent_mirror():
    """Engine kernel (vectorized mask + frame fold) and the independent
    scalar mirror produce identical mask rectangles and bit-identical
    post-mask means for the same (pcm, key)."""
    from dataflow_geobeam_spark.audio_synth import synth_pcm
    from dataflow_geobeam_spark.fixtures import independent
    from dataflow_geobeam_spark.functions.audio import specaugment_means_np

    sr = 16000
    pcm = synth_pcm(4242, sr, 800).astype(np.float64)
    for key in (7, 1234):
        f0, f_w, t0, t_w, nf, mean = specaugment_means_np(pcm, sr, key)
        i_f0, i_fw, i_t0, i_tw, i_nf, i_mean = independent.specaugment_means(
            pcm, sr, key
        )
        assert (f0, f_w, t0, t_w, nf) == (i_f0, i_fw, i_t0, i_tw, i_nf)
        assert np.array_equal(mean, i_mean)
    # same key => identical; different key => different mask (with high
    # probability for these two keys, asserted concretely)
    a = specaugment_means_np(pcm, sr, 7)
    b = specaugment_means_np(pcm, sr, 7)
    assert a[:5] == b[:5] and np.array_equal(a[5], b[5])


def test_specaugment_mask_semantics():
    """A fully-masked band's post-mask mean is exactly the log floor when
    the frequency mask covers it; sub-frame clips return None."""
    from dataflow_geobeam_spark.audio_synth import synth_pcm
    from dataflow_geobeam_spark.functions.audio import (
        MEL_FLOOR,
        logmel_frames_np,
        specaugment_means_np,
    )

    sr = 16000
    pcm = synth_pcm(99, sr, 600).astype(np.float64)
    # find a key whose f-mask is non-empty
    for key in range(50):
        f0, f_w, t0, t_w, nf, mean = specaugment_means_np(pcm, sr, key)
        if f_w > 0 and t_w == 0:
            floor = float(np.log10(MEL_FLOOR))
            for m in range(f0, f0 + f_w):
                assert mean[m] == floor
            break
    else:
        raise AssertionError("no key with f_w>0, t_w==0 in 50 draws")
    assert specaugment_means_np(np.zeros(10), sr, 1) is None
    # unmasked bands equal the plain log-mel mean
    logE = logmel_frames_np(pcm, sr)
    plain = np.zeros(logE.shape[1])
    for t in range(logE.shape[0]):
        plain = plain + logE[t]
    plain /= logE.shape[0]
    if t_w == 0:
        for m in range(logE.shape[1]):
            if not (f0 <= m < f0 + f_w):
                assert mean[m] == plain[m]


def test_sample_threshold_hex_exactness():
    from dataflow_geobeam_spark.operators.split import sample_threshold_hex

    assert sample_threshold_hex(1.0) is None
    assert sample_threshold_hex(0.0) == "00000000"
    assert sample_threshold_hex(0.5) == "80000000"
    assert sample_threshold_hex(0.25) == "40000000"
    # non-dyadic rate: ceil of the exact scaled product
    assert int(sample_threshold_hex(0.2), 16) == 858993460


def test_sample_mixture_deterministic_and_mirrors_sql(spark):
    """sample_mixture keeps the same rows across repartitions, rates land
    near their targets, absent sources are dropped, and the SQL mirror
    (hex thresholds) selects the IDENTICAL id set in DuckDB."""
    import duckdb

    from dataflow_geobeam_spark.operators.split import sample_mixture, sample_sql

    df = spark.range(12000).selectExpr(
        "id AS doc_id", "concat('s', id % 4) AS source"
    )
    rates = {"s0": 1.0, "s1": 0.5, "s2": 0.2}  # s3 absent => dropped
    kept = sample_mixture(df, "doc_id", "source", rates)
    a = {(r["doc_id"], r["source"]) for r in kept.collect()}
    b = {
        (r["doc_id"], r["source"])
        for r in sample_mixture(df.repartition(13), "doc_id", "source", rates).collect()
    }
    assert a == b
    counts = {s: 0 for s in rates}
    for _id, src in a:
        assert src != "s3"
        counts[src] += 1
    assert counts["s0"] == 3000
    assert abs(counts["s1"] / 3000 - 0.5) < 0.05
    assert abs(counts["s2"] / 3000 - 0.2) < 0.05

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t AS SELECT unnest(range(12000)) AS doc_id, "
        "concat('s', unnest(range(12000)) % 4) AS source"
    )
    where = " OR ".join(
        f"(source = '{s}' AND {sample_sql('doc_id', r)})"
        for s, r in sorted(rates.items())
    )
    want = {tuple(r) for r in con.execute(
        f"SELECT doc_id, source FROM t WHERE {where}"
    ).fetchall()}
    assert a == want


def test_sample_mixture_plan_broadcasts_rates(spark):
    from dataflow_geobeam_spark.operators.split import sample_mixture

    df = spark.range(100).selectExpr("id AS doc_id", "concat('s', id % 2) AS source")
    out = sample_mixture(df, "doc_id", "source", {"s0": 0.5, "s1": 1.0})
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan and "Exchange hashpartitioning" not in plan


def test_augmentation_streaming_equals_batch(spark, tmp_path):
    """The augmentation kernels are stateless per clip and DETERMINISTIC,
    so they run UNCHANGED on a streaming scan — ingest-time augmentation:
    an availableNow pass over the micro-batched clips stream emits
    byte-for-byte the batch operators' augmented sets (the task-retry /
    replay reproducibility property, exercised through the streaming
    runtime's own re-batching)."""
    from pyspark.sql import functions as F

    from dataflow_geobeam_spark.fixtures import ensure_fixtures
    from dataflow_geobeam_spark.functions.audio import (
        with_augmented_noise,
        with_normalized_loudness,
        with_reverb,
        with_speed_perturb,
    )
    from dataflow_geobeam_spark.sources.clips import CLIPS_SCHEMA, read_clips
    from dataflow_geobeam_spark.streaming.pipeline import prepare_stream_dir

    fx = ensure_fixtures("/root/testdata/sf0.001")
    stream_dir = prepare_stream_dir(spark, fx, n_files=4)
    cols = ("clip_id", "bytes", "codec", "sr_hz")

    def noise_proj(df):
        return df.select("clip_id", "n_samples", F.md5("aug").alias("m"))

    def speed_proj(df):
        return df.select("clip_id", "speed", "n_samples", F.md5("sp").alias("m"))

    src = read_clips(spark, fx, columns=cols)
    batch_noise = {tuple(r) for r in noise_proj(with_augmented_noise(src)).collect()}
    batch_speed = {tuple(r) for r in speed_proj(with_speed_perturb(src)).collect()}

    stream = (
        spark.readStream.schema(CLIPS_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(stream_dir)
    )
    def rev_proj(df):
        return df.select("clip_id", "n_samples", F.md5("rev").alias("m"))

    def norm_proj(df):
        return df.select("clip_id", "n_samples", F.md5("norm").alias("m"))

    batch_rev = {tuple(r) for r in rev_proj(with_reverb(src)).collect()}
    batch_norm = {
        tuple(r) for r in norm_proj(with_normalized_loudness(src)).collect()
    }

    for name, build, want in (
        ("aug_noise_stream_test", lambda s: noise_proj(with_augmented_noise(s)), batch_noise),
        ("aug_speed_stream_test", lambda s: speed_proj(with_speed_perturb(s)), batch_speed),
        ("aug_rev_stream_test", lambda s: rev_proj(with_reverb(s)), batch_rev),
        ("aug_norm_stream_test", lambda s: norm_proj(with_normalized_loudness(s)), batch_norm),
    ):
        q = (
            build(stream.select(*cols))
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        got = {tuple(r) for r in spark.sql(f"select * from {name}").collect()}
        assert got == want and len(want) > 0


def test_split_column_prunes_partitions_at_scan(spark, tmp_path):
    """The 100 TB claim behind audio_corpus_split: writing the corpus
    partitioned BY the split column lets downstream readers prune at scan
    time — the executed plan for WHERE split='train' reads only the train
    directory (PartitionFilters, no post-scan filter on split)."""
    from dataflow_geobeam_spark.operators.split import assign_split

    df = spark.range(5000).selectExpr("concat('id-', id) AS k", "id AS v")
    out = str(tmp_path / "by_split")
    assign_split(df, "k").write.partitionBy("split").parquet(out)
    back = spark.read.parquet(out).where("split = 'train'")
    n = back.count()
    assert 0.88 * 5000 < n < 0.92 * 5000
    plan = back._jdf.queryExecution().executedPlan().toString()
    # the split predicate prunes at the partition level...
    assert "PartitionFilters: [isnotnull(split" in plan
    # ...and never degrades to a row-level data filter
    assert "DataFilters: []" in plan


def test_augmented_corpus_exactly_once_sink(spark, tmp_path):
    """Byte-producing augmentation through the exactly-once manifest sink:
    a paced availableNow stream writes augmented wavs epoch by epoch via
    foreachBatch; REPLAYING an already-committed epoch is a no-op, and
    the committed md5 set equals the batch operator's — the augmented-
    corpus write is idempotent under retry/restart."""
    from pyspark.sql import functions as F

    from dataflow_geobeam_spark.fixtures import ensure_fixtures
    from dataflow_geobeam_spark.functions.audio import with_augmented_noise
    from dataflow_geobeam_spark.sources.clips import CLIPS_SCHEMA, read_clips
    from dataflow_geobeam_spark.streaming.pipeline import prepare_stream_dir
    from dataflow_geobeam_spark.streaming.sink import ExactlyOnceParquetSink

    fx = ensure_fixtures("/root/testdata/sf0.001")
    stream_dir = prepare_stream_dir(spark, fx, n_files=3)
    sink = ExactlyOnceParquetSink(str(tmp_path / "aug_table"))
    cols = ("clip_id", "bytes", "codec", "sr_hz")

    def project(df):
        return df.select("clip_id", "n_samples", F.md5("aug").alias("aug_md5"))

    stream = (
        spark.readStream.schema(CLIPS_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(stream_dir)
    )
    q = (
        project(with_augmented_noise(stream.select(*cols)))
        .writeStream.foreachBatch(sink.foreach_batch())
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    committed = project(
        with_augmented_noise(read_clips(spark, fx, columns=cols))
    )
    want = {tuple(r) for r in committed.collect()}
    got = {tuple(r) for r in sink.read(spark).select("clip_id", "n_samples", "aug_md5").collect()}
    assert got == want and len(want) > 0
    # replaying an already-committed epoch must be a no-op
    epoch0 = sink.read(spark, as_of_epoch=0).select("clip_id", "n_samples", "aug_md5")
    sink.write_batch(epoch0, 0)
    again = {tuple(r) for r in sink.read(spark).select("clip_id", "n_samples", "aug_md5").collect()}
    assert again == want


def test_contamination_handbuilt_and_plan(spark):
    """Hand-built corpus: one train doc copies a 5-gram from eval, one
    shares nothing; the copy is flagged with the exact overlap count, and
    the plan broadcasts the eval grams (train side never shuffles before
    the join)."""
    from dataflow_geobeam_spark.operators.dedup import contamination

    train = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "completely unrelated words with no overlap at all here"),
        ],
        "doc_id long, text string",
    )
    eval_df = spark.createDataFrame(
        [(100, "we saw the quick brown fox jumps over a fence")],
        "doc_id long, text string",
    )
    out = contamination(train, eval_df, n=5)
    rows = {r["doc_id"]: r["n_overlap"] for r in out.collect()}
    # shared 5-grams: 'the quick brown fox jumps', 'quick brown fox jumps over'
    assert rows == {1: 2}
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "SortMergeJoin" not in plan


def test_pack_greedy_handbuilt_and_plan(spark):
    """Hand-built stream: token counts [300, 300, 300] at L=512 pack as
    doc0 -> chunk 0, doc1 -> chunk 0 (starts at 300), doc2 -> chunk 1
    (starts at 600); a second group packs independently. One exchange +
    one Window node in the executed plan."""
    from dataflow_geobeam_spark.operators.packing import pack_greedy

    df = spark.createDataFrame(
        [(1, "a", 300), (2, "a", 300), (3, "a", 300), (1, "b", 600), (2, "b", 100)],
        "doc_id long, source string, n_tok long",
    )
    out = pack_greedy(df, "source", "doc_id", "n_tok", 512)
    got = {(r["source"], r["doc_id"]): (r["cum_tokens"], r["chunk_id"]) for r in out.collect()}
    assert got == {
        ("a", 1): (300, 0),
        ("a", 2): (600, 0),
        ("a", 3): (900, 1),
        ("b", 1): (600, 0),
        ("b", 2): (700, 1),
    }
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    assert final.count("Exchange hashpartitioning") == 1
    assert final.count("Window [") == 1


def test_normalize_loudness_kernel_properties():
    """Engine kernel == independent mirror bit-for-bit; output RMS hits
    the target when the peak cap doesn't bind, and never exceeds the
    peak ceiling when it does; silent/empty clips pass through."""
    import math

    from dataflow_geobeam_spark.audio_synth import synth_pcm
    from dataflow_geobeam_spark.fixtures import independent
    from dataflow_geobeam_spark.functions.audio import normalize_loudness_np

    sr = 16000
    pcm = synth_pcm(555, sr, 400).astype(np.float64)
    for gain_in in (1.0, 0.05, 3.0):
        x = pcm * gain_in
        a = normalize_loudness_np(x)
        b = independent.normalize_loudness(x)
        assert np.array_equal(a, b)
        rms = math.sqrt(float(np.mean(a**2)))
        peak = float(np.max(np.abs(a)))
        assert peak <= 0.999 + 1e-12
        # either the target RMS is reached or the peak cap binds exactly
        assert abs(rms - 0.1) < 1e-9 or abs(peak - 0.999) < 1e-9
    z = np.zeros(100)
    assert np.array_equal(normalize_loudness_np(z), z)
    assert normalize_loudness_np(np.array([])).size == 0


def test_reverb_kernel_properties():
    """Engine reverb == independent mirror bit-for-bit; output peak never
    exceeds input peak; tails extend energy (a late impulse smears
    forward); silent/empty clips pass through; same key reproduces."""
    from dataflow_geobeam_spark.audio_synth import synth_pcm
    from dataflow_geobeam_spark.fixtures import independent
    from dataflow_geobeam_spark.functions.audio import augment_reverb_np

    sr = 16000
    pcm = synth_pcm(808, sr, 600).astype(np.float64)
    for key in (3, 777):
        a = augment_reverb_np(pcm, sr, key)
        b = independent.augment_reverb(pcm, sr, key)
        assert np.array_equal(a, b)
        assert float(np.max(np.abs(a))) <= float(np.max(np.abs(pcm))) + 1e-12
        assert not np.array_equal(a, pcm)  # the room actually did something
    assert np.array_equal(augment_reverb_np(pcm, sr, 3), augment_reverb_np(pcm, sr, 3))
    z = np.zeros(500)
    assert np.array_equal(augment_reverb_np(z, sr, 1), z)
    assert augment_reverb_np(np.array([]), sr, 1).size == 0
    # an impulse at t=0 reproduces the (gain-scaled) IR head: energy
    # appears AFTER the impulse — the causal smear reverb must have
    imp = np.zeros(2000)
    imp[0] = 0.5
    y = augment_reverb_np(imp, sr, 42)
    assert float(np.sum(np.abs(y[1:]))) > 0.0
