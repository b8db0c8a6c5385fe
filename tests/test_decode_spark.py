"""Integration: the engine's vectorized decode vs the generation-time oracle.

This is the per-row invariant of BASELINE.json input_hint: decoded PCM
allclose (SNR >= 30 dB) + metric equality, per clip, engine-vs-oracle.
"""

import numpy as np
from pyspark.sql import functions as F

from dataflow_geobeam_spark.audio_synth import snr_db, synth_pcm
from dataflow_geobeam_spark.functions.decode import with_decoded_metrics, with_decoded_pcm
from dataflow_geobeam_spark.functions.validity import filter_invalid
from dataflow_geobeam_spark.sources.clips import read_clips, read_golden


def test_decode_metrics_match_oracle_per_row(spark, fixture_dir):
    engine = with_decoded_metrics(read_clips(spark, fixture_dir)).select(
        "clip_id", "decode_ok", "n_samples", "rms", "peak"
    )
    golden = read_golden(spark, fixture_dir).select(
        "clip_id",
        F.col("decode_ok").alias("g_ok"),
        F.col("n_samples").alias("g_n"),
        F.col("rms").alias("g_rms"),
        F.col("peak").alias("g_peak"),
    )
    j = engine.join(golden, "clip_id", "full").collect()
    assert len(j) == engine.count()
    for r in j:
        assert r.decode_ok == r.g_ok, r.clip_id
        if r.decode_ok:
            # identical decode kernel both sides => bit-identical doubles
            assert r.n_samples == r.g_n, r.clip_id
            assert r.rms == r.g_rms, r.clip_id
            assert r.peak == r.g_peak, r.clip_id


def test_decoded_pcm_snr_vs_source_signal(spark, fixture_dir):
    """Decode through the FULL Spark path and compare PCM to the synth source
    (not the golden decode): SNR >= 30 dB for every valid clip sampled."""
    df = (
        filter_invalid(with_decoded_metrics(read_clips(spark, fixture_dir), drop_bytes=False))
        .select("clip_id", "bytes", "codec", "sr_hz", "dur_ms")
        .limit(40)
    )
    rows = with_decoded_pcm(df).collect()
    assert rows
    for r in rows:
        i = int(r.clip_id[2:])
        src = synth_pcm(i, r.sr_hz, r.dur_ms)
        got = np.asarray(r.pcm, dtype=np.float32)
        assert got.shape == src.shape, r.clip_id
        assert snr_db(src, got) >= 30.0, r.clip_id


def test_filter_invalid_matches_golden_valid_set(spark, fixture_dir):
    engine_ids = {
        r.clip_id
        for r in filter_invalid(with_decoded_metrics(read_clips(spark, fixture_dir)))
        .select("clip_id")
        .collect()
    }
    golden_ids = {
        r.clip_id for r in read_golden(spark, fixture_dir).where("valid").select("clip_id").collect()
    }
    assert engine_ids == golden_ids


def test_decode_handles_null_bytes_row(spark):
    from dataflow_geobeam_spark.sources.clips import CLIPS_SCHEMA

    rows = [("aa000000000001", None, 8000, 250, "wav", "t", None)]
    df = spark.createDataFrame(rows, CLIPS_SCHEMA)
    out = with_decoded_metrics(df).collect()
    assert len(out) == 1 and out[0].decode_ok is False
