"""F0 / pitch estimation (round 5c): bit-exactness vs the independent
scalar-walk mirror, pure-tone physics (exact lag recovery, octave
safety), voicing edge cases, and the Spark kernel's NULL semantics.

Reference parity: the reference (Beam ingestion glue) has no feature
extraction; this is north-rule / training-pipeline scope.
"""

from __future__ import annotations

import numpy as np


def test_pitch_bit_identical_to_mirror():
    from dataflow_geobeam_spark.audio_synth import synth_pcm
    from dataflow_geobeam_spark.fixtures import independent as ind
    from dataflow_geobeam_spark.functions.audio import pitch_stats_np

    for i, sr, dur in [(2, 8000, 900), (4, 44100, 2500), (6, 22050, 333), (1, 16000, 2000)]:
        p = synth_pcm(i, sr, dur)
        got, want = pitch_stats_np(p, sr), ind.pitch_stats(p, sr)
        assert got is not None and want is not None
        assert np.array_equal(got, want)  # bit-exact, no tolerance
        assert got.shape == (2,)
    # sub-segment clip (< 640 samples at 16 kHz) -> None / NULL row
    assert pitch_stats_np(synth_pcm(9, 16000, 30), 16000) is None


def test_pitch_pure_tone_physics():
    """A pure tone at f with sr/f integral must recover EXACTLY f (the
    first local autocorrelation peak sits on the true period), fully
    voiced — and never the half-frequency octave error."""
    from dataflow_geobeam_spark.fixtures import independent as ind
    from dataflow_geobeam_spark.functions.audio import pitch_stats_np

    t = np.arange(32000) / 16000.0
    for f in [100.0, 200.0, 320.0]:
        tone = 0.5 * np.sin(2 * np.pi * f * t)
        got = pitch_stats_np(tone, 16000)
        assert got[0] == f and got[1] == 1.0
        assert np.array_equal(got, ind.pitch_stats(tone, 16000))
    # silence: zero energy -> zero voiced frames, f0 reported as 0
    sil = np.zeros(32000)
    got = pitch_stats_np(sil, 16000)
    assert got[0] == 0.0 and got[1] == 0.0
    # white-ish noise (deterministic LCG): unvoiced-dominated
    x = np.empty(32000)
    s = 12345
    for i in range(x.size):
        s = (1103515245 * s + 12345) % (1 << 31)
        x[i] = s / float(1 << 31) - 0.5
    got = pitch_stats_np(x, 16000)
    assert got[1] < 0.5


def test_pitch_spark_kernel_nulls(spark):
    from dataflow_geobeam_spark.audio_synth import synth_pcm
    from dataflow_geobeam_spark.fixtures import independent as ind
    from dataflow_geobeam_spark.functions.audio import with_pitch_stats

    pcm = synth_pcm(3, 8000, 500)
    rows = [
        ("a", ind.encode(pcm, 8000, "wav"), "wav", 8000),
        ("b", ind.encode(synth_pcm(9, 16000, 30), 16000, "wav"), "wav", 16000),
        ("c", b"junk", "wav", 8000),
    ]
    df = spark.createDataFrame(
        rows, "clip_id string, bytes binary, codec string, sr_hz int"
    )
    got = {r.clip_id: r.pitch_stats for r in with_pitch_stats(df).collect()}
    assert got["a"] is not None and len(got["a"]) == 2
    want = ind.pitch_stats(pcm, 8000)
    assert got["a"] == list(np.floor(want * 1e6 + 0.5) / 1e6)
    assert got["b"] is None and got["c"] is None
