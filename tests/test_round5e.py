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
