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
