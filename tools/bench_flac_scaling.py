"""Real-FLAC ingest throughput at two parallelism levels (round 5).

The FLAC bitstream is sequential per clip (Rice/unary bit walk), so the
100 TB question is whether decode parallelizes cleanly ACROSS clips in
the mapInArrow kernel. Corpus: deterministic FLAC clips (the fixture
generator's content regimes — tonal, noisy, constant, stereo left-side,
blocksize/partition variants) replicated id-rewritten to N rows across
64 parquet parts on tmpfs; pipeline: with_flac_pcm16 -> count (mapInArrow
runs the full kernel regardless of downstream projection). Warm, then
interleaved min-of-ROUNDS at local[LO] and local[HI]. Reports clips/s
plus the realtime factor (decoded audio-seconds per wall-second).

Writes BENCH/flac_scaling.json and splices a BASELINE.md section.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_CLIPS = int(os.environ.get("FLAC_BENCH_N", "20000"))
ROUNDS = int(os.environ.get("FLAC_BENCH_ROUNDS", "3"))
CPUS_LO = int(os.environ.get("FLAC_BENCH_LO", "8"))
CPUS_HI = int(os.environ.get("FLAC_BENCH_HI", "32"))
N_DISTINCT = 480  # distinct payloads; decode cost is content-dependent, id-invariant


def build_corpus(n: int) -> tuple[str, float]:
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from dataflow_geobeam_spark.fixtures import independent
    from dataflow_geobeam_spark.fixtures.generate import _flac_clip_pcm16

    path = f"/dev/shm/flac_bench_{n}"
    done = os.path.join(path, "_DONE")
    meta = os.path.join(path, "_SECONDS")
    if os.path.exists(done):
        return path, float(open(meta).read())
    os.makedirs(path, exist_ok=True)
    payloads, seconds = [], 0.0
    for i in range(N_DISTINCT):
        sr = (16000, 22050, 8000)[i % 3]
        ns = int(sr * (0.25 + ((i * 37) % 20) / 10.0))
        pcm = _flac_clip_pcm16(i, sr, ns)
        blocksize = (192, 1000, 4096)[(i // 3) % 3]
        p_order = (0, 2)[(i // 9) % 2]
        if i % 7 == 2:
            right = np.round(pcm.astype(np.float64) * 0.7).astype(np.int16)
            buf = independent.flac_bytes(
                np.stack([pcm, right], axis=1), sr,
                blocksize=blocksize, stereo_mode="leftside", partition_order=p_order,
            )
        else:
            buf = independent.flac_bytes(
                pcm, sr, blocksize=blocksize, partition_order=p_order
            )
        payloads.append(buf)
        seconds += ns / sr
    total_seconds = seconds * (n / N_DISTINCT)
    n_files = 64
    per = (n + n_files - 1) // n_files
    idx = 0
    for f_idx in range(n_files):
        ids, bufs = [], []
        for _ in range(min(per, n - idx)):
            ids.append(f"fl{idx:07d}")
            bufs.append(payloads[idx % N_DISTINCT])
            idx += 1
        pq.write_table(
            pa.Table.from_pydict(
                {"clip_id": pa.array(ids), "bytes": pa.array(bufs, type=pa.binary())}
            ),
            os.path.join(path, f"part-{f_idx:05d}.parquet"),
            compression="zstd",
        )
    with open(meta, "w") as f:
        f.write(str(total_seconds))
    with open(done, "w") as f:
        f.write("ok")
    return path, total_seconds


def main() -> None:
    from dataflow_geobeam_spark.functions.audio import with_flac_pcm16
    from dataflow_geobeam_spark.session import get_spark

    corpus, audio_seconds = build_corpus(N_CLIPS)
    results: dict = {}
    for cpus in (CPUS_LO, CPUS_HI):
        spark = get_spark(
            f"flac-bench-{cpus}",
            master=f"local[{cpus}]",
            shuffle_partitions=max(cpus * 2, 8),
        )
        spark.sparkContext.setLogLevel("ERROR")
        clips = spark.read.parquet(corpus)

        def run() -> float:
            t0 = time.time()
            n = with_flac_pcm16(clips).where("pcm16 is not null").count()
            wall = time.time() - t0
            assert n == N_CLIPS, n
            return wall

        run()  # warm
        samples = [round(run(), 2) for _ in range(ROUNDS)]
        spark.stop()
        best = min(samples)
        results[f"times_{cpus}"] = samples
        results[f"best_{cpus}"] = best
        results[f"clips_per_sec_{cpus}"] = round(N_CLIPS / best, 1)
        results[f"realtime_factor_{cpus}"] = round(audio_seconds / best, 1)

    speed = results[f"best_{CPUS_LO}"] / results[f"best_{CPUS_HI}"]
    results["speedup"] = round(speed, 2)
    results["efficiency"] = round(speed / (CPUS_HI / CPUS_LO), 3)
    out = {"n_clips": N_CLIPS, "audio_seconds": round(audio_seconds, 1),
           "cpus": [CPUS_LO, CPUS_HI], **results}
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/flac_scaling.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))

    header = "## Real-FLAC decode scaling (round 5)"
    lines = [
        header,
        "",
        f"`tools/bench_flac_scaling.py`: {N_CLIPS:,} clips "
        f"({audio_seconds:,.0f} s of audio; fixture content regimes incl. "
        "stereo left-side, blocksize 192/1000/4096, Rice partition orders), "
        f"with_flac_pcm16 -> count, warm min-of-{ROUNDS}:",
        "",
        "| parallelism | best sec | clips/s | x realtime |",
        "|---|---|---|---|",
        f"| local[{CPUS_LO}] (N) | {results[f'best_{CPUS_LO}']} | "
        f"{results[f'clips_per_sec_{CPUS_LO}']:,.0f} | "
        f"{results[f'realtime_factor_{CPUS_LO}']:,.0f}x |",
        f"| local[{CPUS_HI}] (4N) | {results[f'best_{CPUS_HI}']} | "
        f"{results[f'clips_per_sec_{CPUS_HI}']:,.0f} | "
        f"{results[f'realtime_factor_{CPUS_HI}']:,.0f}x |",
        "",
        f"Speedup {results['speedup']}x -> N->4N efficiency "
        f"{results['efficiency']}. The per-clip bit walk is sequential;",
        "clips decode independently inside each Arrow batch, so the scale",
        "knob at 100 TB is executor count, exactly like the JPEG/GIF",
        "entropy decoders.",
        "",
    ]
    md_path = "BENCH/BASELINE.md"
    text = open(md_path).read() if os.path.exists(md_path) else ""
    if header in text:
        pre = text[: text.index(header)]
        rest = text[text.index(header) :]
        nxt = rest.find("\n## ", 1)
        text = pre + "\n".join(lines) + (rest[nxt:] if nxt != -1 else "")
    else:
        text = text.rstrip() + "\n\n" + "\n".join(lines)
    with open(md_path, "w") as f:
        f.write(text)


if __name__ == "__main__":
    main()
