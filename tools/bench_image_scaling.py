"""Multimodal dedup scaling: the image near-dup pipeline (from-spec
decode -> pixel embedding -> LSH self-join) at N and 4N parallelism on a
replicated image corpus (round 4).

Same evidence pattern as tools/bench_dedup_scaling.py: deterministic
corpus on tmpfs split into 64 part files (one small file = one scan split
= serialized decode stage — the trap that bench measured), interleaved
min-of-N at local[2] vs local[8].

n_planes = ceil(log2 N) + 1 here (vs the query default 8): the
finer-buckets knob must track corpus size — occupancy ~ N/2^n_planes and
candidate volume ~ N * n_tables * occupancy / 2, so log-scaled planes
keep the self-join LINEAR in N (measured at 50k images: 12 planes ->
~12 docs/bucket -> 4.4M candidates, exact-verify dominated both
parallelism levels at ~2 min; 16 planes -> ~300k candidates, 12x
faster, same 4,701 pairs). Planted near-identical pairs (cosine
~0.9995) still collide with probability ~1 (p_plane ~ 0.993 per plane,
pair-miss < 1e-14 over 16 tables at any log-scaled plane count here).

Writes BENCH/image_scaling.json and splices a BASELINE.md section.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_IMAGES = int(os.environ.get("IMG_BENCH_N", "200000"))
ROUNDS = int(os.environ.get("IMG_BENCH_ROUNDS", "2"))


def planes_for(n: int) -> int:
    """n_planes = ceil(log2 N) + 1: bucket occupancy ~0.5, so candidate
    volume ~ 4N regardless of corpus size — the knob scales with log N,
    which is the whole 100 TB story for sign-sketch LSH self-joins."""
    import math

    return max(12, math.ceil(math.log2(max(2, n))) + 1)


def build_corpus(n: int) -> str:
    """tmpfs dir of 64 parquet parts: (img_id, bytes) — deterministic
    noise images cycling ppm/bmp/pgm, ~11% planted near-dups (i%9==4 is a
    +-2-noise copy of i-1), ~8% truncated (decode must drop them)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from dataflow_geobeam_spark.audio_synth import SEED
    from dataflow_geobeam_spark.fixtures import independent
    from dataflow_geobeam_spark.fixtures.generate import _IMG_FMTS, _encode_image

    path = f"/dev/shm/image_corpus_{n}"
    done = os.path.join(path, "_DONE")
    if os.path.exists(done):
        return path
    os.makedirs(path, exist_ok=True)
    n_files = 64
    per = (n + n_files - 1) // n_files
    prev_img, prev_fmt = None, None
    idx = 0
    for f_idx in range(n_files):
        ids, bufs = [], []
        for _ in range(min(per, n - idx)):
            i = idx
            rng = np.random.default_rng([SEED, 9_500_000 + i])
            if i % 9 == 4 and prev_img is not None:
                noise = rng.integers(-2, 3, prev_img.shape)
                img = np.clip(prev_img.astype(np.int16) + noise, 0, 255).astype(np.uint8)
                fmt = prev_fmt
                if fmt == "pgm":
                    img = np.repeat(img[:, :, :1], 3, axis=2)
            else:
                w = 16 + int(rng.integers(0, 33))
                h = 12 + int(rng.integers(0, 25))
                fmt = _IMG_FMTS[i % 3]
                if fmt == "pgm":
                    gray = rng.integers(0, 256, (h, w), dtype=np.uint8)
                    img = np.repeat(gray[:, :, None], 3, axis=2)
                else:
                    img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
            buf = _encode_image(img, fmt)
            prev_img, prev_fmt = img, fmt
            if i % 13 == 5:
                buf = buf[: max(8, int(len(buf) * 0.6))]
            ids.append(f"img{i:07d}")
            bufs.append(buf)
            idx += 1
        if not ids:
            break
        pq.write_table(
            pa.Table.from_pydict(
                {"img_id": pa.array(ids), "bytes": pa.array(bufs, type=pa.binary())}
            ),
            os.path.join(path, f"part-{f_idx:05d}.parquet"),
            compression="zstd",
        )
    with open(done, "w") as f:
        f.write("ok")
    return path


def run_at(cpus: int, corpus: str) -> tuple[float, int]:
    from dataflow_geobeam_spark.fixtures.generate import EMB_IMG_H, EMB_IMG_W
    from dataflow_geobeam_spark.functions import multimodal as mm
    from dataflow_geobeam_spark.operators.similarity import near_dup_pairs
    from dataflow_geobeam_spark.session import get_spark

    spark = get_spark(
        f"img-scaling-{cpus}", master=f"local[{cpus}]", shuffle_partitions=max(cpus * 4, 8)
    )
    spark.sparkContext.setLogLevel("ERROR")
    imgs = spark.read.parquet(corpus)

    def pipeline():
        emb = mm.with_image_embeddings(
            imgs, "img_id", "bytes", width=EMB_IMG_W, height=EMB_IMG_H
        ).persist()
        out = near_dup_pairs(
            emb, "_id", "embedding", threshold=0.9,
            dim=EMB_IMG_W * EMB_IMG_H * 3, n_planes=planes_for(N_IMAGES), n_tables=16,
        )
        n = out.count()
        emb.unpersist()
        return n

    pipeline()  # warm-in
    t0 = time.time()
    n_pairs = pipeline()
    wall = time.time() - t0
    spark.stop()
    return round(wall, 1), n_pairs


MD_HEADER = "## Multimodal dedup scaling (round 4)"


def main() -> None:
    corpus = build_corpus(N_IMAGES)
    runs: dict[int, list[float]] = {2: [], 8: []}
    pairs = None
    for _ in range(ROUNDS):
        for cpus in (2, 8):
            wall, n_pairs = run_at(cpus, corpus)
            runs[cpus].append(wall)
            assert pairs is None or pairs == n_pairs  # determinism across levels
            pairs = n_pairs
    b2, b8 = min(runs[2]), min(runs[8])
    out = {
        "n_images": N_IMAGES,
        "n_pairs": pairs,
        "times_2": runs[2],
        "times_8": runs[8],
        "best_2": b2,
        "best_8": b8,
        "images_per_sec_2": round(N_IMAGES / b2, 1),
        "images_per_sec_8": round(N_IMAGES / b8, 1),
        "speedup": round(b2 / b8, 2),
        "efficiency": round(b2 / b8 / 4.0, 3),
    }
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/image_scaling.json", "w") as f:
        json.dump(out, f, indent=1)

    path = "BENCH/BASELINE.md"
    head, tail = "", ""
    if os.path.exists(path):
        content = open(path).read()
        pre, _, rest = content.partition(MD_HEADER)
        head = pre.rstrip() + "\n"
        if rest:
            nxt = rest.find("\n## ")
            if nxt != -1:
                tail = rest[nxt + 1 :]
    md = f"""
{MD_HEADER}

The full image near-dup pipeline (from-spec PPM/PGM/BMP decode ->
mean-centered pixel embedding, one mapInArrow pass -> LSH bucket
self-join with exact-cosine verify) over {N_IMAGES:,} deterministic
images (~11% planted near-dups, ~8% truncated payloads dropped at
decode), interleaved min-of-{ROUNDS} (tools/bench_image_scaling.py;
n_planes = ceil(log2 N) + 1 = {planes_for(N_IMAGES)} — the finer-buckets
knob scales as log2(N) so candidate volume stays linear in N, see the
tool docstring for the measured 12-plane counterexample):

| parallelism | best sec | images/sec | all runs (sec) |
|---|---|---|---|
| local[2] (N)  | {b2} | {out["images_per_sec_2"]:,} | {runs[2]} |
| local[8] (4N) | {b8} | {out["images_per_sec_8"]:,} | {runs[8]} |

Speedup {out["speedup"]}x -> **N->4N efficiency {out["efficiency"]:.2f}**;
{pairs:,} near-dup pairs found, identical at both parallelism levels
(determinism check built into the bench).
"""
    with open(path, "w") as f:
        f.write(head + md + ("\n" + tail if tail else ""))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
