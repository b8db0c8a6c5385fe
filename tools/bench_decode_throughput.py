"""Per-container image decode throughput (round 5): the from-spec
decoders differ by orders of magnitude in kernel cost (PPM is a memcpy;
baseline JPEG is a sequential Huffman walk + batched integer IDCT; GIF is
a sequential LZW inflate), so the multimodal ingest story needs per-format
numbers, not one blended rate.

For each container: a /dev/shm corpus of N deterministic images (64
parquet parts = 64 scan splits — one row group per part, so the split
count never caps local[32]), then the real ingest fragment —
with_image_embeddings (decode -> NN-resize -> mean-centered pixel vector,
one mapInArrow pass) -> count — timed warm, min of ROUNDS, at local[8]
and local[32]. The format loop is interleaved across rounds (all formats
round 1, then all round 2) so a steal burst cannot sink one format's
best-of. Sequential-entropy formats still scale ACROSS images (each
payload decodes independently inside its Arrow batch), which is exactly
the claim the two parallelism levels evidence.

Writes BENCH/decode_throughput.json and splices a BASELINE.md section.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_IMAGES = int(os.environ.get("DECODE_BENCH_N", "20000"))
ROUNDS = int(os.environ.get("DECODE_BENCH_ROUNDS", "2"))
CPUS_LO = int(os.environ.get("DECODE_BENCH_LO", "8"))
CPUS_HI = int(os.environ.get("DECODE_BENCH_HI", "32"))
FORMATS = ("ppm", "bmp", "png", "jpeg", "gif", "tiff")


def build_corpus(fmt: str, n: int) -> str:
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from dataflow_geobeam_spark.audio_synth import SEED
    from dataflow_geobeam_spark.fixtures.generate import _GIF_PAL, _encode_image

    path = f"/dev/shm/decode_bench_{fmt}_{n}"
    done = os.path.join(path, "_DONE")
    if os.path.exists(done):
        return path
    os.makedirs(path, exist_ok=True)
    n_files = 64
    per = (n + n_files - 1) // n_files
    idx = 0
    for f_idx in range(n_files):
        ids, bufs = [], []
        for _ in range(min(per, n - idx)):
            i = idx
            rng = np.random.default_rng([SEED, 9_600_000 + i])
            w = 16 + int(rng.integers(0, 17))
            h = 12 + int(rng.integers(0, 13))
            if fmt == "gif":
                img = _GIF_PAL[rng.integers(0, 64, (h, w))]
            else:
                img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
            ids.append(f"img{i:07d}")
            bufs.append(
                _encode_image(img, fmt, tiff_var=(True, False))
                if fmt == "tiff"
                else _encode_image(img, fmt)
            )
            idx += 1
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


def main() -> None:
    from dataflow_geobeam_spark.fixtures.generate import EMB_IMG_H, EMB_IMG_W
    from dataflow_geobeam_spark.functions import multimodal as mm
    from dataflow_geobeam_spark.session import get_spark

    corpora = {fmt: build_corpus(fmt, N_IMAGES) for fmt in FORMATS}
    results: dict[str, dict] = {f: {} for f in FORMATS}
    for cpus in (CPUS_LO, CPUS_HI):
        spark = get_spark(
            f"decode-bench-{cpus}",
            master=f"local[{cpus}]",
            shuffle_partitions=max(cpus * 2, 8),
        )
        spark.sparkContext.setLogLevel("ERROR")

        def embed_count(fmt: str) -> float:
            imgs = spark.read.parquet(corpora[fmt])
            t0 = time.time()
            n = mm.with_image_embeddings(
                imgs, "img_id", "bytes", width=EMB_IMG_W, height=EMB_IMG_H
            ).count()
            wall = time.time() - t0
            assert n == N_IMAGES, (fmt, n)
            return wall

        for fmt in FORMATS:  # warm: spawn workers, page-cache the corpus
            embed_count(fmt)
        samples: dict[str, list[float]] = {f: [] for f in FORMATS}
        for _ in range(ROUNDS):  # interleaved min-of-N
            for fmt in FORMATS:
                samples[fmt].append(round(embed_count(fmt), 2))
        spark.stop()
        for fmt in FORMATS:
            best = min(samples[fmt])
            results[fmt][f"times_{cpus}"] = samples[fmt]
            results[fmt][f"best_{cpus}"] = best
            results[fmt][f"imgs_per_sec_{cpus}"] = round(N_IMAGES / best, 1)

    for fmt in FORMATS:
        r = results[fmt]
        speed = r[f"best_{CPUS_LO}"] / r[f"best_{CPUS_HI}"]
        r["speedup"] = round(speed, 2)
        r["efficiency"] = round(speed / (CPUS_HI / CPUS_LO), 3)
    out = {"n_images": N_IMAGES, "cpus": [CPUS_LO, CPUS_HI], "formats": results}
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/decode_throughput.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))

    header = "## Image decode throughput by container (round 5)"
    lines = [
        header,
        "",
        f"`tools/bench_decode_throughput.py`, {N_IMAGES:,} images per format, "
        f"decode -> NN-resize -> pixel embedding (`with_image_embeddings`), "
        f"warm, interleaved min-of-{ROUNDS}:",
        "",
        f"| container | imgs/s local[{CPUS_LO}] | imgs/s local[{CPUS_HI}] | {CPUS_LO}->{CPUS_HI} speedup | efficiency |",
        "|---|---|---|---|---|",
    ]
    for fmt in FORMATS:
        r = results[fmt]
        lines.append(
            f"| {fmt} | {r[f'imgs_per_sec_{CPUS_LO}']:,.0f} | "
            f"{r[f'imgs_per_sec_{CPUS_HI}']:,.0f} | {r['speedup']}x | {r['efficiency']} |"
        )
    lines += [
        "",
        "PPM/BMP are near-memcpy: their walls sit at the scheduler floor",
        "(~0.4 s for 64 tasks + count), so their speedup column measures",
        "overhead, not decode — read their imgs/s as a lower bound. PNG",
        "pays zlib + unfilter; JPEG pays a sequential Huffman walk (the",
        "IDCT itself is one batched int64 einsum per component); GIF pays",
        "a sequential LZW inflate; TIFF rows here are PackBits-compressed",
        "(near-memcpy to inflate). Those entropy stages are per-IMAGE",
        "sequential but embarrassingly parallel across images — the",
        "N->4N column shows it where the wall is long enough to matter",
        "(JPEG, the heaviest kernel, scales best). The at-scale join",
        "evidence is the 200k-image near-dup bench above; this table is",
        "the per-container decode cost model a capacity plan needs.",
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
