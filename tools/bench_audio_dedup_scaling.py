"""Audio near-dup pipeline scaling (round 5): the fingerprint dedup's
own N->4N evidence row, matching the dedup/image/ANN scale points.

Job = the full audio_near_dups pipeline over a 100k-clip planted-dupe
corpus (ensure_audio_dupes at bench size — parallel 1000-row block
generation, 256-row parquet groups so the scan splits — cached on
tmpfs): ONE
mapInArrow decode+FFT+robust-hash pass, (pos, token) sub-key self-join
with the hot-key cap, pure-Catalyst BER verify. Decode+FFT dominates and
is embarrassingly parallel; the join shuffles token keys only.

Levels local[2] vs local[8] (this host's ~8 real cores; same rationale
as every other scaling bench here). Each timed sample is BRACKETED by
single-proc numpy quietness probes (pre-run gate + post-run check;
wave-contaminated samples are discarded but recorded) — the
bench_ann_scaling discipline.

Writes BENCH/audio_dedup_scaling.json and splices the
"## Audio dedup scaling" section of BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

for _v in ("OPENBLAS_NUM_THREADS", "OMP_NUM_THREADS", "MKL_NUM_THREADS"):
    os.environ[_v] = "1"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_CLIPS = 100_000
BENCH_ROOT = "/dev/shm/audio_dedup_bench"

_PROBE_BEST = [None]


def cpu_probe() -> float:
    import numpy as np

    a = np.ones((2000, 64))
    b = np.ones((64, 256))
    t0 = time.time()
    for _ in range(300):
        (a @ b).argmax(axis=1)
    return time.time() - t0


def wait_for_quiet(max_wait_sec: float = 600.0, factor: float = 1.5) -> None:
    deadline = time.time() + max_wait_sec
    while True:
        p = cpu_probe()
        if _PROBE_BEST[0] is None or p < _PROBE_BEST[0]:
            _PROBE_BEST[0] = p
        if p <= _PROBE_BEST[0] * factor or time.time() > deadline:
            if p > _PROBE_BEST[0] * factor:
                print(f"probe still loud ({p:.2f}s); running anyway", flush=True)
            return
        print(f"host loud (probe {p:.2f}s vs best {_PROBE_BEST[0]:.2f}s); waiting", flush=True)
        time.sleep(20)


def build_corpus() -> str:
    from dataflow_geobeam_spark.fixtures.generate import ensure_audio_dupes

    t0 = time.time()
    path = ensure_audio_dupes("sf0.1", root=BENCH_ROOT, n_override=N_CLIPS)
    print(f"corpus: {path} ({time.time() - t0:.0f}s)", flush=True)
    return path


def run_at(cpus: int, corpus_path: str) -> tuple[float, int]:
    from pyspark.sql import functions as F

    from dataflow_geobeam_spark.functions.audio import with_fingerprints
    from dataflow_geobeam_spark.operators.dedup import audio_near_dup_pairs
    from dataflow_geobeam_spark.session import get_spark

    spark = get_spark(
        f"audio-dedup-{cpus}", master=f"local[{cpus}]", shuffle_partitions=max(cpus * 4, 8)
    )
    spark.sparkContext.setLogLevel("ERROR")
    df = spark.read.parquet(corpus_path).select("clip_id", "bytes", "codec", "sr_hz")
    # warm-in: worker pool + codegen on a slice
    fp_w = with_fingerprints(df.limit(32 * cpus)).localCheckpoint(eager=True)
    audio_near_dup_pairs(fp_w).write.format("noop").mode("overwrite").save()
    t0 = time.time()
    fp = with_fingerprints(df).localCheckpoint(eager=True)
    n_pairs = audio_near_dup_pairs(fp).count()
    sec = round(time.time() - t0, 1)
    spark.stop()
    return sec, int(n_pairs)


MD_HEADER = "## Audio dedup scaling"


def rewrite_baseline_md(out: dict) -> None:
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
    sc = out["scaling"]
    md = f"""
{MD_HEADER} (round 5)

Full `audio_near_dups` pipeline (mapInArrow decode+FFT+robust-hash ->
capped (pos, token) sub-key self-join -> Catalyst BER verify) over
{out["n_clips"]:,} planted-dupe clips ({out["n_pairs"]:,} near-dup pairs found;
tools/bench_audio_dedup_scaling.py, probe-bracketed samples like the ANN
bench):

| input | local[2] (N) | local[8] (4N) | speedup | efficiency |
|---|---|---|---|---|
| {out["n_clips"]:,} clips | {sc["best_2"]} s ({sc["clips_per_sec_2"]:,.0f} clips/s) | {sc["best_8"]} s ({sc["clips_per_sec_8"]:,.0f} clips/s) | {sc["speedup"]}x | **{sc["efficiency"]:.2f}** |

Clean samples: local[2] {sc["times_2"]}, local[8] {sc["times_8"]} (sec);
raw (incl. discarded wave-contaminated) in audio_dedup_scaling.json.
Decode+FFT dominates and parallelizes row-locally; only 16-bit token
keys and candidate pairs cross the shuffle.
"""
    with open(path, "w") as f:
        f.write(head + md.lstrip("\n") + ("\n" + tail if tail else ""))


def main() -> None:
    corpus_path = build_corpus()
    t2, t8, raw2, raw8 = [], [], [], []
    n_pairs = 0
    attempts = 0
    while (len(t2) < 3 or len(t8) < 3) and attempts < 10:
        attempts += 1
        for cpus, clean_l, raw_l in ((2, t2, raw2), (8, t8, raw8)):
            wait_for_quiet()
            s, n_pairs = run_at(cpus, corpus_path)
            post = cpu_probe()
            clean = post <= _PROBE_BEST[0] * 1.5
            raw_l.append({"sec": s, "clean": clean})
            if clean:
                clean_l.append(s)
            else:
                print(f"local[{cpus}] sample {s}s DISCARDED (post-probe {post:.2f}s)", flush=True)
    if not t2:
        t2 = [r["sec"] for r in raw2]
    if not t8:
        t8 = [r["sec"] for r in raw8]
    best2, best8 = min(t2), min(t8)
    out = {
        "n_clips": N_CLIPS,
        "n_pairs": n_pairs,
        "scaling": {
            "best_2": best2,
            "best_8": best8,
            "times_2": t2,
            "times_8": t8,
            "raw_2": raw2,
            "raw_8": raw8,
            "clips_per_sec_2": round(N_CLIPS / best2, 1),
            "clips_per_sec_8": round(N_CLIPS / best8, 1),
            "speedup": round(best2 / best8, 2),
            "efficiency": round(best2 / (4 * best8), 3),
        },
    }
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/audio_dedup_scaling.json", "w") as f:
        json.dump(out, f, indent=1)
    rewrite_baseline_md(out)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
