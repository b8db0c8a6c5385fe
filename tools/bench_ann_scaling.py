"""ANN (IVF-PQ) scaling at 200k+ vectors (round-5 VERDICT #6).

Dedup has a 200k-doc N->4N point; this produces the matching evidence for
the ANN path: ``ivfpq_topk`` (cells + PQ codes + ADC candidate scoring +
exact refine) at two parallelism levels on an 800k-vector corpus, with

* N->4N scaling efficiency (target >= 0.8) at local[2] vs local[8] — the
  same levels as bench_dedup_scaling.py, both inside this host's ~8 real
  cores (the VM advertises 32 vCPUs but delivers ~8; local[8]->local[32]
  measures oversubscription, not scaling — measured 0.46x "speedup"),
* recall of the exact top-5 vs brute force over the same queries,
* candidate volume per query (what the cell probe admits — the number the
  plan shape promises stays ~n_probe/n_cells of the corpus).

Corpus: the sf0.1 embeddings table (2k x 64) replicated 400x with seeded
per-replica gaussian perturbation (0.1 sigma) and ``refine`` sized to
the replica multiplicity (400): a base vector's 400 perturbed twins are
the true neighbors, and they tie closely in ADC score, so the exact
re-rank depth must cover the near-tie cluster — the standard IVF-PQ
sizing rule. A numpy sweep (recall decomposed into cell-probe recall vs
shortlist recall) picked the operating point: sigma 0.05 gives cell
recall 1.0 but identical PQ codes for all twins (refine-50 clips ties:
recall 0.29); sigma 0.5 spreads clusters across more cells than
n_probe/n_cells covers (cell recall 0.47); sigma 0.1 + refine 400 →
recall 0.95. Built once with numpy/pyarrow onto
tmpfs as 64 part files (one small file would serialize the scan — see
bench_dedup_scaling.py for the measured cliff).

Timing discipline: this Firecracker host is oversubscribed in waves that
are INVISIBLE to guest steal accounting (CPU time == wall while real
throughput drops up to ~18x; /proc/stat steal stays ~0) — so each timed
round is gated on a single-proc numpy probe and the reported number is
the min across interleaved rounds (capability, per BENCH/BASELINE.md
conventions).

Writes BENCH/ann_scaling.json and splices the "## ANN scaling" section of
BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

# Pin BLAS to one thread BEFORE numpy loads, here in the driver and (via env
# inheritance through the JVM + daemon_preload's setdefault) in every Python
# worker. Unpinned, OpenBLAS spawns an nproc-wide pool per worker: local[2]
# silently uses the whole machine for the assign/score matmuls — the 0.58
# "efficiency" first recorded here was that artifact, not a plan property —
# and the thread thrash is itself a measured 3x slowdown on this host.
for _v in ("OPENBLAS_NUM_THREADS", "OMP_NUM_THREADS", "MKL_NUM_THREADS"):
    os.environ[_v] = "1"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPLICATE = 400
SIGMA = 0.1
REFINE = 400  # re-rank depth sized to the replica multiplicity (see above)
DIM = 64
N_CELLS = 256
N_PROBE = 16
N_QUERIES = 400      # timed runs: a production-sized query batch
N_RECALL_QUERIES = 20  # brute-force recall is measured on a subsample


def build_corpus() -> tuple[str, int]:
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as apq

    path = f"/dev/shm/ann_corpus_{REPLICATE}x_s{int(SIGMA * 100)}"
    done = os.path.join(path, "_DONE")
    if os.path.exists(done):
        n = sum(
            apq.ParquetFile(os.path.join(path, f)).metadata.num_rows
            for f in os.listdir(path)
            if f.endswith(".parquet")
        )
        return path, n
    src = apq.read_table(
        os.path.join(SF_DIR, "embeddings.parquet"), columns=["vec_id", "embedding"]
    )
    ids0 = np.asarray(src.column("vec_id").to_pylist(), dtype=np.int64)
    v0 = np.asarray(src.column("embedding").to_pylist(), dtype=np.float32)
    ids, vecs = [], []
    for r in range(REPLICATE):
        rng = np.random.default_rng([4242, r])
        noise = (
            np.zeros_like(v0)
            if r == 0
            else (SIGMA * rng.standard_normal(v0.shape)).astype(np.float32)
        )
        ids.append(ids0 * 1000 + r)
        vecs.append(v0 + noise)
    ids = np.concatenate(ids)
    vecs = np.concatenate(vecs)
    n = len(ids)
    os.makedirs(path, exist_ok=True)
    n_files = 64
    per = (n + n_files - 1) // n_files
    for k in range(n_files):
        lo, hi = k * per, min((k + 1) * per, n)
        if lo >= hi:
            break
        emb = pa.FixedSizeListArray.from_arrays(
            pa.array(vecs[lo:hi].reshape(-1)), DIM
        ).cast(pa.list_(pa.float32()))
        apq.write_table(
            pa.Table.from_arrays([pa.array(ids[lo:hi]), emb], ["vec_id", "embedding"]),
            os.path.join(path, f"part-{k:05d}.parquet"),
            compression="zstd",
        )
    with open(done, "w") as f:
        f.write("ok")
    return path, n


_PROBE_BEST = [None]


def cpu_probe() -> float:
    """Single-proc numpy probe (~0.3 s on a quiet host): fixed matmul work
    whose wall time tracks the host's real per-core throughput. Guest
    steal accounting is blind to this host's oversubscription waves, so
    wall time of fixed work is the only usable quietness signal."""
    import numpy as np

    a = np.ones((2000, DIM))
    b = np.ones((DIM, 256))
    t0 = time.time()
    for _ in range(300):
        (a @ b).argmax(axis=1)
    return time.time() - t0


def wait_for_quiet(max_wait_sec: float = 600.0, factor: float = 1.5) -> None:
    """Block until the probe runs within ``factor`` of the best probe seen
    this invocation (or until ``max_wait_sec`` passes — the interleaved
    min-of-N still bounds the damage if we have to run loud)."""
    deadline = time.time() + max_wait_sec
    while True:
        p = cpu_probe()
        if _PROBE_BEST[0] is None or p < _PROBE_BEST[0]:
            _PROBE_BEST[0] = p
        if p <= _PROBE_BEST[0] * factor or time.time() > deadline:
            if p > _PROBE_BEST[0] * factor:
                print(f"probe still loud ({p:.2f}s vs best {_PROBE_BEST[0]:.2f}s); running anyway", flush=True)
            return
        print(f"host loud (probe {p:.2f}s vs best {_PROBE_BEST[0]:.2f}s); waiting", flush=True)
        time.sleep(20)


def run_at(cpus: int, corpus_path: str, timed_runs: int = 2) -> list[float]:
    from pyspark.sql import functions as F

    from dataflow_geobeam_spark.operators.similarity import ivfpq_topk
    from dataflow_geobeam_spark.session import get_spark

    spark = get_spark(
        f"ann-scaling-{cpus}", master=f"local[{cpus}]", shuffle_partitions=max(cpus * 4, 8)
    )
    spark.sparkContext.setLogLevel("ERROR")
    emb = spark.read.parquet(corpus_path)
    queries = emb.where(F.col("vec_id") % 1000 == 0).where(
        F.col("vec_id") < N_QUERIES * 1000
    )
    # warm-in: worker pool + codegen on a slice
    ivfpq_topk(
        emb.limit(64 * cpus), queries, k=5, dim=DIM, n_cells=N_CELLS, n_probe=N_PROBE, refine=REFINE
    ).write.format("noop").mode("overwrite").save()
    times = []
    for _ in range(timed_runs):
        t0 = time.time()
        ivfpq_topk(
            emb, queries, k=5, dim=DIM, n_cells=N_CELLS, n_probe=N_PROBE, refine=REFINE
        ).write.format("noop").mode("overwrite").save()
        times.append(round(time.time() - t0, 1))
    spark.stop()
    return times


def recall_and_candidates(corpus_path: str) -> dict:
    from pyspark.sql import functions as F

    from dataflow_geobeam_spark.operators.similarity import (
        brute_force_topk,
        ivf_assign,
        ivfpq_topk,
    )
    from dataflow_geobeam_spark.session import get_spark

    spark = get_spark("ann-recall", master="local[32]", shuffle_partitions=64)
    spark.sparkContext.setLogLevel("ERROR")
    emb = spark.read.parquet(corpus_path)
    queries = emb.where(F.col("vec_id") % 1000 == 0).where(
        F.col("vec_id") < N_RECALL_QUERIES * 1000
    )
    approx = {
        (r.query_id, r.neighbor_id)
        for r in ivfpq_topk(
            emb, queries, k=5, dim=DIM, n_cells=N_CELLS, n_probe=N_PROBE, refine=REFINE
        ).collect()
    }
    exact = {
        (r.query_id, r.neighbor_id)
        for r in brute_force_topk(emb, queries, k=5).collect()
    }
    recall = len(approx & exact) / len(exact)
    # candidate volume: corpus rows inside the probed cells, per query
    c_cells = ivf_assign(emb, "vec_id", "embedding", DIM, N_CELLS, 1)
    q_cells = ivf_assign(queries, "vec_id", "embedding", DIM, N_CELLS, N_PROBE)
    n_cand = (
        c_cells.withColumnRenamed("_id", "neighbor_id")
        .join(F.broadcast(q_cells.withColumnRenamed("_id", "query_id")), "cell")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .count()
    )
    n_corpus = emb.count()
    spark.stop()
    return {
        "recall_top5_vs_bruteforce": round(recall, 3),
        "candidates_total": int(n_cand),
        "candidates_per_query": round(n_cand / N_RECALL_QUERIES, 1),
        "candidate_share_of_corpus": round(n_cand / (N_RECALL_QUERIES * n_corpus), 4),
        "expected_share_n_probe_over_cells": round(N_PROBE / N_CELLS, 4),
    }


MD_HEADER = "## ANN scaling"


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
    rc = out["quality"]
    md = f"""
{MD_HEADER} (round 5)

`ivfpq_topk` (IVF cells + PQ codes + ADC LUT candidate scoring + exact
refine) over {out["n_vectors"]:,} vectors (sf0.1 embeddings x{REPLICATE},
seeded {SIGMA}-sigma per-replica perturbation), {N_QUERIES} queries timed
(recall measured on {N_RECALL_QUERIES}),
n_cells={N_CELLS}, n_probe={N_PROBE} (tools/bench_ann_scaling.py; levels
local[2] vs local[8] for the same reason as the dedup bench — both sit
inside this host's ~8 real cores):

| input | local[2] (N) | local[8] (4N) | speedup | efficiency |
|---|---|---|---|---|
| {out["n_vectors"]:,} vectors | {sc["best_2"]} s ({sc["vecs_per_sec_2"]:,.0f} vec/s) | {sc["best_8"]} s ({sc["vecs_per_sec_8"]:,.0f} vec/s) | {sc["speedup"]}x | **{sc["efficiency"]:.2f}** |

Clean timed runs: local[2] {sc["times_2"]}, local[8] {sc["times_8"]} (sec),
interleaved, min over samples BRACKETED by quiet single-proc numpy probes
(pre-run gate + post-run check — this Firecracker host oversubscribes in
minutes-long waves that guest steal accounting cannot see and that can
start mid-run; a sample whose post-run probe is loud is discarded as
wave-contaminated). Raw samples incl. discarded ones are in
BENCH/ann_scaling.json.

Quality and plan accounting at this scale:

* recall@5 vs brute force: **{rc["recall_top5_vs_bruteforce"]}**
  (refine-{REFINE} exact re-rank, sized to the corpus's 400-replica
  near-tie clusters; PQ only has to keep true neighbors in the
  shortlist — see the sigma/refine sweep note in
  tools/bench_ann_scaling.py)
* candidate volume: {rc["candidates_per_query"]:,.0f} per query =
  {rc["candidate_share_of_corpus"]:.2%} of the corpus — matching the
  n_probe/n_cells = {rc["expected_share_n_probe_over_cells"]:.2%} the cell
  probe promises; only `m_sub` ints per candidate cross the scoring join.
* driver-side work is O(1) in N: a 256-row training sample and the
  {N_QUERIES}-query ADC LUT + probe-CSR build.
"""
    with open(path, "w") as f:
        f.write(head + md.lstrip("\n") + ("\n" + tail if tail else ""))


def main() -> None:
    corpus_path, n = build_corpus()
    print(f"corpus: {corpus_path} ({n:,} vectors)", flush=True)
    quality = recall_and_candidates(corpus_path)
    print("quality:", quality, flush=True)
    # Interleave the two sizes to decorrelate host steal, and BRACKET each
    # timed run with probes: the pre-run gate cannot see a wave that
    # starts mid-run (a ~50 s local[2] run is long exposure; one 4-round
    # attempt recorded a 121 s sample this way), but the wave is still
    # active at run end, so a post-run probe catches it. Only samples with
    # quiet probes on BOTH sides count toward the min; loud ones are kept
    # in the raw record, flagged.
    t2, t8 = [], []
    raw2, raw8 = [], []
    attempts = 0
    while (len(t2) < 3 or len(t8) < 3) and attempts < 10:
        attempts += 1
        for cpus, clean_l, raw_l in ((2, t2, raw2), (8, t8, raw8)):
            wait_for_quiet()
            s = run_at(cpus, corpus_path, timed_runs=1)[0]
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
        "n_vectors": n,
        "scaling": {
            "best_2": best2,
            "best_8": best8,
            "times_2": t2,
            "times_8": t8,
            "raw_2": raw2,
            "raw_8": raw8,
            "vecs_per_sec_2": round(n / best2, 1),
            "vecs_per_sec_8": round(n / best8, 1),
            "speedup": round(best2 / best8, 2),
            "efficiency": round(best2 / (4 * best8), 3),
        },
        "quality": quality,
        "config": {
            "replicate": REPLICATE,
            "dim": DIM,
            "n_cells": N_CELLS,
            "n_probe": N_PROBE,
            "n_queries": N_QUERIES,
            "n_recall_queries": N_RECALL_QUERIES,
        },
    }
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/ann_scaling.json", "w") as f:
        json.dump(out, f, indent=1)
    rewrite_baseline_md(out)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
