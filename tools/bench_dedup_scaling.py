"""Dedup-pipeline scaling at 200k+ docs, plus a skewed-corpus cap trial
(round-4 VERDICT #3).

Two claims need evidence one notch above the round-3 50k-doc point:

1. **Scale**: ``minhash_lsh_pairs`` (shingle -> 64-slot signature ->
   banded LSH self-join -> exact-Jaccard verify) holds N->4N scaling
   efficiency >= 0.8 at >= 200k documents.
2. **Skew**: with 10% of the corpus being ONE boilerplate text, the
   default hot-bucket cap keeps the self-join bounded — the uncapped
   candidate count is astronomically larger (recorded, not run).

Corpus: the sf0.1 documents table replicated R times; every token gets a
replica suffix, so replicas are statistically identical to the base
corpus (same length/vocabulary-size profile) but share no shingles —
candidate volume stays proportional to the base corpus instead of
exploding with R * (R-1) / 2 cross-replica near-dup pairs, which would
measure the verify join, not the signature/LSH stages being scaled.
Built once with pyarrow onto tmpfs.

Writes BENCH/dedup_scaling.json and splices the dedup section of
BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
BOILERPLATE = (
    "subscribe to our newsletter for updates terms of service apply "
    "all rights reserved contact us for more information"
)


def build_corpus(replicate: int, skew_frac: float = 0.0) -> tuple[str, int]:
    """tmpfs parquet of (doc_id long, text string): sf0.1 documents xR with
    per-replica token suffixes; optionally the first ``skew_frac`` of rows
    replaced by one shared boilerplate text."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    tag = f"{replicate}x" + (f"_skew{int(skew_frac * 100)}" if skew_frac else "")
    # a DIRECTORY of 64 part files, NOT one file: a single small parquet
    # file is one Spark scan split regardless of row groups, which
    # serializes the dominant shingle/explode/partial-min stage and fakes
    # efficiency ~0.25 at every parallelism level (measured) — the
    # micro-scale analog of writing one giant unsplittable file at 100 TB
    path = f"/dev/shm/dedup_corpus_{tag}"
    done = os.path.join(path, "_DONE")
    if os.path.exists(done):
        n = sum(
            pq.ParquetFile(os.path.join(path, f)).metadata.num_rows
            for f in os.listdir(path)
            if f.endswith(".parquet")
        )
        return path, n
    src = pq.read_table(os.path.join(SF_DIR, "documents.parquet"), columns=["doc_id", "text"])
    base_ids = src.column("doc_id").to_pylist()
    base_texts = src.column("text").to_pylist()
    ids, texts = [], []
    for r in range(replicate):
        for i, txt in zip(base_ids, base_texts):
            ids.append(i * 1000 + r)
            texts.append(" ".join(f"{w}{r}" for w in txt.split()) if r else txt)
    n = len(ids)
    n_skew = int(n * skew_frac)
    for j in range(n_skew):
        texts[j] = BOILERPLATE
    os.makedirs(path, exist_ok=True)
    n_files = 64
    per = (n + n_files - 1) // n_files
    for f_idx in range(n_files):
        lo, hi = f_idx * per, min((f_idx + 1) * per, n)
        if lo >= hi:
            break
        pq.write_table(
            pa.Table.from_pydict(
                {
                    "doc_id": pa.array(ids[lo:hi], type=pa.int64()),
                    "text": pa.array(texts[lo:hi]),
                }
            ),
            os.path.join(path, f"part-{f_idx:05d}.parquet"),
            compression="zstd",
        )
    with open(done, "w") as f:
        f.write("ok")
    return path, n


def run_at(cpus: int, corpus_path: str, timed_runs: int = 1) -> list[float]:
    from dataflow_geobeam_spark.operators.dedup import minhash_lsh_pairs
    from dataflow_geobeam_spark.session import get_spark

    spark = get_spark(
        f"dedup-scaling-{cpus}", master=f"local[{cpus}]", shuffle_partitions=max(cpus * 4, 8)
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(corpus_path)
    # warm-in: worker pool + codegen on a slice
    minhash_lsh_pairs(docs.limit(64 * cpus), "doc_id", "text").write.format("noop").mode(
        "overwrite"
    ).save()
    times = []
    for _ in range(timed_runs):
        t0 = time.time()
        minhash_lsh_pairs(docs, "doc_id", "text").write.format("noop").mode(
            "overwrite"
        ).save()
        times.append(round(time.time() - t0, 1))
    spark.stop()
    return times


def candidate_accounting(corpus_path: str, cap: int = 1000) -> dict:
    """Candidate-pair accounting from the bucket-size distribution: what
    the capped self-join actually enumerates vs what an uncapped join
    would (sum over buckets of B*(B-1)/2) — the recorded metric VERDICT
    asked for, computed without running the quadratic join."""
    from pyspark.sql import functions as F

    from dataflow_geobeam_spark.functions import text as T
    from dataflow_geobeam_spark.operators.dedup import minhash_band_buckets, minhash_cap_stats
    from dataflow_geobeam_spark.session import get_spark

    spark = get_spark("dedup-skew-acct", master="local[8]", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(corpus_path)
    sh = docs.select(
        F.col("doc_id").alias("_id"), T.shingles("text", 3).alias("shingles")
    ).where(F.size("shingles") > 0)
    sizes = minhash_band_buckets(sh, 64, 16, 4).groupBy("band", "bucket").agg(
        F.count(F.lit(1)).alias("b")
    )
    pairs = F.col("b") * (F.col("b") - 1) / 2
    row = sizes.agg(
        F.sum(pairs).alias("uncapped_candidates"),
        F.sum(F.when(F.col("b") <= cap, pairs).otherwise(F.lit(0))).alias(
            "capped_candidates"
        ),
        F.max("b").alias("max_bucket"),
    ).collect()[0]
    stats = minhash_cap_stats(docs, "doc_id", "text", max_bucket_size=cap).collect()[0]
    spark.stop()
    return {
        "uncapped_candidates": int(row.uncapped_candidates),
        "capped_candidates": int(row.capped_candidates),
        "max_bucket": int(row.max_bucket),
        "cap": cap,
        "n_buckets_dropped": int(stats.n_buckets_dropped),
        "dropped_row_share": float(stats.dropped_row_share),
    }


MD_HEADER = "## Dedup pipeline scaling"


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
    sk = out["skew"]
    md = f"""
{MD_HEADER} (rounds 2-4)

`minhash_lsh_pairs` (shingle -> 64-slot signature -> banded LSH self-join
-> exact-Jaccard verify), interleaved min-of-{out["rounds"]} at local[2] vs
local[8] (tools/bench_dedup_scaling.py; replicas carry per-replica token
suffixes so candidate volume stays proportional to the base corpus):

| input | local[2] | local[8] | speedup | efficiency |
|---|---|---|---|---|
| 5k docs (sf0.1 documents) | 8.55 s | 8.42 s | 1.0x | overhead-bound (round 2) |
| 50k docs (10x) — round 3, default cap ON | 149.5 s (334 docs/s) | 42.3 s (1,181 docs/s) | 3.5x | **0.88** |
| {sc["n_docs"]:,} docs ({out["replicate"]}x) — round 4, default cap ON | {sc["best_2"]} s ({sc["docs_per_sec_2"]:,.0f} docs/s) | {sc["best_8"]} s ({sc["docs_per_sec_8"]:,.0f} docs/s) | {sc["speedup"]}x | **{sc["efficiency"]:.2f}** |

All timed runs: local[2] {sc["times_2"]}, local[8] {sc["times_8"]} (sec).

**Skewed-corpus cap trial (round 4):** same corpus with 10% of rows
replaced by ONE boilerplate text ({sk["n_docs"]:,} docs,
{int(sk["n_docs"] * 0.1):,} identical). The default cap (1000) drops the
boilerplate's {sk["accounting"]["n_buckets_dropped"]} hot (band, bucket)
groups — max bucket {sk["accounting"]["max_bucket"]:,} docs — cutting the
self-join from **{sk["accounting"]["uncapped_candidates"]:,} would-be
candidate pairs to {sk["accounting"]["capped_candidates"]:,}**
({sk["accounting"]["dropped_row_share"]:.1%} of sketch rows excluded, all
boilerplate; identical docs belong to the exact-dedup pass). Capped wall
time at local[8]: **{sk["wall_8"]} s** — {sk["vs_clean"]} vs the clean
corpus at the same size, i.e. the cap keeps degenerate skew from touching
the join at all. Per-bucket drop accounting is queryable via
`operators.dedup.minhash_cap_stats`.
"""
    with open(path, "w") as f:
        f.write(head + md + ("\n" + tail if tail else ""))


def main() -> None:
    rounds = int(os.environ.get("DEDUP_BENCH_ROUNDS", "2"))
    replicate = int(os.environ.get("DEDUP_BENCH_REPLICATE", "40"))

    corpus, n_docs = build_corpus(replicate)
    runs: dict[int, list[float]] = {2: [], 8: []}
    for _ in range(rounds):
        for cpus in (2, 8):
            runs[cpus].extend(run_at(cpus, corpus))
    b2, b8 = min(runs[2]), min(runs[8])
    speedup = b2 / b8
    scaling = {
        "n_docs": n_docs,
        "times_2": runs[2],
        "times_8": runs[8],
        "best_2": b2,
        "best_8": b8,
        "docs_per_sec_2": round(n_docs / b2, 1),
        "docs_per_sec_8": round(n_docs / b8, 1),
        "speedup": round(speedup, 2),
        "efficiency": round(speedup / 4.0, 3),
    }

    skew_corpus, n_skew_docs = build_corpus(replicate, skew_frac=0.10)
    acct = candidate_accounting(skew_corpus)
    skew_times = run_at(8, skew_corpus)
    skew = {
        "n_docs": n_skew_docs,
        "accounting": acct,
        "wall_8": min(skew_times),
        "times_8": skew_times,
        "vs_clean": f"{min(skew_times) / b8:.2f}x",
    }

    out = {"rounds": rounds, "replicate": replicate, "scaling": scaling, "skew": skew}
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/dedup_scaling.json", "w") as f:
        json.dump(out, f, indent=1)
    rewrite_baseline_md(out)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
