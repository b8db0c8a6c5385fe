"""Edit-distance near-dup scaling at 200k docs (round-5f).

Same evidence shape as ``bench_dedup_scaling.py`` (which supplies the
corpus builder): ``edit_distance_pairs`` — shared-shingle blocked
candidates, length-band prune, bounded-levenshtein verify — run at N and
4N local cores over the same 200k-doc corpus, reporting throughput at
both and the N->4N scaling efficiency. Replicas share no shingles (every
token carries a replica suffix), so the blocking join's candidate volume
scales ∝ N exactly as it would on a real crawl shard: the measured
stages are tokenize/shingle (row-local), the shingle-postings shuffle,
and the levenshtein verify — not a cross-replica pair explosion.

Writes BENCH/editdist_scaling.json and splices an
"## Edit-distance dedup scaling (round 5f)" section into
BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench_dedup_scaling import build_corpus  # noqa: E402  (tools/ sibling)

MD_HEADER = "## Edit-distance dedup scaling (round 5f)"


def run_at(cpus: int, corpus_path: str, timed_runs: int = 1) -> tuple[list[float], int]:
    from dataflow_geobeam_spark.operators.dedup import edit_distance_pairs
    from dataflow_geobeam_spark.session import get_spark

    spark = get_spark(
        f"editdist-scaling-{cpus}",
        master=f"local[{cpus}]",
        shuffle_partitions=max(cpus * 4, 8),
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(corpus_path)
    # warm-in: codegen + shuffle machinery on a slice
    edit_distance_pairs(docs.limit(64 * cpus), "doc_id", "text").write.format(
        "noop"
    ).mode("overwrite").save()
    times = []
    n_pairs = -1
    for _ in range(timed_runs):
        t0 = time.time()
        n_pairs = edit_distance_pairs(docs, "doc_id", "text").count()
        times.append(round(time.time() - t0, 1))
    spark.stop()
    return times, n_pairs


def rewrite_baseline_md(out: dict) -> None:
    path = "BENCH/BASELINE.md"
    content = open(path).read()
    pre, _, rest = content.partition(MD_HEADER)
    if rest:
        # drop the old section (up to the next "## " heading)
        nxt = rest.find("\n## ")
        rest = rest[nxt + 1 :] if nxt >= 0 else ""
        content = pre.rstrip() + "\n" + rest
    lo = out["samples"]
    sec = f"""{MD_HEADER}

`edit_distance_pairs` (shared-shingle blocked candidates -> length-band
prune -> bounded-levenshtein verify, all JVM-side) over
{out['n_docs']:,} suffix-disjoint replicated docs
(tools/bench_editdist_scaling.py; {out['n_pairs']:,} pairs found, best-of):

| input | local[{out['n_low']}] (N) | local[{out['n_high']}] (4N) | speedup | efficiency |
|---|---|---|---|---|
| {out['n_docs']:,} docs | {out['low_best']} s ({out['low_rate']:,} docs/s) | {out['high_best']} s ({out['high_rate']:,} docs/s) | {out['speedup']}x | **{out['efficiency']}** |

Samples: local[{out['n_low']}] {lo['low']}, local[{out['n_high']}] {lo['high']} (sec).
Every stage before the shingle-postings shuffle is row-local; the verify
join moves only (id, id) pairs plus one text column per side, and the
3-arg levenshtein bound early-exits non-dup candidates.
"""
    content = content.rstrip() + "\n\n" + sec
    with open(path, "w") as f:
        f.write(content)


def main() -> None:
    replicate = int(os.environ.get("EDITDIST_REPLICATE", "40"))
    n_low = int(os.environ.get("EDITDIST_N_LOW", "8"))
    n_high = int(os.environ.get("EDITDIST_N_HIGH", "32"))
    runs = int(os.environ.get("EDITDIST_RUNS", "3"))
    corpus, n_docs = build_corpus(replicate)
    print(f"corpus: {corpus} ({n_docs:,} docs)")

    # interleave to cancel machine drift: low, high, low, high, ...
    low_times: list[float] = []
    high_times: list[float] = []
    n_pairs = -1
    for r in range(runs):
        lt, n_pairs = run_at(n_low, corpus)
        low_times += lt
        ht, _ = run_at(n_high, corpus)
        high_times += ht
        print(f"round {r}: low={lt} high={ht}")

    low_best, high_best = min(low_times), min(high_times)
    speedup = round(low_best / high_best, 2)
    eff = round(speedup / (n_high / n_low), 2)
    out = {
        "metric": "editdist_dedup_scaling",
        "n_docs": n_docs,
        "n_pairs": n_pairs,
        "n_low": n_low,
        "n_high": n_high,
        "low_best": low_best,
        "high_best": high_best,
        "low_rate": int(n_docs / low_best),
        "high_rate": int(n_docs / high_best),
        "speedup": speedup,
        "efficiency": eff,
        "samples": {"low": low_times, "high": high_times},
    }
    print(json.dumps(out))
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/editdist_scaling.json", "w") as f:
        json.dump(out, f, indent=1)
    rewrite_baseline_md(out)


if __name__ == "__main__":
    main()
