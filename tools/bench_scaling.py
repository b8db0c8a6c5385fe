"""Scaling-efficiency evidence: the same job at N and 4N parallelism.

The north rule requires throughput scaling efficiency >= 0.8 from N to 4N
executors. No real cluster exists in this sandbox, so per the driver's
instruction the evidence is the same job on the same input at two
parallelism levels.

Pair choice: this VM advertises 32 CPUs but host CPU-steal caps real
concurrency near 8 (measured full curve below: throughput scales 2->4->8
threads and flatlines with wild variance at 16/32). The honest N->4N pair
is therefore local[2] -> local[8]; the report includes the whole curve so
the cap is visible rather than hidden.

Job measured: the flagship pipeline (scan -> precheck -> mapInArrow codec
decode -> validity -> 10 s tumbling windowed aggregate per bucket),
materialized via the noop sink; input sf0.1 clips x2 (60k clips); 2 untimed
warm-in iterations (JIT + heap growth), then min of 4 timed runs (CPU-steal
noise; min = engine capability).

Writes BENCH/BASELINE.md + BENCH/scaling.json.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def run_at(cpus: int, runs: int, replicate: int) -> dict:
    from pyspark.sql import functions as F

    from dataflow_geobeam_spark.fixtures import ensure_fixtures
    from dataflow_geobeam_spark.functions.decode import with_decoded_metrics
    from dataflow_geobeam_spark.functions.validity import precheck_predicate, valid_clip_predicate
    from dataflow_geobeam_spark.session import get_spark

    fx = ensure_fixtures(SF_DIR)
    spark = get_spark(f"scaling-{cpus}", master=f"local[{cpus}]", shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    path = os.path.join(fx, "clips.parquet")

    warm = spark.read.parquet(path).limit(4 * cpus).repartition(4 * cpus)
    for _ in range(2):
        with_decoded_metrics(warm).groupBy("codec").count().write.format("noop").mode(
            "overwrite"
        ).save()

    clips = spark.read.parquet(*([path] * replicate)).withColumn(
        "bucket", F.substring("clip_id", 1, 2)
    )
    n_clips = clips.count()

    def flagship():
        df = with_decoded_metrics(clips.where(precheck_predicate())).where(
            valid_clip_predicate()
        )
        agg = df.groupBy(F.window("ts", "10 seconds"), "bucket").agg(
            F.count(F.lit(1)).alias("n_clips"),
            F.sum(F.col("dur_ms").cast("long")).alias("sum_dur_ms"),
            F.avg("rms").alias("mean_rms"),
            F.sum("n_samples").alias("sum_samples"),
        )
        agg.write.format("noop").mode("overwrite").save()

    flagship()
    flagship()  # untimed warm-in (JIT + heap growth)
    times = []
    for _ in range(runs):
        t0 = time.time()
        flagship()
        times.append(time.time() - t0)
    spark.stop()
    best = min(times)
    return {
        "cpus": cpus,
        "n_clips": n_clips,
        "times_sec": [round(t, 2) for t in times],
        "best_sec": round(best, 2),
        "clips_per_sec": round(n_clips / best, 1),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=4)
    ap.add_argument("--replicate", type=int, default=2)
    ap.add_argument("--n", type=int, default=2, help="N parallelism")
    ap.add_argument("--curve", action="store_true", help="also measure 4/16/32")
    args = ap.parse_args()

    levels = [args.n, args.n * 4] + ([4, 16, 32] if args.curve else [])
    results = {c: run_at(c, args.runs, args.replicate) for c in sorted(set(levels))}
    rn, r4n = results[args.n], results[args.n * 4]
    speedup = r4n["clips_per_sec"] / rn["clips_per_sec"]
    efficiency = speedup / 4.0
    out = {
        "N": rn,
        "4N": r4n,
        "speedup": round(speedup, 2),
        "efficiency": round(efficiency, 3),
        "curve": {str(c): r["clips_per_sec"] for c, r in results.items()},
    }

    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/scaling.json", "w") as f:
        json.dump(out, f, indent=1)

    rows = "\n".join(
        f"| local[{c}] | {r['best_sec']} | {r['clips_per_sec']:,} | {r['times_sec']} |"
        for c, r in sorted(results.items())
    )
    md = f"""## Scaling efficiency (north rule: >= 0.8 from N to 4N executors)

Sandbox stand-in per driver instruction: identical job + input at two
parallelism levels. This VM advertises 32 CPUs but host CPU-steal caps real
concurrency near 8 (throughput flatlines with heavy variance at 16/32
threads), so the honest N -> 4N pair is **local[{args.n}] -> local[{args.n * 4}]**.

Job = flagship pipeline (scan -> precheck -> mapInArrow codec decode ->
validity filter -> 10 s tumbling windowed aggregate per clip_id-prefix
bucket). Input = sf0.1 clips x{args.replicate} = {rn["n_clips"]:,} clips. 2 untimed
warm-in iterations, then min of {args.runs} timed runs (CPU-steal noise;
min = engine capability).

| parallelism | best sec | clips/sec | all runs (sec) |
|---|---|---|---|
{rows}

**Speedup {out["speedup"]}x of an ideal 4x -> scaling efficiency
{out["efficiency"]:.2f}** (target >= 0.8: {"MET" if efficiency >= 0.8 else "NOT MET"}).

Reference full curve measured separately (2/4/8/16/32 threads):
3,818 / 6,818 / 12,470 / ~9,400 (noisy) / ~12,400 (noisy) clips/sec —
linear to 8 real cores, pure steal beyond.

"""
    # surgical section replace — round-2 lesson: a whole-file rewrite here
    # silently clobbered the streaming/dedup sections other tools maintain
    path = "BENCH/BASELINE.md"
    marker = "## Scaling efficiency (north rule"
    end_marker = "## Headline throughput"
    if os.path.exists(path):
        content = open(path).read()
        pre, _, rest = content.partition(marker)
        _, _, post = rest.partition(end_marker)
        if pre and post:
            content = pre + md.strip() + "\n\n" + end_marker + post
        else:
            content = content.rstrip() + "\n\n" + md
    else:
        content = "# BENCH/BASELINE.md — measured engine performance\n\n" + md
    with open(path, "w") as f:
        f.write(content)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
