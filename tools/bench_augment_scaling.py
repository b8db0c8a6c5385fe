"""N->4N scaling for the byte-producing augmentation path (round 5e).

Runs the full audio_speed_perturb pipeline (decode -> 2x reinterpret-rate
resample -> RIFF PCM16 re-encode, one mapInArrow pass, noop sink) over a
replicated clip corpus at local[N] and local[4N], reporting throughput at
both and the scaling efficiency — the same two-parallelism evidence form
as tools/bench_audio_dedup_scaling.py (probe-bracketed min-of-k samples).

The path is map-only (zero shuffles), so this measures executor-side
decode/encode scaling — the shape the 100 TB augmentation job has.

Usage: python tools/bench_augment_scaling.py [n_replicas] [out_json]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_once(master: str, n_replicas: int) -> dict:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from dataflow_geobeam_spark.fixtures import ensure_fixtures
    from dataflow_geobeam_spark.functions.audio import with_speed_perturb

    spark = (
        SparkSession.builder.master(master)
        .appName(f"augment-scaling-{master}")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "48g")
        .getOrCreate()
    )
    try:
        fx = ensure_fixtures("/root/testdata/sf0.01")
        base = spark.read.parquet(os.path.join(fx, "clips.parquet")).select(
            "clip_id", "bytes", "codec", "sr_hz"
        )
        reps = spark.range(n_replicas).selectExpr("cast(id as string) AS rep")
        corpus = base.crossJoin(reps).withColumn(
            "clip_id", F.concat_ws("-", "clip_id", "rep")
        ).drop("rep").repartition(64)
        n_clips = corpus.count()
        samples = []
        for _ in range(3):
            t0 = time.monotonic()
            with_speed_perturb(corpus).write.format("noop").mode("overwrite").save()
            samples.append(round(time.monotonic() - t0, 2))
        best = min(samples)
        return {
            "master": master,
            "n_clips": n_clips,
            "samples_s": samples,
            "best_s": best,
            "clips_per_s": round(n_clips / best, 1),
        }
    finally:
        spark.stop()


def main() -> None:
    n_replicas = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out_path = sys.argv[2] if len(sys.argv) > 2 else "BENCH/augment_scaling.json"
    small = run_once("local[2]", n_replicas)
    big = run_once("local[8]", n_replicas)
    eff = (big["clips_per_s"] / small["clips_per_s"]) / 4.0
    result = {
        "pipeline": "audio_speed_perturb (decode -> 2x resample -> RIFF encode, map-only)",
        "n_replicas": n_replicas,
        "local2": small,
        "local8": big,
        "speedup": round(big["clips_per_s"] / small["clips_per_s"], 2),
        "efficiency_n_to_4n": round(eff, 3),
    }
    print(json.dumps(result, indent=2))
    with open(out_path, "w") as f:
        json.dump(result, f, indent=2)


if __name__ == "__main__":
    main()
