"""Diagnose the streaming N->4N scaling miss (VERDICT round 1, What's wrong #4).

Phase A: batch form of the exact per-epoch work (scan 8 stream files ->
decode -> windowed agg -> parquet write) at local[1] and local[4].
If this doesn't scale, the problem is the work itself, not streaming.

Phase B: streaming form, dumping per-epoch durationMs breakdown.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def batch_epoch2(cpus: int) -> dict:
    from pyspark.sql import functions as F

    from dataflow_geobeam_spark.fixtures import ensure_fixtures
    from dataflow_geobeam_spark.functions.decode import with_decoded_metrics
    from dataflow_geobeam_spark.functions.validity import precheck_predicate, valid_clip_predicate
    from dataflow_geobeam_spark.session import get_spark
    from dataflow_geobeam_spark.streaming import pipeline

    fx = ensure_fixtures(SF_DIR)
    spark = get_spark(f"prof-batch-{cpus}", master=f"local[{cpus}]", shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    stream_dir = pipeline.prepare_stream_dir(spark, fx, n_files=16, replicate=2)
    files = sorted(
        os.path.join(stream_dir, f) for f in os.listdir(stream_dir) if f.endswith(".parquet")
    )[:8]
    warm = spark.read.parquet(*files).limit(4 * cpus).repartition(4 * cpus)
    with_decoded_metrics(warm).groupBy("codec").count().collect()

    df = spark.read.parquet(*files).withColumn("bucket", F.substring("clip_id", 1, 2))
    n_parts = df.rdd.getNumPartitions()
    n_rows = df.count()
    dec = with_decoded_metrics(df.where(precheck_predicate())).where(valid_clip_predicate())
    agg = (
        dec.groupBy(F.window("ts", "10 seconds"), "bucket")
        .agg(
            F.count(F.lit(1)).alias("n_clips"),
            F.sum(F.col("dur_ms").cast("long")).alias("sum_dur_ms"),
            F.avg("rms").alias("mean_rms"),
            F.sum("n_samples").alias("sum_samples"),
        )
    )
    out = tempfile.mkdtemp(prefix=f"prof_batch_{cpus}_")
    t0 = time.time()
    agg.write.mode("overwrite").parquet(os.path.join(out, "o"))
    dt = time.time() - t0
    shutil.rmtree(out, ignore_errors=True)
    spark.stop()
    return {"cpus": cpus, "n_input_partitions": n_parts, "rows": n_rows, "sec": round(dt, 2),
            "rows_per_sec": round(n_rows / dt, 1)}


def stream_epochs(cpus: int) -> dict:
    from dataflow_geobeam_spark.fixtures import ensure_fixtures
    from dataflow_geobeam_spark.functions.decode import with_decoded_metrics
    from dataflow_geobeam_spark.session import get_spark
    from dataflow_geobeam_spark.streaming import pipeline
    from dataflow_geobeam_spark.streaming.metrics import EpochMetricsListener

    fx = ensure_fixtures(SF_DIR)
    spark = get_spark(f"prof-stream-{cpus}", master=f"local[{cpus}]", shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    warm = spark.read.parquet(os.path.join(fx, "clips.parquet")).limit(4 * cpus).repartition(4 * cpus)
    with_decoded_metrics(warm).groupBy("codec").count().collect()

    listener = EpochMetricsListener()
    spark.streams.addListener(listener)
    work = tempfile.mkdtemp(prefix=f"prof_stream_{cpus}_")
    t0 = time.time()
    q, sink = pipeline.run_streaming_window_agg(
        spark, fx, os.path.join(work, "out"),
        os.path.join("/dev/shm", f"prof_ck_{cpus}_{int(time.time() * 1000)}"),
        n_files=16, max_files_per_trigger=8, available_now=True, replicate=2,
    )
    q.awaitTermination(1200)
    wall = time.time() - t0
    epochs = [
        {"batch": p["batch_id"], "rows": p["num_input_rows"], "durationMs": p["duration_ms"]}
        for p in listener.progress
    ]
    spark.streams.removeListener(listener)
    spark.stop()
    shutil.rmtree(work, ignore_errors=True)
    return {"cpus": cpus, "wall": round(wall, 2), "epochs": epochs}


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "batch"
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    if mode == "batch":
        print(json.dumps(batch_epoch2(cpus)))
    else:
        print(json.dumps(stream_epochs(cpus), indent=1))
