"""Skew salting: correctness (agg equality) + balance (hot key flattened)."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    DoubleType,
    StringType,
    StructField,
    StructType,
)

from dataflow_geobeam_spark.operators import skew

SCHEMA = StructType(
    [
        StructField("clip_id", StringType()),
        StructField("bucket", StringType()),
        StructField("dur_ms", IntegerType()),
        StructField("rms", DoubleType()),
        StructField("peak", DoubleType()),
        StructField("n_samples", LongType()),
    ]
)


def _skewed_df(spark, n=4000, hot_frac=0.4):
    """Hot-prefix fixture: 40% of rows on bucket 'aa' with a heavy dur tail
    (FIXTURES.md skew variant)."""
    rows = []
    for i in range(n):
        hot = i < n * hot_frac
        bucket = "aa" if hot else f"{i % 64 + 16:02x}"
        dur = 20_000 + (i % 11) * 1000 if hot else 250 + (i % 10) * 100
        rows.append((f"{bucket}{i:012d}", bucket, dur, 0.25, 0.8, dur * 16))
    return spark.createDataFrame(rows, SCHEMA)


def test_salted_agg_equals_plain_agg(spark):
    df = _skewed_df(spark)
    plain = {
        r.bucket: (r.n_clips, r.sum_dur_ms, round(r.mean_rms, 9), r.max_peak, r.sum_samples)
        for r in df.groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_clips"),
            F.sum(F.col("dur_ms").cast("long")).alias("sum_dur_ms"),
            F.avg("rms").alias("mean_rms"),
            F.max("peak").alias("max_peak"),
            F.sum("n_samples").alias("sum_samples"),
        )
        .collect()
    }
    salted = {
        r.bucket: (r.n_clips, r.sum_dur_ms, round(r.mean_rms, 9), r.max_peak, r.sum_samples)
        for r in skew.salted_two_phase_agg(df, ["bucket"]).collect()
    }
    assert salted == plain


def test_hot_bucket_fans_out_cold_stays_single(spark):
    df = _skewed_df(spark)
    plan = {r.bucket: r._k for r in skew.weighted_salt_plan(df, ["bucket"]).collect()}
    assert plan["aa"] == 32  # hot bucket: max fan-out
    cold = [k for b, k in plan.items() if b != "aa"]
    assert max(cold) <= 2  # cold buckets barely fan out


def test_salting_flattens_weight_per_slice(spark):
    df = _skewed_df(spark)
    # unsalted: hot bucket weight is one slice
    unsalted_max = (
        df.groupBy("bucket").agg(F.sum(F.col("dur_ms").cast("long")).alias("w")).collect()
    )
    unsalted_max = max(int(r["w"]) for r in unsalted_max)
    salted = skew.add_weighted_salt(df, ["bucket"])
    weights = skew.slice_weights(salted, ["bucket"])
    assert weights[0] < unsalted_max / 8  # ≥8x flatter with 32-way fan-out
    # salts are uniform-ish across the hot bucket
    hot = salted.where("bucket = 'aa'").groupBy("salt").count().collect()
    counts = np.array([r["count"] for r in hot])
    assert len(counts) == 32
    assert counts.max() < counts.mean() * 1.5
