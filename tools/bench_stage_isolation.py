"""Round-6 stage-isolation micro-bench (guide §1.4: noop-sink timing).

Times the internal stages of the most expensive bench queries so the
optimization targets the stage that actually dominates, not the one that
looks expensive. Separate from the FROZEN bench.py by design.

Usage: python tools/bench_stage_isolation.py [group ...]
Groups: fp_match, minhash, emb, pipeline, kernels
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def t(spark, label, df):
    spark.sparkContext.setJobDescription(label)
    best = None
    for _ in range(2):
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    print(f"{label:55s} {best:7.3f}s")
    spark.sparkContext.setJobDescription(None)
    return best


def main() -> None:
    groups = set(sys.argv[1:]) or {"fp_match", "minhash", "emb", "pipeline"}
    from pyspark.sql import functions as F

    from dataflow_geobeam_spark.fixtures import ensure_fixtures
    from dataflow_geobeam_spark.session import get_spark
    from dataflow_geobeam_spark.sources.clips import read_clips

    spark = get_spark("stage-isolation")
    spark.sparkContext.setLogLevel("ERROR")
    fx = ensure_fixtures(SF_DIR)

    # warmup (same as bench.py)
    from dataflow_geobeam_spark.functions.decode import with_decoded_metrics

    warm = spark.read.parquet(os.path.join(fx, "clips.parquet")).limit(128).repartition(128)
    for _ in range(2):
        with_decoded_metrics(warm).groupBy("codec").agg(F.count(F.lit(1))).write.format(
            "noop"
        ).mode("overwrite").save()
    spark.read.parquet(os.path.join(fx, "clips.parquet")).selectExpr(
        "sum(length(bytes))"
    ).collect()

    if "fp_match" in groups:
        from dataflow_geobeam_spark.fixtures.generate import ensure_fp_queries
        from dataflow_geobeam_spark.functions.audio import with_fingerprints
        from dataflow_geobeam_spark.operators import retrieval as R

        corpus = read_clips(
            spark, fx, columns=("clip_id", "bytes", "codec", "sr_hz"), with_bucket=False
        )
        queries = spark.read.parquet(ensure_fp_queries(SF_DIR)).select(
            "query_id", "bytes", "codec", "sr_hz"
        )
        cfp = with_fingerprints(corpus, bytes_col="bytes")
        qfp = with_fingerprints(queries, bytes_col="bytes")
        t(spark, "fp: corpus scan only (bytes length)", corpus.select(F.length("bytes")))
        t(spark, "fp: corpus fingerprints", cfp.select("clip_id", "fp"))
        t(spark, "fp: query fingerprints", qfp.select("query_id", "fp"))
        t(spark, "fp: corpus keyed explode", R._keyed(cfp, "clip_id", "fp", "t"))
        t(spark, "fp: votes join+agg", R.fp_match_votes(cfp, qfp))
        t(spark, "fp: full top1", R.fp_match_top1(cfp, qfp))

    if "minhash" in groups:
        from dataflow_geobeam_spark.functions import text as T
        from dataflow_geobeam_spark.operators import dedup as D

        docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
        sh = docs.select(
            F.col("doc_id").alias("_id"), T.shingles("text", 3).alias("shingles")
        ).where(F.size("shingles") > 0)
        t(spark, "mh: shingles projection", sh)
        sig = D.minhash_signature_wide(sh, "_id", "shingles", 64)
        t(spark, "mh: signature (explode+64 min aggs)", sig)
        buckets = D.minhash_band_buckets(sh, 64, 16, 4)
        t(spark, "mh: band buckets", buckets)
        from pyspark.sql.window import Window

        w = Window.partitionBy("band", "bucket")
        capped = (
            buckets.withColumn("_bsz", F.count(F.lit(1)).over(w))
            .where(F.col("_bsz") <= 1000)
            .drop("_bsz")
        )
        left = capped.select("band", "bucket", F.col("_id").alias("id_a"))
        right = capped.select("band", "bucket", F.col("_id").alias("id_b"))
        cand = (
            left.join(right, ["band", "bucket"])
            .where(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b")
            .dropDuplicates(["id_a", "id_b"])
        )
        t(spark, "mh: candidates (join+dedup)", cand)
        print("mh: n candidates =", cand.count())
        t(spark, "mh: full pairs", D.minhash_lsh_pairs(docs, "doc_id", "text"))

    if "emb" in groups:
        from dataflow_geobeam_spark.operators import similarity as S

        emb = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
        n = emb.count()
        sk = S.sketch_buckets(emb, "vec_id", "embedding", 64, 4, 32)
        t(spark, "emb: sketch pass", sk)
        from pyspark.sql.window import Window

        import math

        cap = max(S.AUTO_CAP_FLOOR, math.ceil(S.AUTO_CAP_MULT * n / 16))
        w = Window.partitionBy("table", "bucket")
        skc = (
            sk.withColumn("_bsz", F.count(F.lit(1)).over(w))
            .where(F.col("_bsz") <= cap)
            .select("_id", "table", "bucket")
        )
        a = skc.withColumnRenamed("_id", "id_a")
        b = skc.withColumnRenamed("_id", "id_b")
        cand = (
            a.join(b, ["table", "bucket"])
            .where(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b")
            .dropDuplicates(["id_a", "id_b"])
        )
        t(spark, "emb: candidates (join+dedup)", cand)
        print("emb: n candidates =", cand.count())
        va = emb.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("v_a"))
        vb = emb.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("v_b"))
        joined = cand.join(va, "id_a").join(vb, "id_b")
        t(spark, "emb: pairs + vector join (no cosine)", joined)
        t(
            spark,
            "emb: full verify (cosine)",
            joined.withColumn(
                "cosine", F.round(S.cosine_expr(F.col("v_a"), F.col("v_b")), 6)
            ).where(F.col("cosine") >= 0.45),
        )

    if "pipeline" in groups:
        from dataflow_geobeam_spark.plans import audio as PA

        t(spark, "pipe: clean_asr_corpus", PA.pipeline_clean_asr_corpus(spark, SF_DIR))
        t(
            spark,
            "pipe: build_training_corpus",
            PA.pipeline_build_training_corpus(spark, SF_DIR),
        )

    spark.stop()


if __name__ == "__main__":
    main()
