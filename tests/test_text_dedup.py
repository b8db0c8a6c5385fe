"""Text functions, dedup family, similarity search — semantic unit tests."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from dataflow_geobeam_spark.functions import text as T
from dataflow_geobeam_spark.operators import dedup, similarity


def _docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog near the old barn"),
        (2, "the quick brown fox jumps over the lazy dog near the old barn today"),  # near-dup of 1
        (3, "completely different words about spark shuffles and partitions here"),
        (4, "the quick brown fox jumps over the lazy dog near the old barn"),  # exact dup of 1
        (5, ""),  # blank
        (6, "la de que el los una palabras en castellano aqui"),  # spanish-ish
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_tokens_and_counts(spark):
    df = _docs(spark).select("doc_id", T.token_count("text").alias("n"))
    got = {r.doc_id: r.n for r in df.collect()}
    assert got[5] == 0 and got[1] == 13 and got[2] == 14


def test_quality_score_bounds_and_blank(spark):
    got = {r.doc_id: r.q for r in _docs(spark).select(
        "doc_id", T.quality_score("text").alias("q")).collect()}
    assert got[5] == 0.0
    assert 0.0 < got[1] <= 1.0
    assert got[3] > got[1] * 0.4  # different text, still reasonable quality


def test_langid_marker_votes(spark):
    got = {r.doc_id: (r.v.pred_lang, r.v.votes) for r in _docs(spark).select(
        "doc_id", T.langid_votes("text").alias("v")).collect()}
    assert got[1][0] == "en" and got[1][1] >= 2
    assert got[6][0] == "es"


def test_fingerprint_is_normalization_invariant(spark):
    df = spark.createDataFrame(
        [(1, "Hello  World"), (2, "hello world"), (3, "other")], ["doc_id", "text"]
    )
    got = {r.doc_id: r.fp for r in df.select("doc_id", T.fingerprint("text").alias("fp")).collect()}
    assert got[1] == got[2] != got[3]
    # matches the portable md5-derived definition exactly
    expect = int(hashlib.md5(b"hello world#0").hexdigest()[:15], 16)
    assert got[2] == expect


def test_shingles(spark):
    df = spark.createDataFrame([(1, "a b c d")], ["doc_id", "text"])
    got = df.select(T.shingles("text", 3).alias("sh")).collect()[0].sh
    assert sorted(got) == ["a b c", "b c d"]


def test_exact_duplicates(spark):
    d = dedup.exact_duplicates(_docs(spark), ["text"], "doc_id").collect()
    assert len(d) == 1 and d[0].n_copies == 2 and d[0].ids == [1, 4]


def test_minhash_lsh_finds_near_and_exact_dups(spark):
    pairs = dedup.minhash_lsh_pairs(_docs(spark), threshold=0.5).collect()
    got = {(r.id_a, r.id_b) for r in pairs}
    assert (1, 4) in got  # exact dup -> jaccard 1.0
    assert (1, 2) in got or (2, 4) in got  # near dup via added word
    assert all(r.jaccard >= 0.5 for r in pairs)


def test_lsh_matches_bruteforce_at_threshold(spark, sf_dir):
    """LSH recall/precision vs exact all-pairs on real documents data."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    lsh = {(r.id_a, r.id_b, r.jaccard) for r in dedup.minhash_lsh_pairs(docs).collect()}
    exact = {(r.id_a, r.id_b, r.jaccard) for r in dedup.ngram_jaccard_pairs(docs).collect()}
    assert lsh == exact  # deterministic hashes: verified once, holds forever


def test_simhash_contains_exact_dups(spark):
    pairs = dedup.simhash_pairs(_docs(spark), max_hamming=8).collect()
    got = {(r.id_a, r.id_b) for r in pairs}
    assert (1, 4) in got  # identical docs: hamming 0
    hams = {(r.id_a, r.id_b): r.hamming for r in pairs}
    assert hams[(1, 4)] == 0


def test_lsh_topk_recall_vs_bruteforce(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.where(F.col("vec_id") < 10)
    exact = {(r.query_id, r.neighbor_id) for r in similarity.brute_force_topk(emb, q, k=5).collect()}
    approx = {(r.query_id, r.neighbor_id) for r in similarity.lsh_topk(emb, q, k=5).collect()}
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.5  # 24 tables x 6 planes on near-orthogonal noise vectors


def test_minhash_lsh_hot_bucket_cap(spark):
    """max_bucket_size skips over-common buckets: a triple of identical
    docs (hot in EVERY band) is excluded at cap=2 while a genuine near-dup
    pair still surfaces; with the cap off the triple's pairs return."""
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    docs = spark.createDataFrame(
        [
            (1, base), (2, base), (3, base),               # identical triple
            (10, base + " extra one two"),                  # near-dup pair
            (11, base + " extra one three"),
            (20, "completely different text with no overlap at all whatsoever"),
        ],
        "doc_id long, text string",
    )
    uncapped = {(r.id_a, r.id_b) for r in dedup.minhash_lsh_pairs(docs).collect()}
    assert {(1, 2), (1, 3), (2, 3), (10, 11)} <= uncapped
    capped = {
        (r.id_a, r.id_b)
        for r in dedup.minhash_lsh_pairs(docs, max_bucket_size=2).collect()
    }
    assert (10, 11) in capped
    assert not {(1, 2), (1, 3), (2, 3)} & capped  # hot triple skipped
