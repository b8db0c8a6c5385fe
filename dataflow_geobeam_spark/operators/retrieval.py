"""Query-by-example audio retrieval: fingerprint inverted index + offset vote.

The audio analog of the similarity-search family (`operators/similarity.py`
for embeddings): given a corpus of clips and a set of short query snippets,
find for every snippet the corpus clip (and frame offset) it was cut from —
the Shazam-style landmark lookup (A. Wang 2003, "An Industrial-Strength
Audio Search Algorithm"), re-expressed over this engine's Haitsma-Kalker
frame tokens (`functions/audio.fingerprint_np`).

Key idea: a 16-bit frame token is not selective enough to be a join key at
corpus scale (65,536 distinct values), but the BIGRAM of two consecutive
tokens is a 32-bit key (~4.3e9 values) — one key per token position, exact
equality only. A snippet sliced on a frame-hop boundary shares the corpus
clip's exact token subsequence (the tokens are gain-invariant, and PCM16
slice re-encode round-trips bit-exactly), so every shared bigram votes for
the same (clip, offset) pair; the true source wins the vote by a landslide
while chance bigram collisions scatter across offsets.

100 TB shape: the corpus pass is ONE mapInArrow decode+fingerprint scan
(payload dropped in-pass) followed by a map-only posexplode — the inverted
index is (key, clip_id, t) rows, ~2x the token count, and in production
would be written once and bucketed BY key so lookups are shuffle-free scans.
The query side is small by construction (queries-per-batch << corpus) and is
broadcast, so matching adds ZERO corpus shuffle; only the matched rows (a
few hundred per query) shuffle into the vote aggregate.

Reference parity: the reference has no retrieval ops at all; this extends
the training-data similarity-search family (SURVEY.md section 8) to the
audio payload axis, reusing the dedup family's fingerprint kernel.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["fp_bigram_keys", "fp_match_votes", "fp_match_top1"]


def fp_bigram_keys(fp_col: str = "fp"):
    """Catalyst expression: array<int> of 16-bit frame tokens -> array<long>
    of 32-bit consecutive-token bigram keys, ``key[t] = tok[t]<<16 | tok[t+1]``.

    Tokens are non-negative 16-bit values, so ``<<16`` + add equals the
    bitwise-or assembly; the whole thing stays inside whole-stage codegen
    (zip_with over two slices — no UDF). Length ``n_tokens - 1``; empty for
    sequences shorter than 2 tokens.
    """
    return F.expr(
        f"zip_with(slice({fp_col}, 1, greatest(size({fp_col}) - 1, 0)),"
        f"         slice({fp_col}, 2, greatest(size({fp_col}) - 1, 0)),"
        f"         (a, b) -> shiftleft(cast(a AS BIGINT), 16) + cast(b AS BIGINT))"
    )


def _keyed(df: DataFrame, id_col: str, fp_col: str, pos_name: str) -> DataFrame:
    """(id, pos, key) inverted-index rows from a fingerprint column."""
    return (
        df.where(F.col(fp_col).isNotNull() & (F.size(fp_col) >= 2))
        .select(F.col(id_col), F.posexplode(fp_bigram_keys(fp_col)).alias(pos_name, "key"))
    )


def fp_match_votes(
    corpus_fp: DataFrame,
    query_fp: DataFrame,
    corpus_id: str = "clip_id",
    query_id: str = "query_id",
    fp_col: str = "fp",
) -> DataFrame:
    """All (query, clip, offset) vote counts.

    ``offset_frames = t_corpus - t_query`` is constant for a true
    cut-from-this-clip match, so votes pile onto one cell; collisions
    scatter. The query side is broadcast (small by construction), so the
    corpus index never shuffles for the match itself; only matched rows
    enter the vote aggregate's exchange.
    """
    c = _keyed(corpus_fp, corpus_id, fp_col, "t")
    q = _keyed(query_fp, query_id, fp_col, "qt")
    return (
        c.join(F.broadcast(q), "key")
        .groupBy(
            query_id,
            corpus_id,
            (F.col("t") - F.col("qt")).cast("long").alias("offset_frames"),
        )
        .agg(F.count(F.lit(1)).alias("votes"))
    )


def fp_match_top1(
    corpus_fp: DataFrame,
    query_fp: DataFrame,
    corpus_id: str = "clip_id",
    query_id: str = "query_id",
    fp_col: str = "fp",
    min_votes: int = 4,
) -> DataFrame:
    """Best-match retrieval: per query, the (clip, offset) cell with the
    most bigram votes; deterministic tiebreak (votes desc, clip_id asc,
    offset asc); queries whose best cell has fewer than ``min_votes`` votes
    are dropped (no confident match — chance 32-bit collisions rarely agree
    on an offset even twice).

    Output: (query_id, clip_id, offset_frames, votes).
    """
    votes = fp_match_votes(corpus_fp, query_fp, corpus_id, query_id, fp_col)
    w = Window.partitionBy(query_id).orderBy(
        F.col("votes").desc(), F.col(corpus_id).asc(), F.col("offset_frames").asc()
    )
    return (
        votes.withColumn("_rk", F.row_number().over(w))
        .where((F.col("_rk") == 1) & (F.col("votes") >= min_votes))
        .drop("_rk")
    )
