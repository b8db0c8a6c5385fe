"""Round-5f: blocked edit-similarity join (operators/dedup.edit_distance_pairs
+ plans/training_data.dedup_edit_distance).

Covers the exact levenshtein value against a pure-Python mirror, the
shared-shingle blocking contract (a char-similar pair with no common word
3-shingle is NOT a candidate), the length-band prune, the hot-shingle cap,
and the early-exit bounded-levenshtein rewrite returning the same rows as
the plain form.
"""

from __future__ import annotations

import pytest


def py_levenshtein(a: str, b: str) -> int:
    """Textbook O(len^2) DP — the independent mirror for the JVM builtin."""
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


BASE = "the quick brown fox jumps over the lazy dog near the old river bank today"


def _pairs(spark, rows, **kw):
    from dataflow_geobeam_spark.operators import dedup

    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = dedup.edit_distance_pairs(df, "doc_id", "text", **kw)
    return {(r.id_a, r.id_b): r.edit_sim for r in out.collect()}


def test_edit_sim_value_matches_python_mirror(spark):
    edited = BASE.replace("quick", "quiet").replace("lazy", "hazy")
    got = _pairs(
        spark, [(1, BASE), (2, edited), (3, "completely unrelated words here")]
    )
    d = py_levenshtein(BASE.strip(), edited.strip())
    exp = round(1.0 - d / max(len(BASE.strip()), len(edited.strip())), 6)
    assert got == {(1, 2): pytest.approx(exp, abs=1e-9)}
    assert exp >= 0.8  # the pair genuinely clears the default threshold


def test_blocking_requires_shared_shingle(spark):
    # every word changed by one char: high char-level similarity, but no
    # 3-word shingle survives intact -> the blocked join must NOT emit it
    words = BASE.split()
    shifted = " ".join(w[:-1] + ("x" if w[-1] != "x" else "y") for w in words)
    d = py_levenshtein(BASE, shifted)
    sim = 1.0 - d / max(len(BASE), len(shifted))
    assert sim >= 0.75  # would pass verification if it were ever a candidate
    got = _pairs(spark, [(1, BASE), (2, shifted)], threshold=0.75)
    assert got == {}


def test_length_band_prunes_short_vs_long(spark):
    # shares shingles (prefix) but is under 80% of the length -> pruned
    short = " ".join(BASE.split()[:6])
    got = _pairs(spark, [(1, BASE), (2, short)])
    assert got == {}


def test_hot_shingle_cap_drops_boilerplate_postings(spark):
    # 30 docs all sharing one boilerplate shingle; two of them are true
    # near-dups reachable ONLY through capped postings when cap < 30
    boiler = "standard legal disclaimer text"
    rows = [(i, f"{boiler} unique tail {i} alpha beta gamma") for i in range(30)]
    rows.append((100, BASE + " " + boiler))
    rows.append((101, BASE.replace("quick", "quiet") + " " + boiler))
    capped = _pairs(spark, rows, max_shingle_df=10)
    uncapped = _pairs(spark, rows, max_shingle_df=None)
    assert (100, 101) in uncapped
    # the true near-dup pair also shares its own rare shingles -> survives cap
    assert (100, 101) in capped
    # boilerplate-only pairs never clear the edit_sim threshold either way
    assert all(k == (100, 101) for k in capped)


def test_bounded_kernel_equals_plain_form(spark):
    """The early-exit 3-arg levenshtein rewrite must emit exactly the rows
    and values of the unbounded 2-arg definition."""
    from pyspark.sql import functions as F

    from dataflow_geobeam_spark.operators import dedup

    rows = [(1, BASE), (2, BASE.replace("quick", "quiet")), (3, BASE[::-1])]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    fast = dedup.edit_distance_pairs(df, "doc_id", "text", threshold=0.8)
    # plain-form mirror inside Spark: same candidates, 2-arg levenshtein
    got = {(r.id_a, r.id_b): r.edit_sim for r in fast.collect()}
    t = df.select("doc_id", F.trim("text").alias("t"))
    a = t.select(F.col("doc_id").alias("id_a"), F.col("t").alias("ta"))
    b = t.select(F.col("doc_id").alias("id_b"), F.col("t").alias("tb"))
    allp = (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn(
            "edit_sim",
            F.round(
                F.lit(1.0)
                - F.levenshtein("ta", "tb").cast("double")
                / F.greatest(F.length("ta"), F.length("tb")).cast("double"),
                6,
            ),
        )
        .where(F.col("edit_sim") >= 0.8)
    )
    plain = {(r.id_a, r.id_b): r.edit_sim for r in allp.collect()}
    # fast ⊆ plain always (blocking only removes pairs); on this corpus the
    # surviving pair shares shingles, so the sets are equal
    assert got == plain and (1, 2) in got
