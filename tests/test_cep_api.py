"""The declarative MATCH_RECOGNIZE-lite API (operators/cep.match_pattern):
parser grammar, dispatch equivalence to the four hand-built matchers, and
DEFINE-clause predicates cross-checked against an independently-formulated
DuckDB query (correlated/self-join SQL, not the engine's window compilation).

Reference parity: the reference (Beam ingestion glue) has no CEP surface;
this is north-rule scope (``BASELINE.json: north_star``, "CEP engine").
"""

from __future__ import annotations

import duckdb
import pytest

from dataflow_geobeam_spark.operators.cep import (
    Step,
    match_absence,
    match_contiguous,
    match_funnel,
    match_kleene,
    match_pattern,
    parse_pattern,
)


def test_parse_pattern_grammar():
    assert parse_pattern("view click purchase") == [
        Step("view"),
        Step("click"),
        Step("purchase"),
    ]
    assert parse_pattern("view click+ purchase") == [
        Step("view"),
        Step("click", "+"),
        Step("purchase"),
    ]
    assert parse_pattern("view !purchase") == [
        Step("view"),
        Step("purchase", "1", True),
    ]
    for bad in ["", "view !click+", "a b?", "a 2x", "a !"]:
        with pytest.raises(ValueError):
            parse_pattern(bad)


def test_match_pattern_dispatch_rejects_unsupported(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    with pytest.raises(ValueError, match="skip"):
        match_pattern(ev, "view click+ purchase", 60, mode="skip")
    with pytest.raises(ValueError, match="negation"):
        match_pattern(ev, "view click !purchase", 60)
    with pytest.raises(ValueError, match="Kleene"):
        match_pattern(ev, "view+ click purchase", 60)
    with pytest.raises(ValueError, match="mode"):
        match_pattern(ev, "view click", 60, mode="nope")


def test_match_pattern_compiles_to_handbuilt(spark, sf_dir):
    """Each supported pattern shape must produce the identical row set to
    the hand-built matcher it compiles to (same within_s, same input)."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    cases = [
        (
            match_pattern(ev, "view click purchase", 7 * 86400),
            match_contiguous(ev, ["view", "click", "purchase"], 7 * 86400),
        ),
        (
            match_pattern(ev, "view click+ purchase", 7 * 86400),
            match_kleene(ev, ("view", "click", "purchase"), 7 * 86400),
        ),
        (
            match_pattern(ev, "view !purchase", 3600),
            match_absence(ev, first="view", absent="purchase", within_s=3600),
        ),
        (
            match_pattern(ev, "signup view purchase", 86400, mode="skip"),
            match_funnel(ev, ["signup", "view", "purchase"], 86400),
        ),
    ]
    for got_df, want_df in cases:
        got = sorted(map(tuple, got_df.collect()))
        want = sorted(map(tuple, want_df.collect()))
        assert got == want and len(got) > 0


def test_match_pattern_defines_vs_duckdb(spark, sf_dir):
    """DEFINE predicates (value >= threshold on the purchase step) change
    the match set; verify the Kleene compilation against an independent
    DuckDB gaps-and-islands-free formulation (correlated scalar subqueries
    over a rownumbered view)."""
    from pyspark.sql import functions as F

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    thr = 30.0
    got_df = match_pattern(
        ev,
        "view click+ big_purchase",
        7 * 86400,
        defines={
            "big_purchase": (F.col("event_type") == "purchase")
            & (F.col("value") >= thr)
        },
    )
    got = sorted(map(tuple, got_df.collect()))

    con = duckdb.connect()
    con.execute(
        f"create view events as select * from "
        f"read_parquet('{sf_dir}/events.parquet')"
    )
    want = sorted(
        map(
            tuple,
            con.execute(
                f"""
        WITH r AS (
          SELECT user_id, event_id, ts, event_type, value,
                 row_number() OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS rn
          FROM events
        )
        SELECT c.user_id, a.event_id AS anchor_id,
               CAST(c.rn - a.rn - 1 AS BIGINT) AS n_b,
               CAST(floor(epoch(a.ts)) AS BIGINT) AS t0_s,
               CAST(floor(epoch(c.ts)) AS BIGINT) AS t_end_s,
               CAST(floor(epoch(c.ts)) AS BIGINT)
                 - CAST(floor(epoch(a.ts)) AS BIGINT) AS span_s
        FROM r c JOIN r a
          ON a.user_id = c.user_id AND a.rn < c.rn - 1
        WHERE c.event_type = 'purchase' AND c.value >= {thr}
          AND a.event_type <> 'click'
          AND NOT EXISTS (SELECT 1 FROM r m
                          WHERE m.user_id = c.user_id
                            AND m.rn > a.rn AND m.rn < c.rn
                            AND m.event_type <> 'click')
          AND a.event_type = 'view'
          AND c.ts <= a.ts + INTERVAL 604800 SECOND
        """
            ).fetchall(),
        )
    )
    assert got == want and len(got) > 0
    # the DEFINE must actually bite: stricter than the plain pattern
    plain = match_pattern(ev, "view click+ purchase", 7 * 86400).count()
    assert 0 < len(got) < plain


def test_defines_null_predicate_is_nonmatch(spark):
    """A DEFINE predicate that evaluates to NULL (value IS NULL) must read
    as 'step does not match' — absence anchors with NULL-valued candidates
    still count as absent=no-match, and contiguous steps reject the row."""
    import datetime as dt

    from pyspark.sql import functions as F

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        # user 1: A then B-with-null-value -> B's value>=1 DEFINE is NULL
        (1, t0, "a", 1, 1.0),
        (1, t0 + dt.timedelta(seconds=10), "b", 2, None),
        # user 2: A then B-with-value -> matches
        (2, t0, "a", 3, 1.0),
        (2, t0 + dt.timedelta(seconds=10), "b", 4, 2.0),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string, event_id long, value double"
    )
    big_b = (F.col("event_type") == "b") & (F.col("value") >= 1.0)
    got = match_pattern(df, "a big_b", 60, defines={"big_b": big_b}).collect()
    assert [r.user_id for r in got] == [2]
    # absence: user 1's b must NOT count as present (NULL pred -> absent)
    got_abs = match_pattern(df, "a !big_b", 60, defines={"big_b": big_b}).collect()
    assert sorted(r.user_id for r in got_abs) == [1]
