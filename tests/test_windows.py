"""Window-assignment math: tumbling/sliding/session vs hand-computed oracle."""

from datetime import datetime, timedelta

from pyspark.sql import functions as F
from pyspark.sql.types import StructType, StructField, StringType, TimestampType, IntegerType

from dataflow_geobeam_spark.operators import windows

SCHEMA = StructType(
    [
        StructField("bucket", StringType()),
        StructField("ts", TimestampType()),
        StructField("dur_ms", IntegerType()),
    ]
)
T0 = datetime(2026, 1, 1)


def _df(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def AGGS():
    return (F.count(F.lit(1)).alias("n"), F.sum("dur_ms").alias("s"))


def test_tumbling_assignment(spark):
    rows = [
        ("a", T0 + timedelta(seconds=0), 1),
        ("a", T0 + timedelta(seconds=9, milliseconds=999), 2),
        ("a", T0 + timedelta(seconds=10), 4),  # boundary: next window
        ("b", T0 + timedelta(seconds=5), 8),
    ]
    out = {
        (r.bucket, r.window_start.second): (r.n, r.s)
        for r in windows.tumbling(_df(spark, rows), "10 seconds", aggs=AGGS()).collect()
    }
    assert out == {("a", 0): (2, 3), ("a", 10): (1, 4), ("b", 0): (1, 8)}


def test_sliding_each_row_in_two_windows(spark):
    rows = [("a", T0 + timedelta(seconds=7), 1)]
    out = sorted(
        r.window_start.second
        for r in windows.sliding(_df(spark, rows), "10 seconds", "5 seconds", aggs=AGGS()).collect()
    )
    assert out == [0, 5]  # [0,10) and [5,15) both contain t=7


def test_session_gap_semantics(spark):
    rows = [
        ("a", T0, 1),
        ("a", T0 + timedelta(seconds=29, milliseconds=999), 2),  # merges (< gap)
        ("a", T0 + timedelta(seconds=70), 4),  # new session (>= gap after 29.999)
        ("b", T0, 8),
    ]
    out = windows.session(_df(spark, rows), "30 seconds", aggs=AGGS()).collect()
    by_key = {(r.bucket, r.window_start): (r.n, r.s, r.window_end) for r in out}
    assert len(by_key) == 3
    a_first = by_key[("a", T0)]
    assert a_first[0] == 2 and a_first[1] == 3
    # session end = last event + gap
    assert a_first[2] == T0 + timedelta(seconds=59, milliseconds=999)


def test_session_exact_gap_merges(spark):
    # Spark's session_window is inclusive at the gap boundary: an event at
    # exactly last_ts + gap still extends the session.
    rows = [("a", T0, 1), ("a", T0 + timedelta(seconds=30), 2)]
    out = windows.session(_df(spark, rows), "30 seconds", aggs=AGGS()).collect()
    assert len(out) == 1 and out[0].n == 2
    rows = [("a", T0, 1), ("a", T0 + timedelta(seconds=30, microseconds=1), 2)]
    out = windows.session(_df(spark, rows), "30 seconds", aggs=AGGS()).collect()
    assert len(out) == 2  # diff > gap => separate sessions


def test_with_bucket_prefix(spark):
    df = spark.createDataFrame([("ab123",), ("cd456",)], ["clip_id"])
    got = {r.bucket for r in windows.with_bucket(df).collect()}
    assert got == {"ab", "cd"}
