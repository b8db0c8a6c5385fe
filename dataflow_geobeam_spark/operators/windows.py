"""Event-time windowed aggregations (tumbling / sliding / session).

The reference delegates ALL aggregation to BigQuery post-load
(ELT by design, ``/root/reference/geobeam/io.py:35-37``; clustering for it,
``main.tf:22-61``); the north rule pulls it into the engine. These builders
work identically on batch DataFrames and on watermarked streaming
DataFrames — the same plan fragment serves both, which is how we verify the
streaming pipeline against a batch oracle.

Scale notes:
* Aggregates run as Catalyst HashAggregate with partial (map-side) combine,
  so the shuffle carries one row per (key, window) per input partition —
  safe at 100 TB as long as key cardinality is bounded (clip_id-prefix
  buckets: 256).
* The metric columns are ~50 bytes/row because the decode fast path reduced
  PCM to scalars before the shuffle (see functions/decode.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

def standard_aggs():
    """Default metric aggregates (built lazily: Column exprs need a session)."""
    return (
        F.count(F.lit(1)).alias("n_clips"),
        F.sum(F.col("dur_ms").cast("long")).alias("sum_dur_ms"),
        F.avg("rms").alias("mean_rms"),
        F.max("peak").alias("max_peak"),
        F.sum("n_samples").alias("sum_samples"),
    )


def _finish(grouped, aggs, flat_window: bool) -> DataFrame:
    aggs = aggs if aggs is not None else standard_aggs()
    out = grouped.agg(*aggs)
    if flat_window:
        wcol = "session_window" if "session_window" in out.columns else "window"
        out = out.select(
            *[c for c in out.columns if c != wcol],
            F.col(f"{wcol}.start").alias("window_start"),
            F.col(f"{wcol}.end").alias("window_end"),
        )
    return out


def tumbling(
    df: DataFrame,
    duration: str = "10 seconds",
    keys: tuple[str, ...] = ("bucket",),
    ts_col: str = "ts",
    aggs=None,
    flat_window: bool = True,
) -> DataFrame:
    """groupBy(window(ts, d), *keys).agg(...) — fixed, non-overlapping."""
    return _finish(df.groupBy(F.window(ts_col, duration), *keys), aggs, flat_window)


def sliding(
    df: DataFrame,
    duration: str = "10 seconds",
    slide: str = "5 seconds",
    keys: tuple[str, ...] = ("bucket",),
    ts_col: str = "ts",
    aggs=None,
    flat_window: bool = True,
) -> DataFrame:
    """Overlapping windows: each row lands in duration/slide windows."""
    return _finish(df.groupBy(F.window(ts_col, duration, slide), *keys), aggs, flat_window)


def session(
    df: DataFrame,
    gap: str = "30 seconds",
    keys: tuple[str, ...] = ("bucket",),
    ts_col: str = "ts",
    aggs=None,
    flat_window: bool = True,
) -> DataFrame:
    """Data-driven session windows: a session closes after ``gap`` of silence
    per key. Uses Spark's native session_window (merging state in streaming)."""
    return _finish(df.groupBy(F.session_window(ts_col, gap), *keys), aggs, flat_window)


def with_bucket(df: DataFrame, clip_id_col: str = "clip_id", prefix_len: int = 2) -> DataFrame:
    """Derive the clip_id-prefix partition key (north rule's bucket key).

    Analog of the reference's BigQuery clustering keys (``main.tf:26,50,58``)
    — a low-cardinality prefix that co-locates related rows.
    """
    return df.withColumn("bucket", F.substring(F.col(clip_id_col), 1, prefix_len))
