"""Additional streaming operators: watermarked dedup, session/sliding
streams, late-data accounting.

North-rule items beyond the flagship tumbling job (SURVEY.md §2.4 table):
streaming dedup (the WRITE_TRUNCATE idempotence analog done right), session
windows under watermark, and explicit late-data drop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dedup_clips_stream(
    clips: DataFrame, watermark: str = "2 minutes", within_watermark: bool = True
) -> DataFrame:
    """Streaming exact-dedup on clip_id.

    ``dropDuplicatesWithinWatermark`` keeps state only until the watermark
    passes each key's event time — bounded state at any scale, the right
    default for at-least-once upstreams that can re-deliver within a window.
    ``within_watermark=False`` uses global dropDuplicates state (exact across
    the whole stream; state grows with distinct keys).
    """
    wm = clips.withWatermark("ts", watermark)
    if within_watermark:
        return wm.dropDuplicatesWithinWatermark(["clip_id"])
    return wm.dropDuplicates(["clip_id"])


def session_agg_stream(decoded: DataFrame, gap: str = "30 seconds") -> DataFrame:
    """Session-window aggregate over a watermarked decoded stream.

    Spark merges session state across micro-batches; append mode emits a
    session once the watermark passes its end.
    """
    return (
        decoded.groupBy(F.session_window("ts", gap), "bucket")
        .agg(
            F.count(F.lit(1)).alias("n_clips"),
            F.sum(F.col("dur_ms").cast("long")).alias("sum_dur_ms"),
        )
        .select(
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "bucket",
            "n_clips",
            "sum_dur_ms",
        )
    )


def sliding_agg_stream(
    decoded: DataFrame, duration: str = "10 seconds", slide: str = "5 seconds"
) -> DataFrame:
    return (
        decoded.groupBy(F.window("ts", duration, slide), "bucket")
        .agg(F.count(F.lit(1)).alias("n_clips"))
        .select(
            F.col("window.start").alias("window_start"),
            "bucket",
            "n_clips",
        )
    )


def enrich_with_static_dim(
    stream: DataFrame, dim: DataFrame, key: str = "codec"
) -> DataFrame:
    """Stream-static broadcast enrichment join.

    The static side is re-planned per micro-batch (so a slowly-changing
    dimension table re-reads its source on every trigger) and broadcast —
    no shuffle on the stream side, the standard pattern for attaching
    reference data (codec properties, language lexicons, label maps) to a
    high-volume stream. Static-side rows with no match drop stream rows
    only under inner; default left keeps every stream row.
    """
    return stream.join(F.broadcast(dim), key, "left")
