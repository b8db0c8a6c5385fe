"""Token-to-audio pseudo-alignment: distribute transcript tokens over
speech segments proportionally by duration.

The training-data op ASR pipelines run when no acoustic model is in the
loop yet: give every transcript token a provisional time span inside its
clip's SPEECH (VAD) timeline — silence doesn't count — so downstream
stages can cut per-token windows, filter pathological rate outliers, or
seed a real forced aligner. Token ``i`` of ``n`` owns the speech-time
interval ``[i*T/n, (i+1)*T/n)`` where ``T`` is the clip's total speech
duration; its START point maps back to an absolute clip timestamp through
the segment that contains it.

Everything is pure Catalyst: a per-clip window pass over the (few)
segments for cumulative offsets, a posexplode of the token array, and a
clip_id-equi join with a range containment filter — both sides are tiny
per clip (<=dozens of rows), so the join never amplifies. The arithmetic
is integer until the single ``(i*T)/n`` division, which ANSI SQL
reproduces exactly (the DuckDB oracle runs the identical expression over
the independent golden segment table).

Reference parity: the reference has no alignment ops; this extends the
ASR preprocessing chain (SURVEY.md section 8) past segmentation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["align_tokens_to_segments"]


def align_tokens_to_segments(
    segments: DataFrame,
    transcripts: DataFrame,
    id_col: str = "clip_id",
    text_col: str = "transcript",
) -> DataFrame:
    """Proportional token timing over speech segments.

    ``segments``: (id, seg_idx, start_ms, end_ms) — contiguous speech runs
    in segment order (e.g. plans/audio.audio_vad_segments). ``transcripts``:
    (id, text); rows with empty/whitespace text produce nothing, clips with
    no segments produce nothing (inner join).

    Output: (id, tok_idx, token, seg_idx, t_start_ms) — one row per token,
    ``t_start_ms`` the absolute clip time (round-6 double) where the
    token's speech-time interval begins, ``seg_idx`` the segment containing
    that point.
    """
    w_clip = Window.partitionBy(id_col)
    w_cum = w_clip.orderBy("seg_idx").rowsBetween(Window.unboundedPreceding, -1)
    segs = segments.select(
        id_col,
        "seg_idx",
        "start_ms",
        (F.col("end_ms") - F.col("start_ms")).alias("_d"),
    )
    segs = segs.withColumn(
        "_c_before", F.coalesce(F.sum("_d").over(w_cum), F.lit(0))
    ).withColumn("_t", F.sum("_d").over(w_clip))

    toks = (
        transcripts.select(
            id_col, F.split(F.trim(text_col), r"\s+").alias("_arr")
        )
        .where(F.length(F.trim(text_col)) > 0)
        .select(
            id_col,
            F.size("_arr").alias("_n"),
            F.posexplode("_arr").alias("tok_idx", "token"),
        )
    )
    # speech-time start of token i: (i*T)/n — integer product, one division
    s = (F.col("tok_idx") * F.col("_t")).cast("double") / F.col("_n")
    return (
        toks.join(segs, id_col)
        .where((F.col("_c_before") <= s) & (s < F.col("_c_before") + F.col("_d")))
        .select(
            id_col,
            "tok_idx",
            "token",
            "seg_idx",
            F.round(F.col("start_ms") + s - F.col("_c_before"), 6).alias("t_start_ms"),
        )
    )
