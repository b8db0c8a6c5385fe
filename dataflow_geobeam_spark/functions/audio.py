"""Audio feature operators over decoded PCM columns — pure Catalyst.

The clip -> per-frame explode is the graft analog of the reference's
``DoBlockToPixelExterior`` flat-map (one raster block -> width*height pixel
rows, ``/root/reference/geobeam/fn.py:224-247``) and follows the same
two-level granularity design: coarse I/O unit (clip) -> exploded logical
rows (frames), SURVEY.md §3.2.

Everything here is higher-order array expressions (transform/slice/
aggregate) — JVM-side, no Python, no extra shuffle: the explode multiplies
rows but stays within the same stage until the next aggregate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def frame_starts(pcm: Column, frame: Column, hop: Column) -> Column:
    """1-based start offsets of fixed-size frames with hop (drops tail)."""
    n_frames = F.floor((F.size(pcm) - frame) / hop) + 1
    return F.when(
        F.size(pcm) >= frame,
        F.transform(F.sequence(F.lit(0), n_frames.cast("int") - 1), lambda i: i * hop + 1),
    ).otherwise(F.array().cast("array<int>"))


def frame_rms_expr(pcm: Column, start: Column, frame: Column) -> Column:
    """RMS of pcm[start : start+frame) in double — aggregate over the slice."""
    sl = F.slice(pcm, start, frame)
    ss = F.aggregate(sl, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v)
    return F.sqrt(ss / frame.cast("double"))


def explode_frames(
    df: DataFrame,
    pcm_col: str = "pcm",
    frame_ms: int = 100,
    hop_ms: int = 50,
    sr_col: str = "sr_hz",
) -> DataFrame:
    """Clip rows -> frame rows: (…, frame_idx, frame_start, frame_rms).

    Frame/hop are in milliseconds; sample counts derive from each row's own
    sample rate. Tail samples that don't fill a frame are dropped
    (standard STFT framing).
    """
    pcm = F.col(pcm_col)
    # clamp to >=1 sample: sr_hz * ms < 1000 would truncate to 0 and divide
    # the frame count by zero (silently dropping every frame for that clip)
    frame = F.greatest(F.lit(1), (F.col(sr_col) * frame_ms / 1000).cast("int"))
    hop = F.greatest(F.lit(1), (F.col(sr_col) * hop_ms / 1000).cast("int"))
    starts = frame_starts(pcm, frame, hop)
    out = df.withColumn("_starts", starts).select(
        *[c for c in df.columns if c != pcm_col],
        F.col(pcm_col),
        F.posexplode("_starts").alias("frame_idx", "frame_start"),
    )
    return out.withColumn(
        "frame_rms", F.round(frame_rms_expr(F.col(pcm_col), F.col("frame_start"), frame), 6)
    ).drop(pcm_col)


def dc_offset(pcm: Column) -> Column:
    """Mean sample value (should be ~0 for healthy audio)."""
    return F.aggregate(pcm, F.lit(0.0), lambda a, v: a + v.cast("double")) / F.size(pcm)


def zero_crossing_rate(pcm: Column) -> Column:
    """Fraction of adjacent sample pairs with a sign change — cheap
    voiced/unvoiced discriminator, all in zip_with."""
    a = F.slice(pcm, 1, F.size(pcm) - 1)
    b = F.slice(pcm, 2, F.size(pcm) - 1)
    crossings = F.aggregate(
        F.zip_with(a, b, lambda x, y: F.when(x * y < 0, 1).otherwise(0)),
        F.lit(0),
        lambda acc, v: acc + v,
    )
    return crossings.cast("double") / (F.size(pcm) - 1)


def trim_silence(pcm: Column, threshold: float = 0.01) -> Column:
    """Strip leading/trailing samples below the amplitude threshold.

    Graft analog of the reference's ``trim_polygons`` morphological cleanup
    (``/root/reference/geobeam/fn.py:91-121``): remove degenerate fringe,
    keep the signal body. All-silent input yields an empty array. Pure
    higher-order expressions (filter over index positions).
    """
    idx = F.sequence(F.lit(1), F.size(pcm))
    loud = F.filter(idx, lambda i: F.abs(F.element_at(pcm, i)) >= threshold)
    first, last = F.array_min(loud), F.array_max(loud)
    return F.when(
        F.size(loud) > 0, F.slice(pcm, first, (last - first + F.lit(1)).cast("int"))
    ).otherwise(F.array().cast("array<float>"))


def silence_ratio(pcm: Column, threshold: float = 0.01) -> Column:
    """Fraction of samples under the amplitude threshold."""
    quiet = F.aggregate(
        pcm, F.lit(0), lambda acc, v: acc + F.when(F.abs(v) < threshold, 1).otherwise(0)
    )
    return quiet.cast("double") / F.size(pcm)
