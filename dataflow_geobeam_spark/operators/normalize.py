"""Corpus-level feature normalization (CMVN) — pure Catalyst, two-pass.

Cepstral mean-variance normalization is the classic ASR front-end step:
every feature coefficient is shifted/scaled so the CORPUS distribution is
zero-mean unit-variance. Distributed shape (the part that matters at
100 TB):

* pass 1 — one hash aggregate over the corpus computing per-coefficient
  ``avg`` and ``stddev_pop``. Spark's declarative aggregates do map-side
  partial aggregation automatically, so the shuffle carries one partial
  row per task, not the data;
* pass 2 — the 1-row stats frame is **broadcast** back onto the corpus
  (explicit ``F.broadcast`` + cross join: a 1-row build side, never a
  shuffle of the big side), and the normalization is elementwise Catalyst
  arithmetic inside whole-stage codegen.

The reference's analog is corpus-level stats feeding per-record transforms
(BigQuery handles it post-load there, ``/root/reference/geobeam/io.py:35-37``);
here both passes are Spark-native.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cmvn(
    df: DataFrame,
    vec_col: str,
    dim: int,
    id_cols: tuple[str, ...] = ("clip_id",),
    prefix: str = "c",
    round_to: int | None = None,
) -> DataFrame:
    """Normalize ``vec_col`` (array<double>, fixed length ``dim``) to
    corpus zero-mean unit-variance, one output column per coefficient
    (``{prefix}00`` ...). Coefficients with zero corpus variance pass
    through as 0.0 (the CMVN convention for constant features, e.g. an
    all-silence corpus's energy term)."""
    v = F.col(vec_col)
    stats = df.agg(
        *[F.avg(v[i]).alias(f"_mu{i}") for i in range(dim)],
        *[F.stddev_pop(v[i]).alias(f"_sd{i}") for i in range(dim)],
    )
    out = df.crossJoin(F.broadcast(stats))
    cols = []
    for i in range(dim):
        norm = F.when(
            F.col(f"_sd{i}") > 0.0, (v[i] - F.col(f"_mu{i}")) / F.col(f"_sd{i}")
        ).otherwise(F.lit(0.0))
        if round_to is not None:
            norm = F.round(norm, round_to)
        cols.append(norm.alias(f"{prefix}{i:02d}"))
    return out.select(*[F.col(c) for c in id_cols], *cols)
