"""Deterministic corpus splitting (train/val/test) — pure Catalyst.

A training-data pipeline must split its corpus REPRODUCIBLY: the same
record lands in the same split on every run, on every cluster size, after
any repartition, and without any RNG state to coordinate across executors
(``rand()`` re-rolls per task attempt — a retried task would silently move
records between splits). The standard trick: hash the record's stable id
and compare against cumulative-fraction thresholds.

Implementation detail that makes the oracle exact: both Spark and DuckDB
produce the same lowercase-hex ``md5`` of the UTF-8 id, and a
lexicographic compare of equal-length lowercase hex strings equals the
numeric compare — so the split is ONE shared expression in both engines,
no float arithmetic, no platform dependence. The 8-hex-char prefix gives
32-bit resolution (fraction granularity 2.3e-10).

Distributed shape: a single projection — no shuffle, no state, pushdown-
friendly (`WHERE split = 'train'` prunes at scan time if the table is
written partitioned by the split column).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_FRACTIONS: tuple[tuple[str, float], ...] = (
    ("train", 0.90),
    ("val", 0.05),
    ("test", 0.05),
)


def split_boundaries(
    fractions: tuple[tuple[str, float], ...] = DEFAULT_FRACTIONS,
) -> list[tuple[str, str | None]]:
    """(label, upper-bound hex-8 or None for the last bucket), cumulative.

    Fractions must sum to 1 (±1e-9). Boundaries are ``floor(cum * 2**32)``
    rendered as zero-padded lowercase hex, comparable against
    ``substr(md5(id), 1, 8)`` in any engine with the same md5/hex rules.
    """
    total = sum(f for _, f in fractions)
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1, got {total}")
    out: list[tuple[str, str | None]] = []
    cum = 0.0
    for i, (label, frac) in enumerate(fractions):
        cum += frac
        if i == len(fractions) - 1:
            out.append((label, None))
        else:
            out.append((label, format(int(cum * (1 << 32)), "08x")))
    return out


def split_expr(
    id_col: Column,
    fractions: tuple[tuple[str, float], ...] = DEFAULT_FRACTIONS,
    salt: str = "",
) -> Column:
    """The split-label expression: chained comparisons of the md5-prefix.

    ``salt`` re-deals the split without touching ids (e.g. per experiment).
    """
    h = F.substring(F.md5(F.concat(id_col.cast("string"), F.lit(salt))), 1, 8)
    bounds = split_boundaries(fractions)
    expr = F.lit(bounds[-1][0])
    for label, ub in reversed(bounds[:-1]):
        expr = F.when(h < F.lit(ub), F.lit(label)).otherwise(expr)
    return expr


def split_sql(
    id_sql: str,
    fractions: tuple[tuple[str, float], ...] = DEFAULT_FRACTIONS,
    salt: str = "",
) -> str:
    """The IDENTICAL expression as ANSI SQL (DuckDB/BigQuery-compatible) —
    the oracle mirror, and what a user would run engine-side elsewhere."""
    bounds = split_boundaries(fractions)
    h = f"substr(md5({id_sql} || '{salt}'), 1, 8)"
    parts = []
    for label, ub in bounds[:-1]:
        parts.append(f"WHEN {h} < '{ub}' THEN '{label}'")
    return "CASE " + " ".join(parts) + f" ELSE '{bounds[-1][0]}' END"


def assign_split(
    df: DataFrame,
    id_col: str,
    fractions: tuple[tuple[str, float], ...] = DEFAULT_FRACTIONS,
    salt: str = "",
    out_col: str = "split",
) -> DataFrame:
    """Append the deterministic split label column."""
    return df.withColumn(out_col, split_expr(F.col(id_col), fractions, salt))


def sample_expr(id_col: Column, rate: Column | float, salt: str = "") -> Column:
    """Deterministic Bernoulli keep-predicate at ``rate``: keep iff the
    record's md5-derived uniform (8 hex chars = 32-bit resolution) falls
    under the rate. Same retry/repartition stability as split_expr;
    ``rate`` may be a per-row Column (joined from a mixture spec)."""
    h = F.substring(F.md5(F.concat(id_col.cast("string"), F.lit(salt))), 1, 8)
    u = F.conv(h, 16, 10).cast("double") / float(1 << 32)
    rate_col = rate if isinstance(rate, Column) else F.lit(float(rate))
    return u < rate_col


def sample_mixture(
    df: DataFrame,
    id_col: str,
    source_col: str,
    rates: dict[str, float],
    salt: str = "",
) -> DataFrame:
    """Weighted multi-source mixture sampling — the corpus-mixing stage of
    a training-data pipeline (e.g. keep 100% of wiki, 30% of crawl):
    every record of source s survives with probability ``rates[s]``,
    DETERMINISTICALLY (same record always makes the same cut, across
    runs, task retries, and cluster sizes). Sources absent from
    ``rates`` are dropped (rate 0).

    Distributed shape: the rates dict becomes a broadcast-joined 1-row-
    per-source frame (never a shuffle of the corpus), and the keep
    predicate is pure Catalyst — a filter that pushes below any
    downstream project/agg.
    """
    spark = df.sparkSession
    rates_df = F.broadcast(
        spark.createDataFrame(
            [(k, float(v)) for k, v in sorted(rates.items())],
            f"{source_col} string, _rate double",
        )
    )
    joined = df.join(rates_df, source_col, "inner")
    return joined.where(sample_expr(F.col(id_col), F.col("_rate"), salt)).drop(
        "_rate"
    )


def sample_threshold_hex(rate: float) -> str | None:
    """The 8-hex-char threshold T such that ``keep ⇔ hex8(md5-prefix) < T``
    equals ``uniform32/2^32 < rate`` EXACTLY: both ``v/2^32`` and
    ``rate*2^32`` are exact in binary64 (power-of-two scaling), so the
    integer comparison below is the same predicate both engines evaluate.
    None means rate >= 1 (keep everything)."""
    import math

    r = float(rate)
    if r >= 1.0:
        return None
    if r <= 0.0:
        return "00000000"
    scaled = r * 4294967296.0  # exact: exponent shift only
    thr = int(math.floor(scaled))
    if scaled != math.floor(scaled):
        thr += 1
    return format(thr, "08x")


def sample_sql(id_sql: str, rate: float, salt: str = "") -> str:
    """``sample_expr`` as ANSI SQL (the oracle mirror): hex-prefix compare
    against the exact threshold — no float arithmetic in the SQL engine."""
    t = sample_threshold_hex(rate)
    if t is None:
        return "TRUE"
    if t == "00000000":
        return "FALSE"
    return f"substr(md5(CAST({id_sql} AS VARCHAR) || '{salt}'), 1, 8) < '{t}'"
