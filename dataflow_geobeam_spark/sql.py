"""SQL surface: register the testdata tables as temp views so every
operator is reachable from ``spark.sql`` as well as the DataFrame API.

The reference exposes its outputs to SQL by loading into BigQuery
(``/root/reference/geobeam/io.py:35-37``); here the engine IS the SQL
engine — Catalyst compiles ``spark.sql(...)`` and the DataFrame plans to
the same physical operators, so the two surfaces are interchangeable
(pinned by tests/test_sql_surface.py).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def register_views(spark: SparkSession, sf_dir: str) -> list[str]:
    """Create a temp view per testdata parquet table; returns the names."""
    registered = []
    for name in TESTDATA_TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            spark.read.parquet(path).createOrReplaceTempView(name)
            registered.append(name)
    return registered


def q1_pricing_summary_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 via spark.sql — compiles to the same plan as the
    DataFrame form in plans/relational.py."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               sum(l_quantity)                                       AS sum_qty,
               sum(l_extendedprice)                                  AS sum_base_price,
               sum(l_extendedprice * (1 - l_discount))               AS sum_disc_price,
               sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)) AS sum_charge,
               avg(l_quantity)                                       AS avg_qty,
               avg(l_extendedprice)                                  AS avg_price,
               avg(l_discount)                                       AS avg_disc,
               count(*)                                              AS count_order
        FROM lineitem
        WHERE l_shipdate <= CAST('1998-09-02' AS timestamp)
        GROUP BY l_returnflag, l_linestatus
        """
    )


def events_tumbling_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed aggregate via SQL window() table function."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT window.start AS window_start, event_type,
               count(*) AS n_events,
               round(avg(value), 6) AS avg_value
        FROM events
        GROUP BY window(ts, '1 hour'), event_type
        """
    )


def corpus_split_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic split census via spark.sql — the SAME md5-prefix
    CASE the DataFrame form and the DuckDB oracle use
    (operators/split.split_sql emits engine-portable ANSI SQL), proving
    the split expression is one artifact across all three surfaces."""
    from dataflow_geobeam_spark.operators.split import split_sql

    register_views(spark, sf_dir)
    return spark.sql(
        f"""
        SELECT {split_sql("doc_id")} AS split,
               count(*) AS n_docs,
               sum(n_chars) AS sum_chars
        FROM documents
        GROUP BY 1
        """
    )


def pack_sequences_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing via spark.sql — the identical window SQL the
    DuckDB oracle runs; compiles to the same one-exchange/one-Window
    plan as operators/packing.pack_greedy."""
    register_views(spark, sf_dir)
    return spark.sql(
        r"""
        WITH d AS (
          SELECT doc_id, source,
                 CASE WHEN trim(text) = '' THEN 0
                      ELSE size(split(trim(text), '\\s+'))
                 END AS n_tok
          FROM documents
        ), packed AS (
          SELECT source, n_tok,
                 sum(n_tok) OVER (PARTITION BY source ORDER BY doc_id
                                  ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND CURRENT ROW) AS cum
          FROM d
        )
        SELECT source,
               CAST(floor((cum - n_tok) / 512) AS BIGINT) AS chunk_id,
               count(*) AS n_docs,
               sum(n_tok) AS n_tokens
        FROM packed
        GROUP BY 1, 2
        """
    )
