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
