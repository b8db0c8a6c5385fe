"""Paginated REST source (injected fetcher) + spark-submit job entry."""

from __future__ import annotations

import json

from pyspark.sql.types import IntegerType, StringType, StructField, StructType

from dataflow_geobeam_spark.sources import rest

SCHEMA = StructType(
    [StructField("clip_id", StringType()), StructField("sr_hz", IntegerType())]
)


def _make_fetcher():
    # nested so cloudpickle serializes it by value (a module-level function
    # in tests/ is not importable on Spark workers)
    def fetch(page: int) -> list[dict]:
        if page >= 3:
            return []
        return [{"clip_id": f"p{page}c{i}", "sr_hz": 8000 * (page + 1)} for i in range(4)]

    return fetch


def test_read_paginated_driver_side(spark):
    df = rest.read_paginated(spark, _make_fetcher(), SCHEMA)
    assert df.count() == 12
    assert {r.sr_hz for r in df.collect()} == {8000, 16000, 24000}


def test_read_pages_distributed(spark):
    df = rest.read_pages_distributed(spark, _make_fetcher(), SCHEMA, n_pages=3)
    assert df.count() == 12
    assert sorted(r.clip_id for r in df.collect())[0] == "p0c0"


def test_jobs_cli_batch(spark, fixture_dir, tmp_path, capsys):
    from dataflow_geobeam_spark import jobs

    rc = jobs.main(
        [
            "--master",
            "local[4]",
            "batch-window-agg",
            "--fixtures",
            "/root/testdata/sf0.001",
            "--out",
            str(tmp_path / "out"),
        ]
    )
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["rows"] > 0


def test_python_datasource_paginated_rest(spark):
    """PySpark-4 Data Source path: pages fetched lazily in executor tasks,
    partitioned by page range, no driver-side accumulation."""
    from dataflow_geobeam_spark.sources.rest import register_rest_datasource

    assert register_rest_datasource(spark)
    df = (
        spark.read.format("paginated_rest")
        .schema("feature_id long, name string, page long")
        .option("fetcher", "dataflow_geobeam_spark.sources.rest:demo_fetch_page")
        .option("pages_per_partition", "8")
        .option("max_pages", "64")
        .load()
    )
    assert df.rdd.getNumPartitions() == 8  # 64/8 page-range partitions
    assert df.count() == 37 * 25
    got = df.agg({"feature_id": "max", "page": "max"}).collect()[0]
    assert got[0] == 37 * 25 - 1 or got["max(feature_id)"] == 37 * 25 - 1


def test_jobs_query_registry_covers_driver_queries():
    """Every driver-contract query is launchable via the spark-submit CLI."""
    import __spark_entry__ as entrymod
    from dataflow_geobeam_spark.jobs import query_registry

    reg = query_registry()
    short_names = {k.split(".", 1)[1] for k in reg}
    missing = [
        q for q, fn in entrymod.queries().items()
        if fn.__name__ not in short_names
    ]
    assert not missing, missing
