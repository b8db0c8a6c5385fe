"""Paginated REST source (reference S6 ``ESRIServerSource`` analog).

The reference paginates an ArcGIS REST layer on the worker via EsriDumper
and materializes the whole FeatureCollection in memory
(``/root/reference/geobeam/io.py:512-594``). The Spark-first shape is a
DRIVER-side paginated fetch -> ``spark.createDataFrame`` (external REST
endpoints are inherently unsplittable cursors; the driver fetch keeps the
cluster free for the heavy work downstream). For truly large feeds, pages
can be fanned out via a page-number DataFrame + mapInPandas fetch — both
shapes are provided.

The HTTP layer is injectable (``fetch_page``): this sandbox has no network,
tests inject a fake fetcher; on a cluster pass one built on urllib/requests.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame, SparkSession

# fetch_page(page_index) -> list of row dicts; empty list = no more pages
FetchPage = Callable[[int], list[dict]]


def read_paginated(
    spark: SparkSession,
    fetch_page: FetchPage,
    schema,
    max_pages: int = 10_000,
) -> DataFrame:
    """Driver-side cursor pagination -> DataFrame (S6 pattern)."""
    rows: list[dict] = []
    for page in range(max_pages):
        batch = fetch_page(page)
        if not batch:
            break
        rows.extend(batch)
    return spark.createDataFrame(rows, schema)


def read_pages_distributed(
    spark: SparkSession,
    fetch_page: FetchPage,
    schema,
    n_pages: int,
) -> DataFrame:
    """Known page count -> fan pages across executors via mapInPandas.

    Each task fetches its own pages (the fetcher must be picklable);
    parallelism = pages, the Spark analog of Beam's per-file splitting.
    """
    import pandas as pd

    pages = spark.range(0, n_pages, 1, min(n_pages, 64))

    def fetch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for page in pdf["id"].tolist():
                out.extend(fetch_page(int(page)))
            yield pd.DataFrame(out, columns=[f.name for f in schema.fields])

    return pages.mapInPandas(fetch, schema)
