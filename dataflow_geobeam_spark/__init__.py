"""dataflow_geobeam_spark — a PySpark-native streaming analytics engine.

A from-scratch re-expression of the capabilities of
``GoogleCloudPlatform/dataflow-geobeam`` (reference at ``/root/reference``),
grafted from geospatial rasters/vectors onto audio clip + transcript tables
(see SURVEY.md). The reference is a Beam ingestion library
(sources -> per-element normalize -> validity filter -> format -> bulk sink,
``geobeam/io.py``, ``geobeam/fn.py``); this engine keeps that pipeline shape
but is built Spark-first: DataFrame/Catalyst plans, Arrow-vectorized pandas
UDFs (never per-row Python), Structured Streaming with watermarks and
stateful joins, and an exactly-once manifest-committed parquet sink.

Layout:
    fixtures/   deterministic synthetic clip+transcript generator + oracle
    sources/    batch + streaming readers (clips, binary files, fixed-width)
    functions/  vectorized decode, validity, audio features, text analysis
    operators/  windowed aggs, skew-salting, dedup family, similarity search
    streaming/  watermarked pipelines, stateful join, exactly-once sink
    plans/      relational query library (plan-quality reference queries)
"""

__version__ = "0.1.0"

from dataflow_geobeam_spark.session import get_spark  # noqa: F401
