"""Schema inference + DDL generation (reference util.py analog).

geobeam infers BigQuery sink schemas from source-file metadata with a
fixed fiona->BQ type map (``/root/reference/geobeam/util.py:20-29, 48-93``)
and exposes a CLI (``util.py:174-187``). Here:

* the type alphabet maps to Spark SQL types (SURVEY.md §1.4 table);
* inference reads the parquet/JSON footer via Spark (``df.schema``);
* DDL generation emits the bucket-partitioned CREATE TABLE the engine's
  sink bootstrap would run (reference: Terraform-provisioned clustered
  tables, ``main.tf:22-61``);
* CLI: ``python -m dataflow_geobeam_spark.schema <path> [table_name]``.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.types import (
    ArrayType,
    DataType,
    StructType,
)

# reference BQ_FIELD_TYPES (util.py:20-29) -> Spark SQL DDL types
REFERENCE_TYPE_MAP = {
    "int": "BIGINT",
    "str": "STRING",
    "float": "DOUBLE",
    "bool": "BOOLEAN",
    "date": "DATE",
    "time": "STRING",
    "datetime": "TIMESTAMP",
    "bytes": "BINARY",
}

CLIPS_DDL_COLUMNS = (
    ("clip_id", "STRING"),
    ("bytes", "BINARY"),
    ("sr_hz", "INT"),
    ("dur_ms", "INT"),
    ("codec", "STRING"),
    ("transcript", "STRING"),
    ("ts", "TIMESTAMP"),
)


def infer_schema(spark: SparkSession, path: str) -> StructType:
    """Infer a table schema from a data file (parquet/json/csv by suffix)."""
    if path.endswith(".json") or path.endswith(".jsonl"):
        return spark.read.option("multiLine", "true").json(path).schema
    if path.endswith(".csv"):
        return spark.read.option("header", "true").option("inferSchema", "true").csv(path).schema
    return spark.read.parquet(path).schema


def _ddl_type(dt: DataType) -> str:
    if isinstance(dt, ArrayType):
        return f"ARRAY<{_ddl_type(dt.elementType)}>"
    if isinstance(dt, StructType):
        inner = ", ".join(f"{f.name}: {_ddl_type(f.dataType)}" for f in dt.fields)
        return f"STRUCT<{inner}>"
    return dt.simpleString().upper()


def create_table_ddl(
    schema: StructType,
    table_name: str,
    bucket_col: str | None = "clip_id",
    n_buckets: int = 256,
    fmt: str = "parquet",
) -> str:
    """Bucket-partitioned CREATE TABLE DDL — clip_id-prefix partitioning per
    the north rule (clustering-keys analog of ``main.tf:26,50,58``)."""
    cols = ",\n  ".join(f"{f.name} {_ddl_type(f.dataType)}" for f in schema.fields)
    ddl = f"CREATE TABLE {table_name} (\n  {cols}\n) USING {fmt}"
    if bucket_col and bucket_col in schema.fieldNames():
        ddl += f"\nCLUSTERED BY ({bucket_col}) INTO {n_buckets} BUCKETS"
    return ddl


def clips_table_ddl(table_name: str = "clips", n_buckets: int = 256) -> str:
    """Golden DDL for the input_hint clips table (FIXTURES.md §4 check)."""
    cols = ",\n  ".join(f"{n} {t}" for n, t in CLIPS_DDL_COLUMNS)
    return (
        f"CREATE TABLE {table_name} (\n  {cols}\n) USING parquet"
        f"\nCLUSTERED BY (clip_id) INTO {n_buckets} BUCKETS"
    )


def main() -> None:  # CLI parity with `python -m geobeam.util get_bigquery_schema`
    import sys

    from dataflow_geobeam_spark.session import get_spark

    path = sys.argv[1]
    table = sys.argv[2] if len(sys.argv) > 2 else "inferred_table"
    spark = get_spark("schema-infer", master="local[2]")
    schema = infer_schema(spark, path)
    print(create_table_ddl(schema, table))
    spark.stop()


if __name__ == "__main__":
    main()
