"""Whole-file binary source (reference S1/S3 pattern analog).

The reference's heavyweight-format sources read entire files into memory and
mark themselves unsplittable (``geobeam/io.py:282-286``, ``io.py:150, 246,
327, 433`` — parallelism is per-file). Spark's ``binaryFile`` format is the
same contract: one row per file (path, modificationTime, length, content),
parallel across files. Use for container formats that cannot be
row-split (a zipped shapefile then; a .tar of audio clips now).

The per-archive -> per-record explode runs in mapInArrow (batched), the
``read_records`` generator analog.
"""

from __future__ import annotations

import io
import tarfile
from collections.abc import Iterator

import pyarrow as pa
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEMBER_SCHEMA = StructType(
    [
        StructField("archive", StringType()),
        StructField("member", StringType()),
        StructField("size", LongType()),
        StructField("bytes", BinaryType()),
    ]
)


def read_binary_files(
    spark: SparkSession, path_glob: str, path_filter: str | None = None
) -> DataFrame:
    """One row per file; filter pushes to the file listing."""
    reader = spark.read.format("binaryFile")
    if path_filter:
        reader = reader.option("pathGlobFilter", path_filter)
    return reader.load(path_glob)


def explode_tar_members(df: DataFrame, content_col: str = "content") -> DataFrame:
    """Archive rows -> one row per tar member (1->N generator, the
    ``read_records`` analog; ``GeodatabaseSource``'s skip-empty behavior at
    ``geobeam/io.py:410-416`` maps to dropping zero-byte members)."""
    from dataflow_geobeam_spark.functions.decode import _binary_views

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            names = batch.schema.names
            paths = batch.column(names.index("path")).to_pylist()
            bufs = _binary_views(batch.column(names.index(content_col)))
            out = {"archive": [], "member": [], "size": [], "bytes": []}
            for p, buf in zip(paths, bufs):
                if buf is None:
                    continue
                with tarfile.open(fileobj=io.BytesIO(bytes(buf))) as tf:
                    for m in tf.getmembers():
                        if not m.isfile() or m.size == 0:
                            continue  # skip null/empty members
                        out["archive"].append(p)
                        out["member"].append(m.name)
                        out["size"].append(m.size)
                        out["bytes"].append(tf.extractfile(m).read())
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(out["archive"], type=pa.string()),
                    pa.array(out["member"], type=pa.string()),
                    pa.array(out["size"], type=pa.int64()),
                    pa.array(out["bytes"], type=pa.binary()),
                ],
                names=["archive", "member", "size", "bytes"],
            )

    return df.select("path", content_col).mapInArrow(fn, MEMBER_SCHEMA)
