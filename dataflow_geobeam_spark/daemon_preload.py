"""Custom PySpark worker daemon that preloads heavy libraries pre-fork.

PySpark's daemon forks a worker per task slot; imports made INSIDE the
daemon are inherited by every fork for free, but pandas/pyarrow are only
imported lazily by workers AFTER forking. On this host (heavy CPU steal), 8+
workers importing pandas simultaneously at the start of every streaming
query costs 20-60 s. Preloading here makes forks instantly ready.

Enable with: spark.python.daemon.module=dataflow_geobeam_spark.daemon_preload
(set by session.get_spark). The engine's own decode deps preload too.
"""

# ruff: noqa: F401, E402
import os

# One task slot == one core: pin the BLAS pools BEFORE numpy loads OpenBLAS
# (it reads these at library init). Without this every forked worker spawns
# an nproc-wide OpenBLAS pool, so local[2] silently uses the whole machine
# for matmul kernels (wrecking any scaling measurement) and the thread
# thrash is a measured 3x SLOWDOWN on this oversubscribed host. On a real
# cluster this matches how executors are provisioned (1 core per task).
for _v in ("OPENBLAS_NUM_THREADS", "OMP_NUM_THREADS", "MKL_NUM_THREADS"):
    os.environ.setdefault(_v, "1")

import numpy
import pandas
import pyarrow

try:  # engine decode deps (leaf module, cheap once numpy is loaded)
    from dataflow_geobeam_spark import codecs
except Exception:  # pragma: no cover - engine not on PYTHONPATH: still useful
    pass

from pyspark.daemon import manager

if __name__ == "__main__":
    manager()
