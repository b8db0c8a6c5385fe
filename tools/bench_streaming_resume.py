"""Streaming kill/restart under the production-shaped bench config
(round-4 VERDICT #4).

Exactly-once resume was unit-tested at small scale (tests/test_streaming*);
this harness proves it under the SAME configuration the scaling bench
publishes: sf0.1 x12 payload on the tmpfs stream dir, 96 files / 32 per
trigger, local[4].

Protocol:
1. Reference run: uninterrupted availableNow drain -> committed row set.
2. Crash run: the identical job in a CHILD PROCESS GROUP; the parent
   watches the sink's manifest dir and SIGKILLs the whole group (Python
   driver + JVM) mid-epoch-2 — a real crash, not a graceful stop().
3. Resume run: same checkpoint + sink dirs, fresh session; Spark replays
   the in-flight epoch from the offset WAL, the sink's idempotent commit
   skips already-durable epochs, orphan files from the killed attempt are
   invisible to the manifest-based read.
4. Assert: same committed epoch ids and an IDENTICAL final row set
   (merge-on-read latest per key) as the reference run.

Reference precedent for per-run idempotence: WRITE_TRUNCATE re-runs in
``/root/reference/geobeam/examples/shapefile_nfhl.py:43-49`` — geobeam
delegates replay safety to BigQuery truncation; here the engine owns it
via epoch manifests + checkpoint offsets.

Writes BENCH/streaming_resume.json. Usage:
    python tools/bench_streaming_resume.py            # full protocol
    python tools/bench_streaming_resume.py --child OUT CK   # internal
"""

from __future__ import annotations

import json
import os
import signal
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.bench_streaming import (  # noqa: E402
    FILES_PER_TRIGGER,
    N_FILES,
    REPLICATE,
    SF_DIR,
    prebuild_stream_dir,
)

CPUS = 4
MANIFEST_GLOB_DIR = "_manifests"


def _make_spark():
    from dataflow_geobeam_spark.session import get_spark

    spark = get_spark(
        f"stream-resume-{os.getpid()}",
        master=f"local[{CPUS}]",
        shuffle_partitions=CPUS,
        extra_conf={
            "spark.sql.files.maxPartitionBytes": "256m",
            "spark.sql.files.openCostInBytes": "0",
            "spark.driver.memory": "6g",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def run_drain(out_dir: str, ck_dir: str) -> None:
    """One availableNow drain of the bench stream into (out_dir, ck_dir)."""
    from dataflow_geobeam_spark.fixtures import ensure_fixtures
    from dataflow_geobeam_spark.streaming import pipeline

    fx = ensure_fixtures(SF_DIR)
    stream_dir = prebuild_stream_dir()
    spark = _make_spark()
    query, _sink = pipeline.run_streaming_window_agg(
        spark,
        fx,
        out_dir,
        ck_dir,
        n_files=N_FILES,
        max_files_per_trigger=FILES_PER_TRIGGER,
        available_now=True,
        replicate=REPLICATE,
        stream_dir=stream_dir,
    )
    query.awaitTermination(1800)
    spark.stop()


def _manifest_epochs(out_dir: str) -> list[int]:
    mdir = os.path.join(out_dir, MANIFEST_GLOB_DIR)
    if not os.path.isdir(mdir):
        return []
    return sorted(
        int(f.split(".")[0])
        for f in os.listdir(mdir)
        if f.endswith(".json") and not f.startswith("compact")
    )


def _final_rows(out_dir: str) -> tuple[list[int], set]:
    """(committed epoch ids, final merge-on-read row set) — semantic
    columns only (floats rounded to 6dp; lineage columns checked for
    presence but excluded from the value compare: _source_partition
    depends on which attempt's task wrote the surviving file)."""
    from dataflow_geobeam_spark.streaming.sink import ExactlyOnceParquetSink

    spark = _make_spark()
    sink = ExactlyOnceParquetSink(out_dir)
    df = sink.read_latest(spark, ["window_start", "window_end", "bucket"])
    assert "_epoch_id" in df.columns and "_source_partition" in df.columns
    rows = {
        (
            r["window_start"].isoformat(),
            r["window_end"].isoformat(),
            r["bucket"],
            int(r["n_clips"]),
            int(r["sum_dur_ms"]),
            round(float(r["mean_rms"]), 6),
            int(r["sum_samples"]),
        )
        for r in df.collect()
    }
    epochs = sorted({m["epoch_id"] for m in sink.committed_manifests() if "covers_max" not in m})
    spark.stop()
    return epochs, rows


def crash_run(out_dir: str, ck_dir: str, kill_after_epoch: int = 1) -> dict:
    """Spawn the drain in a child process group; SIGKILL the whole group
    mid-way through the epoch after ``kill_after_epoch`` commits."""
    child = subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), "--child", out_dir, ck_dir],
        start_new_session=True,
        stdout=subprocess.DEVNULL,
        stderr=subprocess.DEVNULL,
    )
    t0 = time.time()
    commit_times: dict[int, float] = {}
    try:
        while True:
            if child.poll() is not None:
                return {"killed": False, "epochs_at_exit": _manifest_epochs(out_dir)}
            for e in _manifest_epochs(out_dir):
                commit_times.setdefault(e, time.time())
            if kill_after_epoch in commit_times:
                # mid-epoch kill: wait ~40% of the observed inter-commit gap
                gap = (
                    commit_times[kill_after_epoch] - commit_times[kill_after_epoch - 1]
                    if kill_after_epoch - 1 in commit_times
                    else commit_times[kill_after_epoch] - t0
                )
                time.sleep(max(1.0, 0.4 * gap))
                break
            if time.time() - t0 > 1200:
                raise TimeoutError("crash_run: epoch commits never appeared")
            time.sleep(0.25)
        os.killpg(child.pid, signal.SIGKILL)
        child.wait(timeout=60)
    finally:
        if child.poll() is None:
            os.killpg(child.pid, signal.SIGKILL)
    return {
        "killed": True,
        "kill_delay_into_epoch_sec": round(max(1.0, 0.4 * gap), 2),
        "epochs_at_kill": _manifest_epochs(out_dir),
    }


def main() -> None:
    import shutil
    import tempfile

    if len(sys.argv) >= 2 and sys.argv[1] == "--child":
        run_drain(sys.argv[2], sys.argv[3])
        return

    prebuild_stream_dir()
    base = tempfile.mkdtemp(prefix="stream_resume_")
    ref_out, ref_ck = os.path.join(base, "ref_out"), "/dev/shm/resume_ref_ck_%d" % os.getpid()
    cr_out, cr_ck = os.path.join(base, "crash_out"), "/dev/shm/resume_crash_ck_%d" % os.getpid()
    result: dict = {"config": {
        "sf_dir": SF_DIR, "cpus": CPUS, "n_files": N_FILES,
        "files_per_trigger": FILES_PER_TRIGGER, "replicate": REPLICATE,
    }}
    try:
        t0 = time.time()
        run_drain(ref_out, ref_ck)
        result["reference_wall_sec"] = round(time.time() - t0, 1)
        ref_epochs, ref_rows = _final_rows(ref_out)

        t1 = time.time()
        kill_info = crash_run(cr_out, cr_ck)
        result["crash"] = kill_info
        if not kill_info.get("killed"):
            raise RuntimeError("child finished before the kill landed; rerun")

        t2 = time.time()
        run_drain(cr_out, cr_ck)  # resume from the same checkpoint + sink
        result["resume_wall_sec"] = round(time.time() - t2, 1)
        result["crash_plus_resume_wall_sec"] = round(time.time() - t1, 1)
        got_epochs, got_rows = _final_rows(cr_out)

        result["reference_epochs"] = ref_epochs
        result["resumed_epochs"] = got_epochs
        result["reference_rows"] = len(ref_rows)
        result["resumed_rows"] = len(got_rows)
        result["epochs_match"] = got_epochs == ref_epochs
        result["rows_match"] = got_rows == ref_rows
        result["exactly_once_verified"] = bool(
            result["epochs_match"] and result["rows_match"] and kill_info["killed"]
        )
        os.makedirs("BENCH", exist_ok=True)
        with open("BENCH/streaming_resume.json", "w") as f:
            json.dump(result, f, indent=1)
        print(json.dumps(result))
        if not result["exactly_once_verified"]:
            sys.exit(1)
    finally:
        shutil.rmtree(base, ignore_errors=True)
        shutil.rmtree(ref_ck, ignore_errors=True)
        shutil.rmtree(cr_ck, ignore_errors=True)


if __name__ == "__main__":
    main()
