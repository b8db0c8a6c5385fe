"""spark-submit job entry points.

North rule: "run via spark-submit --py-files on a multi-executor cluster".
Package the engine and launch:

    zip -r engine.zip dataflow_geobeam_spark
    spark-submit --py-files engine.zip --master <cluster> \\
        dataflow_geobeam_spark/jobs.py stream-window-agg \\
        --fixtures /data/fixtures/sf0.1 --out /data/out --checkpoint /data/ckpt

Subcommands mirror the reference's example entry points
(``python -m geobeam.examples.<name>``, e.g.
``/root/reference/geobeam/examples/shapefile_nfhl.py:52-64``): argparse
splits job args, the engine builds the plan, the cluster runs it.
"""

from __future__ import annotations

import argparse
import json
import sys


def _spark(args):
    from dataflow_geobeam_spark.session import get_spark

    return get_spark(app_name=args.name, master=args.master or None)


def cmd_stream_window_agg(args) -> int:
    """The flagship streaming job (SURVEY.md §3.3 Spark equivalent)."""
    from dataflow_geobeam_spark.streaming import pipeline
    from dataflow_geobeam_spark.streaming.metrics import EpochMetricsListener

    spark = _spark(args)
    listener = EpochMetricsListener()
    spark.streams.addListener(listener)
    query, sink = pipeline.run_streaming_window_agg(
        spark,
        args.fixtures,
        args.out,
        args.checkpoint,
        watermark=args.watermark,
        duration=args.window,
        available_now=not args.continuous,
    )
    query.awaitTermination(args.timeout if args.timeout > 0 else None)
    print(json.dumps({"committed_epochs": len(sink.committed_manifests()),
                      **listener.summary()}))
    return 0


def cmd_batch_window_agg(args) -> int:
    from dataflow_geobeam_spark.plans import audio

    spark = _spark(args)
    df = audio.audio_window_tumbling(spark, args.fixtures)
    df.write.mode("overwrite").parquet(args.out)
    print(json.dumps({"rows": spark.read.parquet(args.out).count()}))
    return 0


def cmd_schema(args) -> int:
    from dataflow_geobeam_spark import schema as schema_mod

    spark = _spark(args)
    print(schema_mod.create_table_ddl(schema_mod.infer_schema(spark, args.path), args.table))
    return 0


def query_registry() -> dict:
    """name -> (spark, sf_dir) callable, for every public plan function."""
    from dataflow_geobeam_spark.plans import audio, relational, training_data

    registry = {}
    for mod in (audio, relational, training_data):
        short = mod.__name__.rsplit(".", 1)[-1]
        for name in dir(mod):
            fn = getattr(mod, name)
            if (
                callable(fn)
                and not name.startswith("_")
                and getattr(fn, "__module__", None) == mod.__name__
            ):
                registry[f"{short}.{name}"] = fn
    return registry


def cmd_query(args) -> int:
    """Run any plan-library query by dotted name and write parquet —
    makes the full query surface spark-submit-launchable, not just the
    flagship. ``--list`` prints the registry."""
    registry = query_registry()
    if args.list:
        print("\n".join(sorted(registry)))
        return 0
    spark = _spark(args)
    df = registry[args.query](spark, args.fixtures)
    df.write.mode("overwrite").parquet(args.out)
    print(json.dumps({"query": args.query, "rows": spark.read.parquet(args.out).count()}))
    return 0


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="dataflow_geobeam_spark.jobs")
    p.add_argument("--master", default=None)
    p.add_argument("--name", default="dataflow-geobeam-spark-job")
    sub = p.add_subparsers(dest="cmd", required=True)

    s1 = sub.add_parser("stream-window-agg")
    s1.add_argument("--fixtures", required=True)
    s1.add_argument("--out", required=True)
    s1.add_argument("--checkpoint", required=True)
    s1.add_argument("--watermark", default="2 minutes")
    s1.add_argument("--window", default="10 seconds")
    s1.add_argument("--continuous", action="store_true")
    s1.add_argument("--timeout", type=int, default=0)
    s1.set_defaults(fn=cmd_stream_window_agg)

    s2 = sub.add_parser("batch-window-agg")
    s2.add_argument("--fixtures", required=True)
    s2.add_argument("--out", required=True)
    s2.set_defaults(fn=cmd_batch_window_agg)

    s4 = sub.add_parser("query")
    s4.add_argument("query", nargs="?", default="")
    s4.add_argument("--fixtures", default="/root/testdata/sf0.01")
    s4.add_argument("--out", default="/tmp/query_out")
    s4.add_argument("--list", action="store_true")
    s4.set_defaults(fn=cmd_query)

    s3 = sub.add_parser("schema")
    s3.add_argument("path")
    s3.add_argument("table", nargs="?", default="inferred_table")
    s3.set_defaults(fn=cmd_schema)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
