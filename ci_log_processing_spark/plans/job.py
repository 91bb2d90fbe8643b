"""spark-submit entry point: the whole parse -> enrich -> route ->
aggregate job with multi-sink fan-out, checkpointing and
per-partition lineage metrics.

Usage (local or cluster — only master/size differ):

  spark-submit --py-files ci_log_processing_spark.zip \
      -m ci_log_processing_spark.plans.job \
      --input-dir /root/testdata/sf0.001 \
      --output-dir /tmp/clp_out \
      [--batch-ts "2024-01-01 00:00:00"] [--ref-year 2024] \
      [--impl native|pandas] [--no-skip-debug]

Writes:
  <out>/sinks/<sink>/         per-sink parquet (Iceberg-analog
                              tables, partitioned by sink date)
  <out>/agg_hourly/           per-sink windowed counts
  <out>/checkpoint/           processed conv manifest (resume via
                              left-anti join on next run)
  <out>/metrics/              per-partition lineage + row counts
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--input-dir", required=True)
    ap.add_argument("--output-dir", required=True)
    ap.add_argument("--batch-ts", default="2024-01-01 00:00:00")
    ap.add_argument("--ref-year", type=int, default=2024)
    ap.add_argument("--impl", choices=["native", "pandas"], default="native")
    ap.add_argument("--no-skip-debug", action="store_true")
    ap.add_argument("--master", default=None)
    ap.add_argument("--transcripts-parquet", default=None,
                    help="read a materialized transcripts table instead of deriving from events")
    args = ap.parse_args(argv)

    from pyspark.sql import functions as F

    from ..session import get_spark
    from ..sources.transcripts import load_transcripts
    from .pipeline import full_pipeline
    from ..operators.aggregate import hourly_agg, sink_counts
    from ..operators.checkpoint import filter_unprocessed, write_checkpoint
    from ..operators.route import SINKS

    spark = get_spark(master=args.master)
    t0 = time.time()

    if args.transcripts_parquet:
        transcripts = spark.read.parquet(args.transcripts_parquet)
    else:
        transcripts = load_transcripts(spark, args.input_dir)

    ckpt_dir = os.path.join(args.output_dir, "checkpoint")
    transcripts, already = filter_unprocessed(spark, transcripts, ckpt_dir)

    routed = full_pipeline(
        transcripts,
        spark,
        batch_ts=args.batch_ts,
        ref_year=args.ref_year,
        skip_debug=not args.no_skip_debug,
        impl=args.impl,
    ).withColumn("src_partition", F.spark_partition_id())

    # one persisted parse, four filtered writes — the reference's
    # per-file routing (logsender.py:474-489) as disjoint predicates.
    # Writes are APPEND-mode batches tagged with batch_id: the
    # checkpoint makes re-runs skip processed convs, so a completed
    # batch is never rewritten (at-least-once like the reference's
    # remove-dir-on-success, logsender.py:550-560; a real Iceberg
    # sink upgrades this to exactly-once via snapshot commit).
    batch_id = args.batch_ts.replace(" ", "T").replace(":", "-")
    routed = routed.withColumn("batch_id", F.lit(batch_id)).persist()
    try:
        n_rows = routed.count()
        counts = {}
        if n_rows > 0:
            for sink in SINKS:
                (
                    routed.filter(F.col("sink") == sink)
                    .withColumn("event_date", F.to_date("filled_ts"))
                    .write.mode("append")
                    .partitionBy("event_date")
                    .parquet(os.path.join(args.output_dir, "sinks", sink))
                )
            hourly_agg(routed).withColumn(
                "batch_id", F.lit(batch_id)
            ).write.mode("append").parquet(
                os.path.join(args.output_dir, "agg_hourly")
            )
            # per-partition lineage/throughput metrics
            # (reference analog: Prometheus per-job gauges,
            # logscraper.py:295-304)
            metrics = routed.groupBy("src_partition", "sink").agg(
                F.count(F.lit(1)).alias("rows"),
                F.countDistinct("conv_id").alias("convs"),
            )
            metrics.withColumn("batch_id", F.lit(batch_id)).write.mode(
                "append"
            ).parquet(os.path.join(args.output_dir, "metrics"))
            write_checkpoint(routed, ckpt_dir)
            counts = {
                r["sink"]: r["cnt"] for r in sink_counts(routed).collect()
            }
    finally:
        routed.unpersist()

    wall = time.time() - t0
    summary = {
        "rows": n_rows,
        "skipped_already_processed": already,
        "sinks": counts,
        "wall_sec": round(wall, 2),
        "rows_per_sec": round(n_rows / wall, 1) if wall > 0 else None,
        "impl": args.impl,
    }
    print(json.dumps(summary))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
