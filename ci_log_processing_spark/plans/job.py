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
    # native is the default: measured faster than the pandas grok at
    # BOTH local[8] (948k vs 537k compute rows/s) and local[32]
    # (2.41M vs 1.42M) with better N->4N efficiency (BASELINE.md).
    # --impl pandas stays as the mandated-path parity option.
    ap.add_argument("--impl", choices=["native", "pandas"], default="native")
    ap.add_argument("--no-skip-debug", action="store_true")
    # fan-out write strategy (measured in BASELINE.md):
    #   repartition — one exchange keyed on the table partition scheme;
    #     cleanest file layout (files track sink x date), but write
    #     parallelism collapses to the number of distinct
    #     (sink, date) combos — a skew/straggler risk at scale;
    #   salted — same exchange plus a conv-hash salt: file layout
    #     stays (sink x date x salt) while write parallelism is
    #     combos x salt, removing the one-task-per-date straggler;
    #   direct — NO exchange: write straight from the pipeline's
    #     conv-keyed distribution with
    #     spark.sql.maxConcurrentOutputFileWriters keeping up to N
    #     partition writers open per task (sort-free dynamic write);
    #     fewest shuffles, most output files.
    ap.add_argument(
        "--write-strategy",
        choices=["repartition", "salted", "direct"],
        default="repartition",
    )
    ap.add_argument("--write-salt", type=int, default=8)
    ap.add_argument("--no-write", action="store_true",
                    help="run parse->enrich->route and count per-sink "
                         "rows without writing sinks (isolates engine "
                         "throughput from single-disk sink bandwidth "
                         "in scaling measurements)")
    ap.add_argument("--master", default=None)
    ap.add_argument("--transcripts-parquet", default=None,
                    help="read a materialized transcripts table instead of deriving from events")
    ap.add_argument("--summary-json", default=None,
                    help="also write the run summary JSON to this file "
                         "(stdout can interleave with JVM GC logs)")
    args = ap.parse_args(argv)

    from pyspark.sql import functions as F

    from ..session import get_spark
    from ..sources.transcripts import load_transcripts
    from .pipeline import full_pipeline
    from ..operators.aggregate import hourly_agg, sink_counts
    from ..operators.checkpoint import filter_unprocessed, write_checkpoint

    spark = get_spark(master=args.master)
    t0 = time.time()

    # conv-level metadata presence drives the no_metadata drop rule
    # (reference: builds without buildinfo/inventory never route,
    # logsender.py:136-141). The events-derived input ships a conv
    # metadata table; a materialized transcripts parquet may ship a
    # conv_meta.parquet sibling — absent that, all convs are treated
    # as having metadata.
    meta = None
    if args.transcripts_parquet:
        transcripts = spark.read.parquet(args.transcripts_parquet)
        meta_path = os.path.join(
            os.path.dirname(args.transcripts_parquet.rstrip("/")),
            "conv_meta.parquet",
        )
        # Hadoop FS, not os.path: the transcripts path is an
        # HDFS/S3 URI in the deployment this job is designed for,
        # where os.path.exists would silently disable the
        # no_metadata rule
        jvm = spark._jvm
        hpath = jvm.org.apache.hadoop.fs.Path(meta_path)
        fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
        if fs.exists(hpath):
            meta = spark.read.parquet(meta_path)
    else:
        from ..sources.derived import conv_meta_sql

        transcripts = load_transcripts(spark, args.input_dir)
        meta = spark.sql(conv_meta_sql("spark", "events"))

    ckpt_dir = os.path.join(args.output_dir, "checkpoint")
    transcripts, already = filter_unprocessed(spark, transcripts, ckpt_dir)

    routed = full_pipeline(
        transcripts,
        spark,
        batch_ts=args.batch_ts,
        ref_year=args.ref_year,
        skip_debug=not args.no_skip_debug,
        impl=args.impl,
        meta=meta,
    ).withColumn("src_partition", F.spark_partition_id())

    # The reference routes per file into 3 indices inside one pass
    # (send_to_es, logsender.py:474-489). Spark translation that
    # survives scale: ONE write job with partitionBy(sink, event_date)
    # — a single shuffle keyed on the table partition scheme, files
    # track (sink x date) not tasks x dates, and no wide-row cache is
    # ever built (persisting the parsed DF measured 2x the cost of
    # writing it). Aggregates/metrics/checkpoint then run over the
    # just-written columnar data with sink/date pruning for free.
    # Writes are APPEND-mode batches tagged with batch_id; the conv
    # checkpoint makes re-runs skip processed convs (at-least-once
    # like the reference's remove-dir-on-success, logsender.py:550-560;
    # a real Iceberg sink upgrades this to exactly-once snapshots).
    batch_id = args.batch_ts.replace(" ", "T").replace(":", "-")
    sinks_dir = os.path.join(args.output_dir, "sinks")
    routed = (
        routed.withColumn("batch_id", F.lit(batch_id))
        .withColumn("event_date", F.to_date("filled_ts"))
        # sink docs keep `message`, not the raw line (the reference's
        # ES documents likewise store the split message, doc_iter
        # logsender.py:416-428); dropping text+ts cuts the fan-out
        # exchange + file bytes ~40%. prior_ts_count is routing
        # scratch — never a sink column.
        .drop("text", "ts", "prior_ts_count")
    )
    counts = {}
    # Row count of THIS write comes from an Observation on the write
    # job itself — no separate count pass over the anti-joined input.
    # A fully-checkpointed input observes 0 rows and must stay a
    # no-op: in particular it must NOT re-read this batch_id's
    # previous rows and re-append aggregates.
    from pyspark.sql import Observation

    obs = Observation("routed_rows")
    phases = {}
    t_w = time.time()
    if args.no_write:
        # warmup on a 2% sample: pays the one-time Janino codegen /
        # JIT compile (~8-10 s, identical generated classes) outside
        # the measured window, so wall_sec is steady-state engine
        # throughput — the quantity that scales with executors on a
        # real cluster where compile cost amortizes to zero
        routed.sample(0.02, seed=7).groupBy("sink").agg(
            F.count(F.lit(1))
        ).collect()
        t0 = time.time()
        t_w = time.time()
        counts = {
            r["sink"]: r["cnt"]
            for r in routed.groupBy("sink")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .collect()
        }
        n_rows = sum(counts.values())
        phases["fanout_write_sec"] = round(time.time() - t_w, 2)
        wall = time.time() - t0
        summary = {
            "rows": n_rows,
            "skipped_already_processed": already,
            "sinks": counts,
            "wall_sec": round(wall, 2),
            "rows_per_sec": round(n_rows / wall, 1) if wall > 0 else None,
            "impl": args.impl,
            "no_write": True,
            **phases,
        }
        print(json.dumps(summary))
        if args.summary_json:
            with open(args.summary_json, "w") as f:
                json.dump(summary, f)
        spark.stop()
        return 0
    w = routed.observe(obs, F.count(F.lit(1)).alias("n"))
    if args.write_strategy == "repartition":
        w = w.repartition(F.col("sink"), F.col("event_date"))
    elif args.write_strategy == "salted":
        w = w.repartition(
            F.col("sink"),
            F.col("event_date"),
            # pmod, not %: xxhash64 is signed, and negative
            # remainders would double the salt cells to 2*salt-1
            F.pmod(F.xxhash64("conv_id"), args.write_salt).alias("_salt"),
        )
    else:  # direct: sort-free dynamic-partition write, no exchange
        spark.conf.set("spark.sql.maxConcurrentOutputFileWriters", "160")
    # sink DDL seam (sinks.TableSink): ParquetDirSink here; a real
    # Iceberg catalog slots in as IcebergTableSink without touching
    # the plan (create_indices analog, logsender.py:563-618)
    from ..sinks import ParquetDirSink

    table = ParquetDirSink(sinks_dir)
    table.ensure(spark)
    table.append(w)
    n_rows = obs.get["n"]
    phases["fanout_write_sec"] = round(time.time() - t_w, 2)
    t_w = time.time()
    if n_rows > 0:
        written = spark.read.parquet(sinks_dir).filter(
            F.col("batch_id") == batch_id
        )
        hourly_agg(written).withColumn(
            "batch_id", F.lit(batch_id)
        ).write.mode("append").parquet(
            os.path.join(args.output_dir, "agg_hourly")
        )
        # per-partition lineage/throughput metrics
        # (reference analog: Prometheus per-job gauges,
        # logscraper.py:295-304)
        metrics = written.groupBy("src_partition", "sink").agg(
            F.count(F.lit(1)).alias("rows"),
            F.countDistinct("conv_id").alias("convs"),
        )
        metrics.withColumn("batch_id", F.lit(batch_id)).write.mode(
            "append"
        ).parquet(os.path.join(args.output_dir, "metrics"))
        write_checkpoint(written, ckpt_dir)
        counts = {
            r["sink"]: r["cnt"] for r in sink_counts(written).collect()
        }

    phases["post_write_sec"] = round(time.time() - t_w, 2)
    wall = time.time() - t0
    summary = {
        "rows": n_rows,
        "skipped_already_processed": already,
        "sinks": counts,
        "wall_sec": round(wall, 2),
        "rows_per_sec": round(n_rows / wall, 1) if wall > 0 else None,
        "impl": args.impl,
        **phases,
    }
    print(json.dumps(summary))
    if args.summary_json:
        with open(args.summary_json, "w") as f:
            json.dump(summary, f)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
