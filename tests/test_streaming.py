"""Follow mode (Structured Streaming) produces the same sink
contents as the batch pipeline — the reference's --follow loop is a
micro-batched run of the same logic (logsender.py:683-687)."""

import os

from pyspark.sql import functions as F

from ci_log_processing_spark.plans.pipeline import full_pipeline
from ci_log_processing_spark.sources.transcripts import load_transcripts
from ci_log_processing_spark.streaming.follow import run_follow

SF = "/root/testdata/sf0.001"


def test_follow_matches_batch(spark, tmp_path):
    t = load_transcripts(spark, SF)
    in_dir = str(tmp_path / "transcripts")
    out_dir = str(tmp_path / "out")
    # conversations must not straddle files (a conv is the unit of
    # readiness, like the reference's build dirs) — partition by
    # conv_id before writing
    t.repartition(4, "conv_id").write.parquet(in_dir)

    run_follow(spark, in_dir, out_dir)

    batch_counts = {
        r["sink"]: r["cnt"]
        for r in full_pipeline(t, spark)
        .groupBy("sink")
        .agg(F.count("*").alias("cnt"))
        .collect()
    }
    for sink, expected in batch_counts.items():
        path = os.path.join(out_dir, "sinks", sink)
        got = spark.read.parquet(path).count()
        assert got == expected, (sink, got, expected)

    # restart with the same checkpoint: no new files -> no new rows
    run_follow(spark, in_dir, out_dir)
    for sink, expected in batch_counts.items():
        got = spark.read.parquet(os.path.join(out_dir, "sinks", sink)).count()
        assert got == expected, ("after-restart", sink, got, expected)
