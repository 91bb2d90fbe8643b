"""Follow mode — the reference's polling micro-batch loop
(`--follow --wait-time`, logscraper.py:770-775 and
logsender.py:683-687: run(); sleep(wait)) as Structured Streaming.

Design: readStream over the transcripts table directory +
foreachBatch running the SAME batch pipeline per micro-batch.
foreachBatch (not a pure streaming DAG) because the forward-fill
window is conversation-ordered — inside a micro-batch the batch
planner handles it, mirroring the reference's treat-each-ready-dir-
as-a-unit semantics (a conversation's turns arrive together, the
way a build dir becomes "ready" all at once, logsender.py:175-198).

Trigger:
  * availableNow=True — drain what exists, then stop (the batch
    re-run analog; used in tests);
  * processingTime=Ns  — the literal --follow loop.

Checkpointing: Spark's own streaming checkpoint (offset tracking)
+ our conv-manifest checkpoint both apply; a re-run neither
re-reads files nor re-emits convs.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from ..operators.aggregate import hourly_agg
from ..operators.route import SINKS
from ..plans.pipeline import DEFAULT_BATCH_TS, DEFAULT_REF_YEAR, full_pipeline

TRANSCRIPT_SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, "
    "tool string, ts timestamp"
)


def run_follow(
    spark: SparkSession,
    transcripts_dir: str,
    output_dir: str,
    batch_ts: str = DEFAULT_BATCH_TS,
    ref_year: int = DEFAULT_REF_YEAR,
    impl: str = "native",
    processing_time: str | None = None,
    meta=None,
):
    """Stream the transcripts directory into the 4 sinks + hourly agg.

    `meta` (conv-metadata DataFrame) enables the no_metadata drop
    rule exactly as in batch mode. Returns the StreamingQuery
    (already awaited when availableNow).
    """

    def process_batch(batch_df, batch_id: int):
        if batch_df.isEmpty():
            return
        routed = full_pipeline(
            batch_df,
            spark,
            batch_ts=batch_ts,
            ref_year=ref_year,
            impl=impl,
            meta=meta,
        ).withColumn("batch_id", F.lit(batch_id))
        routed = routed.persist()
        try:
            for sink in SINKS:
                (
                    routed.filter(F.col("sink") == sink)
                    .withColumn("event_date", F.to_date("filled_ts"))
                    .write.mode("append")
                    .partitionBy("event_date")
                    .parquet(os.path.join(output_dir, "sinks", sink))
                )
            hourly_agg(routed).withColumn(
                "batch_id", F.lit(batch_id)
            ).write.mode("append").parquet(
                os.path.join(output_dir, "agg_hourly")
            )
        finally:
            routed.unpersist()

    stream = (
        spark.readStream.schema(TRANSCRIPT_SCHEMA)
        .option("maxFilesPerTrigger", 8)  # micro-batch size control
        .parquet(transcripts_dir)
    )
    writer = (
        stream.writeStream.foreachBatch(process_batch)
        .option(
            "checkpointLocation", os.path.join(output_dir, "_stream_ckpt")
        )
    )
    if processing_time:
        q = writer.trigger(processingTime=processing_time).start()
        return q
    q = writer.trigger(availableNow=True).start()
    q.awaitTermination()
    return q
