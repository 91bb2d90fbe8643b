"""Streaming distinct-conversation counting via mergeable
HyperLogLog partials — the sketch pattern that replaces
COUNT(DISTINCT) when the stream never ends and the key set never
fits in state.

Per micro-batch: run the batch pipeline (foreachBatch, same
rationale as follow.py — the ffill window is conversation-ordered
and a conversation's turns arrive together), reduce the batch to
its (sink, j, mj) register PARTIALS, and write them to a
batch-addressed subdirectory (`registers/b{batch_id}`, mode
overwrite). The estimate is computed from the union of all partial
files.

Crash/replay safety comes from the algebra, not bookkeeping:
register max() is associative, commutative and IDEMPOTENT, so a
replayed batch overwriting (or even double-writing) its partials
cannot change the merged registers — unlike a count, a re-added
partial is absorbed, never double-counted. This is the property
that makes HLL the production answer for streaming cardinality
(merge across micro-batches, days, or datacenters with no
coordination), and the gate proves it: the streamed estimate is
hash-equal to the single-pass batch sketch over the same rows.

State: ZERO rows in the streaming state store — the sketch lives in
the sink as <= 64 rows per (sink, batch). At 10^12 turns the
per-batch partial is still <= sinks x 64 rows.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.aggregate import hll_estimate, hll_partial_registers
from ..plans.pipeline import DEFAULT_BATCH_TS, DEFAULT_REF_YEAR, full_pipeline
from .follow import TRANSCRIPT_SCHEMA


def run_streaming_hll(
    spark: SparkSession,
    transcripts_dir: str,
    output_dir: str,
    batch_ts: str = DEFAULT_BATCH_TS,
    ref_year: int = DEFAULT_REF_YEAR,
    max_files_per_trigger: int = 2,
    meta=None,
) -> DataFrame:
    """Drain `transcripts_dir` (availableNow), accumulating per-batch
    HLL register partials, and return the merged per-sink estimate
    (sink, hll_distinct) read back from the register sink."""
    regs_dir = os.path.join(output_dir, "registers")

    def process_batch(batch_df, batch_id: int):
        if batch_df.isEmpty():
            return
        routed = full_pipeline(
            batch_df, spark, batch_ts=batch_ts, ref_year=ref_year, meta=meta
        )
        # overwrite the batch's own subdir: a replayed batch lands in
        # the same place, and max-merge absorbs it either way
        hll_partial_registers(routed).write.mode("overwrite").parquet(
            os.path.join(regs_dir, f"b{batch_id}")
        )

    stream = (
        spark.readStream.schema(TRANSCRIPT_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(transcripts_dir)
    )
    q = (
        stream.writeStream.foreachBatch(process_batch)
        .option(
            "checkpointLocation", os.path.join(output_dir, "_stream_ckpt")
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    parts = [
        os.path.join(regs_dir, d)
        for d in sorted(os.listdir(regs_dir))
        if d.startswith("b")
    ]
    partials = spark.read.parquet(*parts)
    return hll_estimate(partials).select(
        "sink", F.col("hll_distinct").cast("double").alias("hll_distinct")
    )
