"""Streaming inter-turn latency sketch: per-micro-batch HDR bucket
partials plus a persisted per-conversation "last turn" state that
bridges gaps ACROSS micro-batches — the piece a naive per-batch
histogram silently drops when a conversation continues in a later
scraper pass (the reference's follow loop revisits live build dirs
for exactly this reason, logscraper.py follow mode).

Per micro-batch (foreachBatch, like follow.py/hll_stream.py):

  1. run the batch pipeline on the arriving segment;
  2. INTRA-batch gaps: the same conv-keyed lead() window the batch
     operator uses;
  3. BRIDGE gaps: join each conversation's FIRST routed turn of this
     batch against the persisted state's latest "last turn" row for
     that conversation — gap from the previous segment's tail to this
     segment's head, attributed to the previous turn's sink (the gap
     belongs to the turn it starts at, exactly as in the window);
  4. quantize intra + bridge gaps with the shared HDR bucket math
     (operators/aggregate.py hdr_bucket_counts) and write the counts
     to `buckets/b{batch_id}` (mode overwrite);
  5. write each conversation's new last-turn row to
     `state/b{batch_id}` (mode overwrite).

Replay safety is the batch-scoped-write pattern (ingest_curate.py):
a replayed batch overwrites its OWN two subdirectories, and the
state read at step 3 only unions subdirectories with id < batch_id,
so a half-written failed attempt can neither double-count buckets
nor poison the state it reads. Count partials sum-merge, so the
final estimate is one groupBy over the union of bucket files.

Batch-parity contract (asserted by the gate, stream_latency_hdr ==
the batch DuckDB twin): segments must arrive in turn order and each
segment must open with a turn whose timestamp PARSES. Under that
contract the per-batch pipeline's forward-fill and preamble routing
are byte-identical to the global batch run (every fill inside a
segment resolves within the segment), so intra + bridge gaps equal
the single-pass gap set exactly. Segments opening with unparseable
timestamps would fill from the batch default rather than the prior
segment's tail — the same documented arrival contract as follow.py,
one notch looser (conversations may SPAN batches; only the split
point is constrained).

State size: one row per conversation ever seen — the same O(live
convs) bound as session_state.py, kept in cheap parquet instead of
the state store because the final merge wants ALL partials anyway.
At 10^12 turns the state dirs would be compacted periodically
(latest-per-conv is idempotent), the same TTL discipline as
operators/checkpoint.py.
"""

from __future__ import annotations

import os
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..operators.aggregate import (
    hdr_bucket_counts,
    hdr_percentiles_from_buckets,
)
from ..plans.pipeline import DEFAULT_BATCH_TS, DEFAULT_REF_YEAR, full_pipeline
from .follow import TRANSCRIPT_SCHEMA

_STATE_SCHEMA = (
    "conv_id string, turn_idx int, filled_ts timestamp, sink string, "
    "batch long"
)


def _prior_state_dirs(state_dir: str, batch_id: int) -> list[str]:
    """Subdirectories written by batches STRICTLY BEFORE batch_id —
    a replayed batch must not read its own failed attempt."""
    if not os.path.isdir(state_dir):
        return []
    out = []
    for d in os.listdir(state_dir):
        m = re.fullmatch(r"b(\d+)", d)
        if m and int(m.group(1)) < batch_id:
            out.append(os.path.join(state_dir, d))
    return sorted(out)


def run_streaming_hdr(
    spark: SparkSession,
    transcripts_dir: str,
    output_dir: str,
    sub_bits: int = 4,
    batch_ts: str = DEFAULT_BATCH_TS,
    ref_year: int = DEFAULT_REF_YEAR,
    max_files_per_trigger: int = 1,
    meta=None,
) -> DataFrame:
    """Drain `transcripts_dir` (availableNow), accumulating HDR
    bucket partials with cross-batch gap bridging, and return the
    merged per-sink percentile sketch — hash-equal to the single-pass
    batch operator under the arrival contract above."""
    buckets_dir = os.path.join(output_dir, "buckets")
    state_dir = os.path.join(output_dir, "state")

    def process_batch(batch_df, batch_id: int):
        if batch_df.isEmpty():
            return
        routed = full_pipeline(
            batch_df, spark, batch_ts=batch_ts, ref_year=ref_year, meta=meta
        )
        turns = routed.select(
            "conv_id", "turn_idx", "sink", "filled_ts"
        ).persist()
        wc = Window.partitionBy("conv_id").orderBy("turn_idx")
        intra = (
            turns.withColumn("_next_ts", F.lead("filled_ts").over(wc))
            .filter(F.col("_next_ts").isNotNull())
            .select(
                "sink",
                (
                    F.unix_millis("_next_ts")
                    - F.unix_millis("filled_ts")
                ).alias("gap_ms"),
            )
        )
        # first and last routed turn per conv in THIS batch — group
        # rows only (one per conversation)
        edge = turns.groupBy("conv_id").agg(
            F.min_by(
                F.struct("turn_idx", "filled_ts"), F.col("turn_idx")
            ).alias("first"),
            F.max_by(
                F.struct("turn_idx", "filled_ts", "sink"),
                F.col("turn_idx"),
            ).alias("last"),
        ).persist()

        prior = _prior_state_dirs(state_dir, batch_id)
        if prior:
            latest = (
                spark.read.schema(_STATE_SCHEMA)
                .parquet(*prior)
                .groupBy("conv_id")
                .agg(
                    F.max_by(
                        F.struct("turn_idx", "filled_ts", "sink"),
                        F.col("batch"),
                    ).alias("prev")
                )
            )
            bridge = (
                edge.join(latest, "conv_id")
                .select(
                    F.col("prev.sink").alias("sink"),
                    (
                        F.unix_millis("first.filled_ts")
                        - F.unix_millis("prev.filled_ts")
                    ).alias("gap_ms"),
                )
            )
            gaps = intra.unionAll(bridge)
        else:
            gaps = intra
        hdr_bucket_counts(gaps, "sink", "gap_ms", sub_bits).write.mode(
            "overwrite"
        ).parquet(os.path.join(buckets_dir, f"b{batch_id}"))
        edge.select(
            "conv_id",
            F.col("last.turn_idx").alias("turn_idx"),
            F.col("last.filled_ts").alias("filled_ts"),
            F.col("last.sink").alias("sink"),
            F.lit(batch_id).alias("batch"),
        ).write.mode("overwrite").parquet(
            os.path.join(state_dir, f"b{batch_id}")
        )
        turns.unpersist()
        edge.unpersist()

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
        os.path.join(buckets_dir, d)
        for d in sorted(os.listdir(buckets_dir))
        if d.startswith("b")
    ]
    merged = (
        spark.read.parquet(*parts)
        .groupBy("sink", "bucket")
        .agg(F.sum("c").alias("c"))
    )
    return hdr_percentiles_from_buckets(merged)
