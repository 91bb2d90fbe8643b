"""Streaming ingest -> curate -> append: the composed micro-batch
pipeline a training corpus actually runs at the lakehouse edge —
every arriving batch is quality-gated, deduplicated against the
PERSISTED content-hash index (not just in-stream state), and
appended to the curated corpus together with its new hashes.

Why foreachBatch and not dropDuplicatesWithinWatermark
(streaming/dedup_stream.py): the watermark variant bounds state by
evicting old keys, so a duplicate arriving after the horizon is
re-admitted. A TRAINING corpus cannot re-admit — seen-once is
forever — so the dedup key set must live on disk, not in the state
store. foreachBatch gives each micro-batch a plain DataFrame to run
the batch-tier operators on (quality_scores + incremental_dedup),
with the streaming engine still providing source tracking, trigger
scheduling, and checkpointed progress.

Failure semantics, stated exactly: foreachBatch is at-least-once —
a batch may replay after a crash mid-write. Two independent appends
(corpus, then index) would break under replay in BOTH orders: crash
between them re-admits the batch's docs (duplicate corpus rows) or
loses them (hashes committed, docs absent). So each batch writes to
BATCH-SCOPED directories in OVERWRITE mode (`b<batch_id>/` under
corpus and index): the file source replays a failed batch with the
identical file set (its offsets are checkpointed before _process
runs), the anti-join reads the index WITH the batch's own
b<batch_id>/ subdirectory excluded (a failed attempt may have left
its hashes there; including them would empty the survivor set and
the overwrite would destroy the docs) — so the replay sees exactly
the pre-batch index, re-derives the identical survivor set, and the
overwrite replaces any partial output instead of appending beside
it. Batch-level idempotence from plain parquet,
no transactional table needed (Iceberg/Delta would collapse this to
a snapshot commit).

Scale shape per batch: quality gate is per-row (zero shuffle);
incremental_dedup is one intra-batch window + one anti-join whose
build side is the index scan — ONE column (the 32-hex h) read off
disk, broadcast while small, hash-joined on h at scale. Nothing
corpus-sized is held in executor state between batches.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

DOC_STREAM_SCHEMA = "doc_id long, text string, event_ts timestamp"

_INDEX_SCHEMA = StructType([StructField("h", StringType())])


def _known_hashes(
    spark: SparkSession, index_dir: str, batch_id: int
) -> DataFrame:
    """The persisted content-hash index; empty on first batch. The
    directory listing goes through the Hadoop FS API so it works on
    object stores, not just local paths (and avoids the noisy
    AnalysisException a read-then-catch would log).

    CRITICAL for replay correctness: the current batch's own
    `b<batch_id>/` subdirectory is EXCLUDED. A crash after this
    batch's index write but before the streaming commit leaves its
    hashes on disk; on replay, reading them back would make the
    anti-join treat the batch's own docs as already-known, empty the
    survivor set, and let the corpus overwrite delete the
    previously-written rows — permanent loss (hashes present, docs
    absent). Excluding b<batch_id> makes the replay see exactly the
    pre-batch index, re-derive the identical survivor set, and
    overwrite the partial output with it."""
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    path = jvm.org.apache.hadoop.fs.Path(index_dir)
    fs = path.getFileSystem(conf)
    if not fs.exists(path):
        return spark.createDataFrame([], _INDEX_SCHEMA)
    own = f"b{batch_id}"
    prior = [
        st.getPath().toString()
        for st in fs.listStatus(path)
        if st.isDirectory() and st.getPath().getName() != own
    ]
    if not prior:
        return spark.createDataFrame([], _INDEX_SCHEMA)
    return (
        spark.read.schema(_INDEX_SCHEMA)
        .option("recursiveFileLookup", "true")
        .parquet(*prior)
    )


def run_ingest_curation(
    spark: SparkSession,
    docs_dir: str,
    out_dir: str,
    min_quality: float = 0.30,
    max_files_per_trigger: int = 1,
) -> DataFrame:
    """Drain `docs_dir` with an availableNow trigger; per batch:
    quality-gate, dedup against <out>/index, append survivors to
    <out>/corpus and their hashes to <out>/index. Returns the
    curated corpus read back."""
    from ..operators.dedup import incremental_dedup
    from ..operators.textstats import quality_scores

    corpus_dir = os.path.join(out_dir, "corpus")
    index_dir = os.path.join(out_dir, "index")

    def _process(batch: DataFrame, batch_id: int) -> None:
        scored = quality_scores(
            batch, keep_cols=("text", "event_ts")
        ).filter(F.col("quality") >= min_quality)
        fresh = incremental_dedup(
            scored.select("doc_id", "text", "event_ts", "quality"),
            _known_hashes(batch.sparkSession, index_dir, batch_id),
        )
        # persist ONCE so corpus and index writes share the compute;
        # released before the batch returns. Batch-scoped OVERWRITE
        # dirs make a replayed batch replace its own partial output
        # (see module docstring) instead of appending duplicates.
        fresh.persist()
        try:
            fresh.write.mode("overwrite").parquet(
                os.path.join(corpus_dir, f"b{batch_id}")
            )
            fresh.select("h").write.mode("overwrite").parquet(
                os.path.join(index_dir, f"b{batch_id}")
            )
        finally:
            fresh.unpersist()

    stream = (
        spark.readStream.schema(DOC_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(docs_dir)
    )
    q = (
        stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", os.path.join(out_dir, "chk"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return (
        spark.read.option("recursiveFileLookup", "true")
        .parquet(corpus_dir)
    )
