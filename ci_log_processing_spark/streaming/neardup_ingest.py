"""Streaming NEAR-duplicate ingest: every arriving micro-batch is
deduplicated against the PERSISTED LSH band index before being
appended to the corpus — the near-dup analog of
streaming/ingest_curate.py's exact content-hash gate (one-word edits
and boilerplate-suffixed recrawls slip an exact hash; this catches
them at per-batch cost).

Per-batch plan, stated exactly:
  1. exact intra-batch keep-first (md5 window — one batch-sized
     exchange),
  2. shingle+sign the batch ONCE (the persisted arr feeds banding
     and verification),
  3. join the batch's (band, key) rows against the stored band index
     — candidates only where a bucket collides; per-bucket candidate
     cap bounds mega-bucket fan-out (operators/dedup.py
     neardup_ids_against_index),
  4. fetch ONLY candidate index docs' shingle rows for exact Jaccard
     verification,
  5. append survivors to <out>/corpus and their two index artifacts
     to <out>/bands (doc_id, band, key) and <out>/shingles
     (doc_id, shingles) — the tables step 3/4 read next batch.

Nothing corpus-sized is recomputed per batch: the index is READ, not
re-derived — band join cost is one co-partitioned equi-join, verify
cost is candidate-sized.

Replay semantics mirror ingest_curate.py exactly: all three writes
are batch-scoped OVERWRITE dirs (b<batch_id>/), and the index reads
EXCLUDE the replaying batch's own subdirectories, so a batch killed
after any subset of its three writes re-derives the identical
survivor set against the pre-batch index and replaces its partial
output.

Intra-batch NEAR-dups (two distinct-text near-dups arriving in one
micro-batch) both survive by design — the index only holds PRIOR
batches. This is the standard batch-granularity trade: tighten it by
lowering maxFilesPerTrigger, or run the batch-tier pair generator
(minhash_lsh_pairs + components) as a periodic compaction pass.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

DOC_STREAM_SCHEMA = "doc_id long, text string"

_BANDS_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("band", IntegerType()),
        StructField("key", StringType()),
    ]
)
_SH_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("shingles", ArrayType(StringType())),
    ]
)


def _prior_batches(
    spark: SparkSession, root: str, batch_id: int, schema: StructType
) -> DataFrame:
    """Read every b<id>/ subdirectory EXCEPT the replaying batch's
    own (same replay-correctness rule as ingest_curate._known_hashes:
    a crashed attempt's leftover index rows must not make the replay
    treat its own docs as already-known)."""
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    path = jvm.org.apache.hadoop.fs.Path(root)
    fs = path.getFileSystem(conf)
    if not fs.exists(path):
        return spark.createDataFrame([], schema)
    own = f"b{batch_id}"
    prior = [
        st.getPath().toString()
        for st in fs.listStatus(path)
        if st.isDirectory() and st.getPath().getName() != own
    ]
    if not prior:
        return spark.createDataFrame([], schema)
    return (
        spark.read.schema(schema)
        .option("recursiveFileLookup", "true")
        .parquet(*prior)
    )


def run_neardup_ingestion(
    spark: SparkSession,
    docs_dir: str,
    out_dir: str,
    threshold: float = 0.6,
    k: int = 5,
    candidate_cap: int = 64,
    max_files_per_trigger: int = 1,
) -> DataFrame:
    """Drain `docs_dir` with an availableNow trigger; per batch:
    exact intra-batch dedup, near-dup anti-join against the persisted
    band index, append survivors + their band/shingle index rows.
    Returns the curated corpus read back."""
    from ..operators.dedup import (
        _lsh_shingles_and_bands,
        exact_dedup_keep_first,
        neardup_ids_against_index,
        release_persisted,
    )

    corpus_dir = os.path.join(out_dir, "corpus")
    bands_dir = os.path.join(out_dir, "bands")
    sh_dir = os.path.join(out_dir, "shingles")

    def _process(batch: DataFrame, batch_id: int) -> None:
        ss = batch.sparkSession
        firsts = exact_dedup_keep_first(
            batch, text_col="text", keep_cols=("text",)
        ).drop("h")
        arr_b, bands_b = _lsh_shingles_and_bands(firsts, k)
        dup_ids = neardup_ids_against_index(
            arr_b,
            bands_b,
            _prior_batches(ss, sh_dir, batch_id, _SH_SCHEMA),
            _prior_batches(ss, bands_dir, batch_id, _BANDS_SCHEMA),
            threshold,
            candidate_cap,
        )
        fresh = firsts.join(dup_ids, "doc_id", "left_anti")
        # one materialization feeds all three batch-scoped writes
        fresh.persist()
        try:
            fresh.write.mode("overwrite").parquet(
                os.path.join(corpus_dir, f"b{batch_id}")
            )
            arr_f, bands_f = _lsh_shingles_and_bands(fresh, k)
            bands_f.write.mode("overwrite").parquet(
                os.path.join(bands_dir, f"b{batch_id}")
            )
            arr_f.write.mode("overwrite").parquet(
                os.path.join(sh_dir, f"b{batch_id}")
            )
        finally:
            fresh.unpersist()
            release_persisted()

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
