"""Dedup test corpus: documents + deterministically planted
duplicates (the synthetic documents table has no natural dupes).

Must stay in lock-step with oracle_data.CORPUS_SQL.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def load_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    base = docs.select("doc_id", "text")
    exact = (
        docs.filter(F.col("doc_id") % 10 == 0)
        .select((F.col("doc_id") + 1000000).alias("doc_id"), "text")
    )
    near = (
        docs.filter(F.col("doc_id") % 7 == 0)
        .select(
            (F.col("doc_id") + 2000000).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" near duplicate suffix")).alias(
                "text"
            ),
        )
    )
    # The local test parquet is a single row group, so the scan
    # yields ~3 partitions (one per union branch) and downstream
    # shingling would use 3 of 32 cores. A production Iceberg scan
    # has thousands of splits; emulate that here so local benches
    # exercise the operators at full parallelism. Tiny data — the
    # shuffle is negligible and does not exist at scale.
    return (
        base.unionAll(exact)
        .unionAll(near)
        .repartition(spark.sparkContext.defaultParallelism, "doc_id")
    )
