"""JSONL document ingest with malformed-record quarantine.

Training corpora arrive as JSON-lines shards, and real shards carry
truncated/garbled lines. The reference skips whole broken FILES
(logsender.py:527-529, the hardcoded testrepository.subunit.gz
skip); at corpus scale the right granularity is the RECORD: read
PERMISSIVE with a corrupt-record column, route good rows onward and
quarantine bad ones with their raw bytes so nothing is silently
dropped — the same keep-everything philosophy as the pipeline's
drop_queue sink.

Spark-first shape: the JSON parse is the datasource's own reader
(JacksonParser inside the scan, no Python), corrupt routing is a
column filter — the whole split is one scan with zero shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CORRUPT_COL = "_corrupt_record"


def read_documents_jsonl(
    spark: SparkSession, path: str, schema: str
) -> DataFrame:
    """Read a JSONL shard PERMISSIVEly; adds `is_corrupt` plus the
    raw line for quarantined records (fields stay NULL there)."""
    full_schema = f"{schema}, {CORRUPT_COL} string"
    df = (
        spark.read.schema(full_schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )
    return df.select(
        "*",
        F.col(CORRUPT_COL).isNotNull().alias("is_corrupt"),
    ).drop(CORRUPT_COL)


def split_quarantine(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(good rows without the flag, quarantined rows)."""
    good = df.filter(~F.col("is_corrupt")).drop("is_corrupt")
    bad = df.filter(F.col("is_corrupt"))
    return good, bad
