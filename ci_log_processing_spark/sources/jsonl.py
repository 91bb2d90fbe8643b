"""JSONL document ingest with malformed-record quarantine.

Training corpora arrive as JSON-lines shards, and real shards carry
truncated/garbled lines. The reference skips whole broken FILES
(logsender.py:527-529, the hardcoded testrepository.subunit.gz
skip); at corpus scale the right granularity is the RECORD: parse
each line, route good rows onward and quarantine bad ones WITH
their raw bytes so nothing is silently dropped — the same
keep-everything philosophy as the pipeline's drop_queue sink.

Implementation detail that matters: this reads the shard as TEXT and
parses with `from_json(columnNameOfCorruptRecord=...)` rather than
using the JSON datasource's PERMISSIVE mode. The datasource's
corrupt column carries a restriction (Spark raises
UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN whenever
column pruning reduces a query to only corrupt-derived columns —
so even `quarantined.count()` throws unless the caller caches
first). Parsing from a real text column has no such restriction,
keeps the raw line for free, and the parse still runs JVM-side
(JacksonParser inside codegen) in one scan with zero shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CORRUPT_COL = "_corrupt_record"


def read_documents_jsonl(
    spark: SparkSession, path: str, schema: str
) -> DataFrame:
    """Read a JSONL shard; returns the schema's columns plus
    `is_corrupt` and `raw_line` (raw bytes kept only for quarantined
    records; parsed fields are NULL there)."""
    parsed = F.from_json(
        F.col("value"),
        f"{schema}, {CORRUPT_COL} string",
        {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": CORRUPT_COL},
    )
    # from_json returns a NULL struct (not a populated corrupt
    # column) for blank/whitespace-only input — without the isNull
    # arm a blank line would sail through as a phantom all-NULL
    # "good" document
    is_corrupt = F.col("r").isNull() | F.col(f"r.{CORRUPT_COL}").isNotNull()
    return (
        spark.read.text(path)
        .select(parsed.alias("r"), F.col("value"))
        .select(
            "r.*",
            is_corrupt.alias("is_corrupt"),
            F.when(is_corrupt, F.col("value")).alias("raw_line"),
        )
        .drop(CORRUPT_COL)
    )


def split_quarantine(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(good rows without the quarantine columns, quarantined rows)."""
    good = df.filter(~F.col("is_corrupt")).drop("is_corrupt", "raw_line")
    bad = df.filter(F.col("is_corrupt"))
    return good, bad


def read_documents_csv(
    spark: SparkSession, path: str, schema: str
) -> DataFrame:
    """CSV shard ingest with the same record-level quarantine
    contract as read_documents_jsonl: parse each line JVM-side with
    from_csv under PERMISSIVE + columnNameOfCorruptRecord, route
    good rows onward with typed columns, keep the raw line for
    quarantined ones. Reading as TEXT + from_csv (rather than the
    CSV datasource) sidesteps the same QUERY_ONLY_CORRUPT_RECORD
    restriction and keeps everything one zero-shuffle scan.

    CSV corruption semantics differ from JSON's and are the point
    of the separate reader: a row is quarantined when a typed field
    fails its cast or the token count differs from the schema in
    EITHER direction (from_csv flags short rows too — verified
    empirically; the parsed prefix fields are still populated on
    the quarantined row, so triage keeps them alongside raw_line).
    A BLANK line parses to an all-NULL struct with a NULL corrupt
    column — the phantom-row trap — so blank/whitespace lines are
    quarantined explicitly. Callers whose text fields may contain
    the delimiter must have written the shard with proper quoting;
    from_csv's default quote handling round-trips it.
    """
    parsed = F.from_csv(
        F.col("value"),
        f"{schema}, {CORRUPT_COL} string",
        {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": CORRUPT_COL},
    )
    is_corrupt = (
        F.col("r").isNull()
        | F.col(f"r.{CORRUPT_COL}").isNotNull()
        | (F.trim(F.col("value")) == "")
    )
    return (
        spark.read.text(path)
        .select(parsed.alias("r"), F.col("value"))
        .select(
            "r.*",
            is_corrupt.alias("is_corrupt"),
            F.when(is_corrupt, F.col("value")).alias("raw_line"),
        )
        .drop(CORRUPT_COL)
    )
