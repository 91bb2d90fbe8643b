"""Corpus-curation operators a large-scale training-data pipeline
needs beyond dedup/similarity: benchmark decontamination, stratified
downsampling, and length-distribution statistics. All pure DataFrame
compositions; the only shuffles are final aggregates.

No reference analog (the reference is a log shipper); these follow
the standard public recipes (e.g. GPT-3/C4-style n-gram overlap
decontamination) re-expressed Spark-first.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def decontaminate(
    docs: DataFrame,
    benchmark_snippets: list[str],
    text_col: str = "text",
) -> DataFrame:
    """Flag documents containing ANY benchmark snippet as a
    substring (test-set contamination check).

    Scale shape: the snippet list is a LITERAL broadcast into one
    codegen'd boolean expression per snippet — a single corpus scan,
    zero joins, zero shuffles. For snippet sets too large for an
    expression tree, swap in an n-gram inverted-index join (the
    dedup module's shape); at typical benchmark-suite sizes
    (hundreds of snippets) the expression chain wins outright.

    Output: (doc_id, contaminated, matched_snippet) — first matching
    snippet in list order, NULL when clean.
    """
    assert benchmark_snippets, "need at least one snippet"
    hit: Column = F.lit(None).cast("string")
    # build WHEN chain in REVERSE so the first list entry wins
    for s in reversed(benchmark_snippets):
        hit = F.when(F.col(text_col).contains(s), F.lit(s)).otherwise(hit)
    return docs.select(
        "doc_id",
        hit.isNotNull().alias("contaminated"),
        hit.alias("matched_snippet"),
    )


def stratified_downsample(
    docs: DataFrame,
    stratum_col: str,
    keep_one_in: int,
    order_col: str = "doc_id",
) -> DataFrame:
    """Deterministic stratified downsampling: keep every
    `keep_one_in`-th document per stratum, in `order_col` order
    (training-mix rebalancing without RNG, so the oracle — and any
    re-run — reproduces it bit-for-bit; sampleBy's per-partition RNG
    cannot).

    One row_number window per stratum = one hash shuffle on the
    stratum key; AQE splits skewed strata.
    """
    w = Window.partitionBy(stratum_col).orderBy(order_col)
    return (
        docs.withColumn("_rn", F.row_number().over(w))
        .filter((F.col("_rn") - 1) % keep_one_in == 0)
        .drop("_rn")
    )


def token_length_histogram(
    docs: DataFrame,
    text_col: str = "text",
    bucket_size: int = 16,
) -> DataFrame:
    """Whitespace-token length distribution in fixed buckets:
    (bucket_lo, n_docs, total_tokens). Scan + one partial-aggregated
    shuffle on ~(max_len / bucket_size) groups — the canonical
    "what does my corpus look like" statistic."""
    n_tok = F.size(F.split(F.col(text_col), " "))
    lo = (F.floor(n_tok / bucket_size) * bucket_size).cast("long")
    return (
        docs.select(n_tok.alias("n"), lo.alias("bucket_lo"))
        .groupBy("bucket_lo")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n").alias("total_tokens"),
        )
    )
