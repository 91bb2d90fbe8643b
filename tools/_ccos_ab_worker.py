#!/usr/bin/env python
"""A/B worker for the count_cosine term-key study (round 5).

count_cosine_pairs at ngram>1 keys the tf table by md5-STRING
(32 chars) — at 1M synthetic docs that is a ~90M-row shuffle,
persist and self-join whose payload is dominated by the key itself,
and the measured 8→32 scaling was 1.05× (0.42× of the same-day membw
ceiling). Variant B swaps the term key for the 60-bit integer prefix
of the same md5 (`conv(substr(md5,1,15),16,10)` — the h32 pattern
the LSH tier already uses cross-engine, one more hex digit shy of
sign trouble): 8-byte longs through the aggregate, the df band and
the pair join instead of 40-byte strings.

Semantics: identical unless two distinct n-grams collide in 60 bits
(birthday ~3e-3 for ONE collision anywhere at 9e7 distinct terms);
a collision merges the two grams in BOTH engines identically, the
LSH-tier precedent. The checksum below verifies A == B on this
corpus.

Usage: _ccos_ab_worker.py <n_docs> <summary_json>
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from _corpus_scale_worker import build_corpus  # noqa: E402


def _pairs(docs, key_mode: str, threshold_milli=800, df_cut=128, ngram=4):
    from ci_log_processing_spark.operators.dedup import (
        release_persisted,
        tokens_col,
    )

    toks = F.col("_lt")
    n = F.size(toks)
    gram_text = F.concat_ws(
        " ", *[F.element_at(toks, F.col("_i") + j) for j in range(ngram)]
    )
    # stage positions then derive the key so both variants share the
    # exact gram text expression
    if key_mode == "md5":
        key = F.md5(gram_text.cast("binary"))
    else:  # h60
        key = F.conv(
            F.substring(F.md5(gram_text.cast("binary")), 1, 15), 16, 10
        ).cast("long")
    terms = (
        docs.select(
            F.col("doc_id"), tokens_col(F.col("text")).alias("_lt")
        )
        .select(
            "doc_id",
            "_lt",
            F.explode(
                F.when(
                    n >= ngram, F.sequence(F.lit(1), n - (ngram - 1))
                ).otherwise(F.array().cast("array<int>"))
            ).alias("_i"),
        )
        .select("doc_id", key.alias("term"))
    )
    tf = terms.groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).alias("tf")
    )
    tf.persist()
    norms = tf.groupBy("doc_id").agg(
        F.sum(F.col("tf") * F.col("tf")).alias("n2")
    )
    rare = (
        tf.groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") <= df_cut)
        .select("term")
    )
    idx = tf.join(rare, "term", "left_semi")
    a, b = idx.alias("a"), idx.alias("b")
    pairs = (
        a.join(b, "term")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .agg(F.sum(F.col("a.tf") * F.col("b.tf")).alias("dot"))
    )
    na = norms.select(
        F.col("doc_id").alias("doc_a"), F.col("n2").alias("norm_a2")
    )
    nb = norms.select(
        F.col("doc_id").alias("doc_b"), F.col("n2").alias("norm_b2")
    )
    dec = "decimal(38,0)"
    out = (
        pairs.join(na, "doc_a")
        .join(nb, "doc_b")
        .filter(
            F.lit(1_000_000).cast(dec)
            * F.col("dot").cast(dec)
            * F.col("dot").cast(dec)
            >= F.lit(threshold_milli * threshold_milli).cast(dec)
            * F.col("norm_a2").cast(dec)
            * F.col("norm_b2").cast(dec)
        )
    )
    row = out.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.xxhash64("doc_a", "doc_b", "dot").cast(dec)).alias("s"),
    ).collect()[0]
    tf.unpersist()
    release_persisted()
    return [int(row["n"]), int(row["s"] or 0)]


def main():
    n_docs = int(sys.argv[1])
    summary = sys.argv[2]
    spark = SparkSession.builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import tempfile

    work = tempfile.mkdtemp(
        prefix="ccos_", dir="/dev/shm" if os.path.isdir("/dev/shm") else None
    )
    docs = spark.read.parquet(build_corpus(spark, n_docs, work))
    docs.count()

    res, checks = {}, {}
    for rep in range(2):
        for mode in ("md5", "h60"):
            t0 = time.time()
            checks[mode] = _pairs(docs, mode)
            res.setdefault(mode, []).append(round(time.time() - t0, 2))
    with open(summary, "w") as f:
        json.dump(
            {
                "n_docs": n_docs,
                "best_of_2_sec": {m: min(v) for m, v in res.items()},
                "all_runs_sec": res,
                "checksums": checks,
                "identical": checks["md5"] == checks["h60"],
            },
            f,
        )
    import shutil

    shutil.rmtree(work, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
