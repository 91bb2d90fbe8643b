#!/usr/bin/env python
"""A/B worker for the softdedup_exact window-key study (round 5).

softdedup_weights (exact mode) pays one corpus-sized window exchange
partitioned on md5(text) — a 32-char STRING key, so WindowExec's
required sort compares hex strings. Variants measured here:

  A  current: Window.partitionBy(md5_string)
  B  chunked: md5 split into three fixed-width integer chunks
     (11+11+10 hex digits, each < 2^44 — a bijection of the 128-bit
     hash), window partitioned on the three longs; the output
     cluster_key string rides the shuffle untouched.
  C  hash-prefixed: Window.partitionBy(xxhash64(text), md5_string) —
     sort comparisons short-circuit on the leading long; grouping
     differs from md5-only ONLY if texts collide on md5 while
     differing on xxhash64 (not a reachable state).

Usage: _softdedup_ab_worker.py <n_docs> <summary_json>
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import SparkSession, Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from _corpus_scale_worker import build_corpus  # noqa: E402


def _variant(docs, mode: str):
    n_tok = F.size(F.split(F.col("text"), " ")).cast("long")
    ck = F.md5(F.col("text"))
    if mode == "A":
        keyed = docs.select(
            "doc_id", ck.alias("cluster_key"), n_tok.alias("n_tokens")
        )
        w = Window.partitionBy("cluster_key")
    elif mode == "B":
        keyed = docs.select(
            "doc_id",
            ck.alias("cluster_key"),
            n_tok.alias("n_tokens"),
        ).select(
            "doc_id",
            "cluster_key",
            "n_tokens",
            F.conv(F.substring("cluster_key", 1, 11), 16, 10)
            .cast("long")
            .alias("k1"),
            F.conv(F.substring("cluster_key", 12, 11), 16, 10)
            .cast("long")
            .alias("k2"),
            F.conv(F.substring("cluster_key", 23, 10), 16, 10)
            .cast("long")
            .alias("k3"),
        )
        w = Window.partitionBy("k1", "k2", "k3")
    else:  # C
        keyed = docs.select(
            "doc_id",
            F.xxhash64(F.col("text")).alias("xk"),
            ck.alias("cluster_key"),
            n_tok.alias("n_tokens"),
        )
        w = Window.partitionBy("xk", "cluster_key")
    out = keyed.select(
        "doc_id",
        "cluster_key",
        F.count(F.lit(1)).over(w).alias("cluster_n"),
        "n_tokens",
    ).select(
        "doc_id",
        "cluster_key",
        "cluster_n",
        F.round(F.lit(1.0) / F.col("cluster_n"), 5).alias("weight"),
        "n_tokens",
        F.round(
            F.col("n_tokens") / F.col("cluster_n").cast("double"), 5
        ).alias("weighted_tokens"),
        F.expr("(1000 * n_tokens) div cluster_n").alias(
            "weighted_tokens_milli"
        ),
    )
    # consume fully but cheaply: aggregate everything to one row
    return out.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("cluster_n").alias("s_cn"),
        F.sum("weighted_tokens_milli").alias("s_wtm"),
        F.sum(F.xxhash64("cluster_key").cast("decimal(38,0)")).alias(
            "s_ck"
        ),
    ).collect()[0]


def main():
    n_docs = int(sys.argv[1])
    summary = sys.argv[2]
    spark = SparkSession.builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import tempfile

    work = tempfile.mkdtemp(
        prefix="ab_", dir="/dev/shm" if os.path.isdir("/dev/shm") else None
    )
    path = build_corpus(spark, n_docs, work)
    docs = spark.read.parquet(path)
    docs.count()  # warm page cache

    res = {}
    checks = {}
    for rep in range(2):
        for mode in ("A", "B", "C"):
            t0 = time.time()
            row = _variant(docs, mode)
            dt = time.time() - t0
            res.setdefault(mode, []).append(round(dt, 2))
            checks[mode] = [
                int(row["n"]),
                int(row["s_cn"]),
                int(row["s_wtm"]),
                int(row["s_ck"]),
            ]
    # equivalence: every variant must produce the identical output
    # multiset (checksummed)
    assert checks["A"] == checks["B"] == checks["C"], checks
    with open(summary, "w") as f:
        json.dump(
            {
                "n_docs": n_docs,
                "best_of_2_sec": {m: min(v) for m, v in res.items()},
                "all_runs_sec": res,
                "checksums": checks["A"],
            },
            f,
        )
    import shutil

    shutil.rmtree(work, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
