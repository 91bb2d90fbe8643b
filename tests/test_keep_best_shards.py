"""Tests for quality-based duplicate resolution (dedup_keep_best)
and the fixed-shard training export sink (TrainingShardSink)."""

import os

import pytest
from pyspark.sql import functions as F

from ci_log_processing_spark.operators.curation import shuffle_index
from ci_log_processing_spark.operators.dedup import (
    dedup_keep_best,
    release_persisted,
)
from ci_log_processing_spark.sinks import TrainingShardSink


def test_keep_best_prefers_quality_over_min_id(spark):
    # doc 0/1/2 exact dups (same text => same quality; tie-break by
    # id keeps 0); docs 10/11 near-dups where 11 is LONGER (higher
    # len_score => higher quality) so 11 must win despite larger id
    base = "the of a to in is " * 4  # stopword-rich, no punctuation
    rows = [
        (0, base),
        (1, base),
        (2, base),
        (10, base + "alpha beta gamma delta"),
        (11, base + "alpha beta gamma delta " + "the of a to in is " * 6),
        (20, "solitary unique document with no twin at all"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = (
        dedup_keep_best(docs, spark, threshold=0.2)
        .toPandas()
        .set_index("doc_id")
        .sort_index()
    )
    release_persisted()
    assert len(out) == 6
    # exact-dup cluster: equal quality, min id wins
    assert bool(out.loc[0, "is_best"])
    assert not out.loc[1, "is_best"] and not out.loc[2, "is_best"]
    assert out.loc[0, "component"] == out.loc[1, "component"]
    # near-dup cluster: the pair MUST link (identical 24-token prefix
    # at threshold 0.2 — if this stops holding the test must fail,
    # not silently skip the only assertion that distinguishes
    # keep-best from min-id), and higher-quality doc 11 beats
    # lower-id doc 10
    assert out.loc[10, "component"] == out.loc[11, "component"]
    assert bool(out.loc[11, "is_best"])
    assert not out.loc[10, "is_best"]
    assert out.loc[11, "quality"] > out.loc[10, "quality"]
    # singleton is its own best
    assert bool(out.loc[20, "is_best"])
    # exactly one best per component
    per_comp = out.groupby("component")["is_best"].sum()
    assert (per_comp == 1).all()


def test_training_shard_sink_layout(spark, tmp_path):
    docs = spark.createDataFrame(
        [(i, f"text {i}") for i in range(100)], "doc_id long, text string"
    )
    idx = shuffle_index(docs, shard_size=25)
    sink = TrainingShardSink(str(tmp_path / "shards"))
    sink.append(idx)
    release_persisted()
    # hive layout: one directory per shard, ONE data file per shard
    root = tmp_path / "shards"
    shard_dirs = sorted(d for d in os.listdir(root) if d.startswith("shard="))
    assert shard_dirs == ["shard=0", "shard=1", "shard=2", "shard=3"]
    for d in shard_dirs:
        files = [
            f for f in os.listdir(root / d) if f.endswith(".parquet")
        ]
        assert len(files) == 1, (d, files)
    # rows inside each shard file are in global_idx order and dense
    import duckdb

    con = duckdb.connect()
    got = con.execute(
        "SELECT shard, list(global_idx ORDER BY file_row_number) AS idxs "
        "FROM read_parquet(?, hive_partitioning=true, "
        "file_row_number=true) GROUP BY shard ORDER BY shard",
        [str(root / "**" / "*.parquet")],
    ).fetchall()
    assert len(got) == 4
    for shard, idxs in got:
        assert idxs == list(range(shard * 25, shard * 25 + 25))


def test_training_shard_sink_single_exchange(spark):
    docs = spark.createDataFrame(
        [(i, f"text {i}") for i in range(50)], "doc_id long, text string"
    )
    idx = shuffle_index(docs, shard_size=10)
    written = idx.repartition("shard").sortWithinPartitions(
        "shard", "global_idx"
    )
    plan = written._jdf.queryExecution().executedPlan().toString()
    release_persisted()
    # exactly one exchange above the cached rank: the shard
    # repartition (the rank's own _bkt exchange lives in the cache)
    import re

    post_cache = plan.split("InMemoryRelation")[0]
    ids = re.findall(
        r"Exchange hashpartitioning\(shard.*?plan_id=(\d+)", post_cache
    )
    assert len(set(ids)) == 1, plan
