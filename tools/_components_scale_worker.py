#!/usr/bin/env python
"""Worker for tools/run_components_scale.py — one fresh JVM per
core-count measurement of duplicate_components at multi-million-node
size.

The graph is synthesized deterministically and ENTIRELY JVM-side
(spark.range + integer arithmetic, no Python in the generation
path), shaped like real dedup output plus an adversarial tail:

  * stars: every node with id % 64 in 1..7 hangs off the hub
    id - id % 64  ->  7/64 * n edges, diameter 2 (the LSH-bucket
    shape that dominates real duplicate graphs)
  * one chain threading 10 hubs 800k ids apart -> forces ~10
    propagation rounds, so the per-round cost is measured across
    enough rounds to see whether rounds are latency-floor-bound
    (600k-node regime) or data-bound (this regime)

Usage (via spark-submit):
  _components_scale_worker.py <n_nodes> <summary_json>
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

from ci_log_processing_spark.operators.dedup import (  # noqa: E402
    duplicate_components,
)

CHAIN_STRIDE = 800_000
CHAIN_HOPS = 10


def main() -> None:
    n_nodes = int(sys.argv[1])
    out_path = sys.argv[2]
    spark = SparkSession.builder.getOrCreate()

    nodes = spark.range(n_nodes).select(F.col("id").alias("doc_id"))
    stars = (
        spark.range(n_nodes)
        .filter((F.col("id") % 64 >= 1) & (F.col("id") % 64 <= 7))
        .select(
            (F.col("id") - F.col("id") % 64).alias("doc_a"),
            F.col("id").alias("doc_b"),
        )
    )
    hops = min(CHAIN_HOPS, max(n_nodes // CHAIN_STRIDE - 1, 0))
    chain = spark.range(hops).select(
        (F.col("id") * CHAIN_STRIDE).alias("doc_a"),
        ((F.col("id") + 1) * CHAIN_STRIDE).alias("doc_b"),
    )
    pairs = stars.unionAll(chain)
    n_edges = pairs.count()  # materialize inputs before timing

    stats: list = []
    t0 = time.time()
    res = duplicate_components(pairs, nodes, max_iter=40, round_stats=stats)
    n_keepers = res.filter("is_keeper").count()
    wall = time.time() - t0

    with open(out_path, "w") as f:
        json.dump(
            {
                "n_nodes": n_nodes,
                "n_edges": n_edges,
                "n_keepers": n_keepers,
                "wall_sec": round(wall, 2),
                "rounds": stats,
                "nodes_per_sec": int(n_nodes * len(stats) / wall),
            },
            f,
        )


if __name__ == "__main__":
    main()
