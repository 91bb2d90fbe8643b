"""Exact value-histogram percentiles vs the HDR sketch at 50M turns.

Isolates the one difference that matters at scale: the exact
operator's aggregate state is DISTINCT (group, gap_ms) pairs —
with high-resolution timestamps that approaches one row per turn —
while the HDR sketch's state is <= 64 << sub_bits buckets per group
regardless of corpus size. Both ops run over the SAME input frame
(the 50M-turn datagen transcripts, gaps over raw ts grouped by
role, so the pipeline cost is out of the measurement), warmed once,
best of two, at local[8] and local[32].

Appends a `latency_sketch_50m` entry to CORPUS_SCALING.json:
per-op walls, speedups, and the state sizes (distinct gap rows vs
bucket rows) that explain them.

Usage: python tools/run_latency_study.py [n_turns]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

WORKER = """
import json, sys, time
sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession
spark = (
    SparkSession.builder.master("local[{cores}]")
    .config("spark.sql.shuffle.partitions", {shuffle})
    .config("spark.sql.ansi.enabled", "true")
    .config("spark.driver.memory", "48g")
    .getOrCreate()
)
from ci_log_processing_spark.operators.aggregate import (
    turn_latency_percentiles, hdr_latency_percentiles,
)
from pyspark.sql import functions as F
df = (
    spark.read.parquet({data!r})
    # datagen writes TIMESTAMP_NTZ; unix_millis needs TIMESTAMP
    .select("conv_id", "turn_idx", "role",
            F.col("ts").cast("timestamp").alias("ts"))
)
out = {{}}
for name, fn in (("exact", turn_latency_percentiles),
                 ("hdr", hdr_latency_percentiles)):
    best = None
    for attempt in range(2):
        t0 = time.time()
        rows = fn(df, ts_col="ts", group_col="role").collect()
        wall = time.time() - t0
        best = wall if best is None or wall < best else best
    out[name] = {{"wall_sec": round(best, 2), "groups": len(rows)}}
print("WORKER_JSON " + json.dumps(out))
spark.stop()
"""


def run(cores: int, data: str) -> dict:
    code = WORKER.format(
        repo=REPO, cores=cores, shuffle=cores * 4, data=data
    )
    proc = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True
    )
    for line in proc.stdout.splitlines():
        if line.startswith("WORKER_JSON "):
            return json.loads(line[len("WORKER_JSON "):])
    raise RuntimeError(proc.stderr[-2000:])


def state_sizes(data: str) -> dict:
    """Distinct (role, gap) pairs vs HDR bucket rows — the aggregate
    state each variant shuffles."""
    import duckdb

    q = f"""
WITH gaps AS (
  SELECT role,
         epoch_ms(lead(ts) OVER (PARTITION BY conv_id ORDER BY turn_idx))
           - epoch_ms(ts) AS g
  FROM read_parquet('{data}/*.parquet')
), nn AS (SELECT role, g FROM gaps WHERE g IS NOT NULL)
SELECT
 (SELECT count(*) FROM (SELECT DISTINCT role, g FROM nn)),
 (SELECT count(*) FROM (
    SELECT DISTINCT role,
      CASE WHEN g <= 0 THEN g
           ELSE (g >> greatest(length(bin(g)) - 5, 0))
                << greatest(length(bin(g)) - 5, 0) END
    FROM nn)),
 (SELECT count(*) FROM nn)
"""
    a, b, n = duckdb.sql(q).fetchone()
    return {
        "distinct_gap_rows": a,
        "hdr_bucket_rows": b,
        "n_gaps": n,
    }


def main():
    n_turns = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000_000
    data = os.path.join(REPO, ".bench_data", f"transcripts_{n_turns}")
    if not os.path.isdir(data):
        from ci_log_processing_spark.datagen import (
            write_transcripts_parallel,
        )

        write_transcripts_parallel(data, n_turns)

    entry = {"n_turns": n_turns, "state": state_sizes(data)}
    for cores in (8, 32):
        entry[f"local{cores}"] = run(cores, data)
        print(f"# local[{cores}]: {entry[f'local{cores}']}", file=sys.stderr)
    for op in ("exact", "hdr"):
        w8 = entry["local8"][op]["wall_sec"]
        w32 = entry["local32"][op]["wall_sec"]
        entry[f"{op}_speedup_8_to_32"] = round(w8 / w32, 3)
        entry[f"{op}_efficiency_N_to_4N"] = round(w8 / w32 / 4, 3)

    cache = os.path.join(REPO, "CORPUS_SCALING.json")
    merged = {}
    if os.path.exists(cache):
        with open(cache) as f:
            merged = json.load(f)
    merged["latency_sketch_50m"] = entry
    with open(cache, "w") as f:
        json.dump(merged, f)
    print(json.dumps(entry))


if __name__ == "__main__":
    main()
