"""Bucketed-table join study: pay the shuffle once at write time,
join with zero exchanges forever after (sinks.py BucketedTableSink).

Writes two N-row tables (a fact-ish payload table and a value table
sharing key k) twice — plain parquet and co-bucketed (64 buckets on
k) — then measures the same join+aggregate over both layouts.

Usage: python tools/run_bucket_study.py [N_rows]
Prints one JSON line; run on an idle machine (check uptime).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from ci_log_processing_spark.session import get_spark
from ci_log_processing_spark.sinks import BucketedTableSink

BASE = "/tmp/bucket_study"
N_BUCKETS = 64


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 5_000_000
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    shutil.rmtree(BASE, ignore_errors=True)
    spark = get_spark(app_name="bucket-study", master=f"local[{cpus}]")
    spark.sql(f"DROP DATABASE IF EXISTS bkt CASCADE")
    spark.sql(f"CREATE DATABASE bkt LOCATION '{BASE}/wh'")

    payload = spark.range(n).select(
        F.col("id").alias("k"),
        (F.col("id") % 1000).alias("a"),
        F.md5(F.col("id").cast("string").cast("binary")).alias("payload"),
    )
    vals = spark.range(n).select(
        F.col("id").alias("k"), (F.col("id") * 7 % 997).alias("b")
    )

    out = {"metric": "join wall sec, plain parquet vs co-bucketed table",
           "n_rows": n, "cpus": int(cpus), "n_buckets": N_BUCKETS}

    t0 = time.time()
    payload.write.mode("overwrite").parquet(f"{BASE}/payload_p")
    vals.write.mode("overwrite").parquet(f"{BASE}/vals_p")
    out["write_plain_sec"] = round(time.time() - t0, 2)

    t0 = time.time()
    for name, df in (("payload_b", payload), ("vals_b", vals)):
        s = BucketedTableSink(f"bkt.{name}", "k", N_BUCKETS)
        s.ensure(spark)
        s.append(df)
    out["write_bucketed_sec"] = round(time.time() - t0, 2)

    # the regime bucketing targets is large x large where NEITHER side
    # broadcasts — forbid broadcast so the plain path pays its real
    # two-sided shuffle (the value table dict-compresses under the
    # broadcast threshold at this synthetic scale, which a 100 TB
    # fact table never would)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")

    def bench(label, left, right):
        times = []
        # a FRESH DataFrame per iteration — re-collecting one plan
        # instance reuses its shuffle map outputs and times ~nothing
        for _ in range(3):
            joined = left.join(right, "k").agg(
                F.sum(F.col("a") * F.col("b")).alias("s")
            )
            t0 = time.time()
            r = joined.collect()[0]["s"]
            times.append(time.time() - t0)
        # executed (final AQE) plan of the df actually timed
        plan = joined._jdf.queryExecution().executedPlan().toString()
        out[f"join_{label}_sec"] = round(min(times), 3)
        out[f"join_{label}_exchanges"] = plan.count(
            "Exchange hashpartitioning"
        )
        out[f"join_{label}_checksum"] = int(r)

    bench(
        "plain",
        spark.read.parquet(f"{BASE}/payload_p"),
        spark.read.parquet(f"{BASE}/vals_p"),
    )
    bench("bucketed", spark.table("bkt.payload_b"), spark.table("bkt.vals_b"))

    if out["join_plain_checksum"] != out["join_bucketed_checksum"]:
        raise SystemExit(
            "bucket study: layouts computed DIFFERENT answers — "
            f"{out['join_plain_checksum']} vs {out['join_bucketed_checksum']}"
        )
    out["speedup"] = round(out["join_plain_sec"] / out["join_bucketed_sec"], 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
