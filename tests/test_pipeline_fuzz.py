"""End-to-end randomized oracle fuzz: the FULL pipeline (parse ->
ffill -> enrich -> route) on arbitrary random transcripts must match
the DuckDB oracle SQL — not just on the fixed derived table the
driver's gate uses. Catches divergences the fixed fixture classes
can't reach (weird roles/tools, adversarial text, ragged convs)."""

import datetime as dt
import math
import random

import duckdb

from ci_log_processing_spark.oracle import pipeline_cte
from ci_log_processing_spark.plans.pipeline import full_pipeline
from tests.test_parse_fuzz import PAYLOADS, _rand_lines

SEED = 424242


def _rand_transcripts(rng: random.Random, n_convs: int = 25):
    lines = iter(_rand_lines(rng) * 3)
    rows = []
    for c in range(n_convs):
        for i in range(rng.randrange(1, 25)):
            role = rng.choice(
                ["user", "assistant", "system", "tool", "weird-role", None]
            )
            tool = rng.choice(
                ["bash", "search", "python", "unknown-tool", None, None]
            )
            text = rng.choice(
                [next(lines), rng.choice(PAYLOADS), "-- Logs begin at x --"]
            )
            ts = dt.datetime(2024, 1, 1) + dt.timedelta(
                seconds=rng.randrange(0, 10**6)
            )
            rows.append((f"fz-{c:03d}", i, role, text, tool, ts))
    return rows


def _norm(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        return "NULL" if math.isnan(v) else f"{v:.6f}"
    return str(v)


def test_full_pipeline_matches_oracle_on_random_input(spark, tmp_path):
    rng = random.Random(SEED)
    rows = _rand_transcripts(rng)
    schema = (
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp"
    )
    p = str(tmp_path / "fuzz_transcripts")
    spark.createDataFrame(rows, schema).write.parquet(p)
    t = spark.read.parquet(p)
    # random subset of convs has metadata
    meta_ids = sorted(
        {r[0] for r in rows if rng.random() < 0.8}
    )
    meta = spark.createDataFrame([(m,) for m in meta_ids], "conv_id string")

    routed = full_pipeline(t, spark, meta=meta).select(
        "conv_id", "turn_idx", "event_ts", "filled_ts", "severity",
        "subsystem", "message", "sink", "drop_reason", "pipeline",
        "category",
    )
    got = sorted(
        tuple(_norm(v) for v in r) for r in routed.collect()
    )

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW fuzz_t AS SELECT * FROM read_parquet('{p}/*.parquet')"
    )
    con.execute(
        "CREATE TABLE fuzz_m (conv_id VARCHAR)"
    )
    con.executemany(
        "INSERT INTO fuzz_m VALUES (?)", [(m,) for m in meta_ids]
    )
    sql = pipeline_cte(
        transcripts_rel="fuzz_t", meta_rel="fuzz_m"
    ) + (
        "SELECT conv_id, turn_idx, event_ts, filled_ts, severity, "
        "subsystem, message, sink, drop_reason, pipeline, category "
        "FROM routed"
    )
    want = sorted(
        tuple(_norm(v) for v in r) for r in con.execute(sql).fetchall()
    )
    assert len(got) == len(want)
    bad = [i for i, (a, b) in enumerate(zip(got, want)) if a != b]
    assert not bad, (got[bad[0]], want[bad[0]])
