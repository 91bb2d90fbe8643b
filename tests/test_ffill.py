"""Forward-fill window goldens — reference logline_iter semantics
(logsender.py:394-413; golden tests/test_logsender.py:992-1010)."""

import datetime

from ci_log_processing_spark.operators.ffill import (
    with_filled_ts,
    with_prior_ts_count,
)
from ci_log_processing_spark.plans.pipeline import parse_transcripts

BATCH_TS = "2024-01-01 00:00:00"


def _mk(spark, rows):
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
    )


def test_forward_fill(spark):
    t0 = datetime.datetime(2024, 1, 1)
    rows = [
        ("c1", 0, "assistant", "no ts yet line", None, t0),
        ("c1", 1, "assistant", "2022-02-28 09:39:09.596 | first", None, t0),
        ("c1", 2, "assistant", "    continuation", None, t0),
        ("c1", 3, "assistant", "2022-02-28 09:40:00.000001 | second", None, t0),
        ("c1", 4, "assistant", "    more continuation", None, t0),
    ]
    df = parse_transcripts(_mk(spark, rows))
    out = {
        r["turn_idx"]: r["filled_ts"]
        for r in with_filled_ts(df, BATCH_TS).collect()
    }
    # before any ts: batch_ts fallback (reference: utcnow per line)
    assert out[0] == datetime.datetime(2024, 1, 1)
    first = datetime.datetime(2022, 2, 28, 9, 39, 9, 596000)
    second = datetime.datetime(2022, 2, 28, 9, 40, 0, 1)
    assert out[1] == first
    assert out[2] == first  # inherited
    assert out[3] == second
    assert out[4] == second  # inherited from latest


def test_prior_ts_count_gates_preamble(spark):
    t0 = datetime.datetime(2024, 1, 1)
    rows = [
        ("c1", 0, "system", "-- Logs begin at Mon. --", None, t0),
        ("c1", 1, "assistant", "2022-02-28 09:39:09.596 | x", None, t0),
        ("c1", 2, "system", "-- Logs begin at Mon. --", None, t0),
    ]
    df = with_prior_ts_count(parse_transcripts(_mk(spark, rows)))
    out = {r["turn_idx"]: r["prior_ts_count"] for r in df.collect()}
    assert out[0] == 0  # preamble before any ts -> droppable
    assert out[2] == 1  # later duplicate preamble is kept (has prior ts)
