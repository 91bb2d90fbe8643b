"""Seeded fuzz parity: on randomized log lines, the three parse
implementations — pure-Python reference cascade, Catalyst
expressions, Arrow pandas UDF — must agree exactly (timestamp AND
message/severity/subsystem/program/pid). This is the cross-impl
guard the reference has no analog of (its one implementation IS the
spec); here three implementations exist and must never drift."""

import datetime as dt
import random

from ci_log_processing_spark.functions.message import get_message_py
from ci_log_processing_spark.functions.timestamps import parse_timestamp_py
from ci_log_processing_spark.plans.pipeline import parse_transcripts

SEED = 20260817
N_LINES = 600

MONTHS = ["Jan", "Feb", "Mar", "Apr", "Sep", "Dec"]
DAYS = ["Monday", "Tuesday", "Friday", "Sunday"]
MONTH_FULL = ["January", "March", "September", "December"]
PAYLOADS = [
    "",
    " ",
    " | ERROR [nova.compute.manager] boom",
    " | plain message",
    " host-3 kernel: event",
    " myhost sudo[77]: ran thing",
    # pids around/over 2^53 and 2^63: float64 would corrupt the
    # first and blow up on the second — exact paths must agree
    " h prog[9007199254740993]: big pid",
    " h prog[9223372036854775808]: over int64",
    " | TOOL bash invoke",
    "garbage trailing | with | pipes",
    " | DEBUG detail",
    "    raise ValueError('x')",
    "-- Logs begin at Mon 2024-01-01 00:00:00 UTC. --",
]


def _rand_lines(rng: random.Random) -> list[str]:
    lines = []
    for _ in range(N_LINES):
        kind = rng.randrange(9)
        frac = rng.choice(["", f".{rng.randrange(10**6):06d}"[:rng.randrange(2, 8)]])
        y, mo, d = rng.randrange(2020, 2026), rng.randrange(1, 13), rng.randrange(1, 29)
        h, mi, s = rng.randrange(24), rng.randrange(60), rng.randrange(60)
        if kind == 0:
            head = f"{y:04d}-{mo:02d}-{d:02d}T{h:02d}:{mi:02d}:{s:02d}{frac}Z"
        elif kind == 1:
            head = f"{y:04d}-{mo:02d}-{d:02d} {h:02d}:{mi:02d}:{s:02d}{frac}"
        elif kind == 2:
            head = (
                f"{rng.choice(MONTHS)} {d:02d} {h:02d}:{mi:02d}:{s:02d}"
                f".{rng.randrange(10**6):06d}"
            )
        elif kind == 3:
            head = f"{rng.choice(MONTHS)} {d:02d} {h:02d}:{mi:02d}:{s:02d}"
        elif kind == 4:
            head = f"{y:04d}-{mo:02d}-{d:02d}T{h:02d}:{mi:02d}:{s:02d}"
        elif kind == 5:
            head = (
                f"{rng.choice(DAYS)} {d:02d} {rng.choice(MONTH_FULL)} "
                f"{y:04d}  {h:02d}:{mi:02d}:{s:02d}"
            )
        elif kind == 6:
            head = ""  # bare payload, no timestamp
        elif kind == 7:
            head = f"{y:04d}-{mo:02d}-{d:02d}"  # too short to parse
        else:
            head = f"{rng.randrange(10**10)}"  # numeric noise
        lines.append(head + rng.choice(PAYLOADS))
    return lines


def test_three_impl_parity(spark):
    rng = random.Random(SEED)
    lines = _rand_lines(rng)
    df = spark.createDataFrame(
        [("c", i, "assistant", ln, None, dt.datetime(2024, 1, 1))
         for i, ln in enumerate(lines)],
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp",
    )
    native = {r["turn_idx"]: r for r in parse_transcripts(df).collect()}
    pandas_ = {
        r["turn_idx"]: r
        for r in parse_transcripts(df, impl="pandas").collect()
    }
    mismatches = []
    for i, ln in enumerate(lines):
        py_ts = parse_timestamp_py(ln)
        py_msg = get_message_py(ln)
        for name, got in (("native", native[i]), ("pandas", pandas_[i])):
            if got["event_ts"] != py_ts or got["message"] != py_msg:
                mismatches.append((name, i, ln, got["event_ts"], py_ts))
        for col in ("severity", "subsystem", "message", "program", "pid"):
            if native[i][col] != pandas_[i][col]:
                mismatches.append(("cross", i, ln, col))
    assert not mismatches, mismatches[:5]
