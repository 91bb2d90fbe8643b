"""Grok field goldens: severity/subsystem (oslofmt) + syslog
program/pid (openstack-filters.conf:49) + F3 ISO serialization
(logsender.py:419), on both parse impls."""

import datetime as dt

from pyspark.sql import functions as F

from ci_log_processing_spark.functions.timestamps import iso_serialize_col
from ci_log_processing_spark.plans.pipeline import parse_transcripts

TS = dt.datetime(2024, 1, 1)

LINES = [
    # (text, severity, subsystem, program, pid)
    ("2022-02-28 09:39:09.596 | ERROR [nova.compute.manager] boom",
     "ERROR", "nova.compute.manager", None, None),
    ("Apr 05 12:00:00.123456 host-7 kernel: something happened",
     None, None, "kernel", None),
    ("Apr 05 12:00:00 myhost sudo[4242]: zuul executed command",
     None, None, "sudo", 4242),
    ("2022-02-28 09:39:09.5 | INFO keystone.auth token issued",
     "INFO", "keystone.auth", None, None),
    ("    raise ValueError('continuation, nothing extractable')",
     None, None, None, None),
]


def _parse(spark, impl):
    df = spark.createDataFrame(
        [("c1", i, "assistant", text, None, TS)
         for i, (text, *_rest) in enumerate(LINES)],
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp",
    )
    return {
        r["turn_idx"]: r
        for r in parse_transcripts(df, impl=impl).collect()
    }


def test_grok_fields_both_impls(spark):
    for impl in ("native", "pandas"):
        got = _parse(spark, impl)
        for i, (_text, sev, sub, prog, pid) in enumerate(LINES):
            r = got[i]
            assert r["severity"] == sev, (impl, i)
            assert r["subsystem"] == sub, (impl, i)
            assert r["program"] == prog, (impl, i)
            assert r["pid"] == pid, (impl, i)


def test_iso_serialize_micros_iff_nonzero(spark):
    rows = [
        (0, dt.datetime(2022, 2, 28, 9, 39, 9, 596000)),
        (1, dt.datetime(2022, 2, 28, 19, 51, 55)),          # micros 0
        (2, dt.datetime(2024, 1, 1, 0, 0, 0, 7)),           # pad to 6
        (3, None),
        # pre-1970: unix_micros is negative; pmod must still yield
        # the 0..999999 fractional field isoformat carries
        (4, dt.datetime(1960, 6, 1, 12, 0, 0, 250000)),
    ]
    df = spark.createDataFrame(rows, "i int, ts timestamp")
    got = {
        r["i"]: r["iso"]
        for r in df.select(
            "i", iso_serialize_col(F.col("ts")).alias("iso")
        ).collect()
    }
    # datetime.isoformat() goldens (reference logsender.py:419)
    assert got[0] == "2022-02-28T09:39:09.596000"
    assert got[1] == "2022-02-28T19:51:55"
    assert got[2] == "2024-01-01T00:00:00.000007"
    assert got[3] is None
    assert got[4] == "1960-06-01T12:00:00.250000"
    for i, ts in rows:
        if ts is not None:
            assert got[i] == ts.isoformat()
