"""Timestamp-cascade golden table.

Cases mirror the reference's table test
(tests/test_logsender.py:1177-1194) and its fixture line classes:
six formats, year fill, the 14-char micro truncation quirk, and
non-matching lines. All three implementations (pure Python oracle,
Catalyst expression, pandas UDF) must agree on every case.
"""

import datetime

import pytest
from pyspark.sql import functions as F

from ci_log_processing_spark.functions.grok import make_grok_udf
from ci_log_processing_spark.functions.timestamps import (
    parse_timestamp_py,
    ts_cascade_col,
)

REF_YEAR = 2024

GOLDEN = [
    # (line, expected datetime or None)
    (
        "2022-03-21T08:39:18.220547Z | Last metadata expiration check",
        datetime.datetime(2022, 3, 21, 8, 39, 18, 220547),
    ),
    (
        "2022-02-28 09:39:09.596 | Job console starting...",
        datetime.datetime(2022, 2, 28, 9, 39, 9, 596000),
    ),
    # 14-char time window truncates micros: 795709 -> 795700
    (
        "Mar 31 04:50:23.795709 nested-virt some log",
        datetime.datetime(REF_YEAR, 3, 31, 4, 50, 23, 795700),
    ),
    (
        "Mar 21 09:33:23 fedora-rax-dfw sudo[2786]: zuul msg",
        datetime.datetime(REF_YEAR, 3, 21, 9, 33, 23),
    ),
    # first 19 iso chars of a multi-pipe ovs line
    (
        "2022-03-23T13:09:08.644Z|00040|connmgr|INFO|br-int: added",
        datetime.datetime(2022, 3, 23, 13, 9, 8),
    ),
    (
        "Friday 25 February 2022  09:27:51 +0000 (0:00:00.056)",
        datetime.datetime(2022, 2, 25, 9, 27, 51),
    ),
    # iso with offset, no fraction -> 19-char pattern
    (
        "2022-03-23T11:46:49+0000 some text",
        datetime.datetime(2022, 3, 23, 11, 46, 49),
    ),
    # no timestamp at all
    ('    raise ValueError("boom")', None),
    ("-- Logs begin at Mon 2022-02-28 09:00:00 UTC. --", None),
    ("plain words only", None),
    ("", None),
]


@pytest.mark.parametrize("line,expected", GOLDEN)
def test_python_oracle(line, expected):
    assert parse_timestamp_py(line, REF_YEAR) == expected


def test_catalyst_cascade(spark):
    df = spark.createDataFrame([(line,) for line, _ in GOLDEN], "text string")
    got = (
        df.withColumn("ts", ts_cascade_col(F.col("text"), REF_YEAR))
        .select("text", "ts")
        .collect()
    )
    by_text = {r["text"]: r["ts"] for r in got}
    for line, expected in GOLDEN:
        assert by_text[line] == expected, line


def test_pandas_udf_cascade(spark):
    grok = make_grok_udf(REF_YEAR)
    df = spark.createDataFrame([(line,) for line, _ in GOLDEN], "text string")
    got = df.select("text", grok(F.col("text")).alias("p")).collect()
    by_text = {r["text"]: r["p"]["event_ts"] for r in got}
    for line, expected in GOLDEN:
        assert by_text[line] == expected, line
