"""Subunit-analog test-result records — reference `subunit_iter`
(logsender.py:431-464; golden parse of tests/testrepository.subunit
at tests/test_logsender.py:1254-1359).

The duration rule is deliberately NOT total_seconds():
    str(td.seconds) + "." + str(td.microseconds)  -> float
so 7 s + 103220 us -> 7.103220, but 7 s + 1220 us -> "7.1220" ->
7.122 (unpadded microseconds change the magnitude). Replicated
exactly: concat(seconds, '.', micros-as-int) cast to double.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def test_durations(df: DataFrame) -> DataFrame:
    """(conv_id, test_name, test_status, start_ts, end_ts) ->
    reference-shaped records with the duration quirk and the
    strftime('%Y-%m-%dT%H:%M:%SZ') timestamp serialization."""
    # parquet timestamps may surface as TIMESTAMP_NTZ; pin to the
    # session-UTC instant before unix_micros
    diff_us = F.unix_micros(F.col("end_ts").cast("timestamp")) - F.unix_micros(
        F.col("start_ts").cast("timestamp")
    )
    secs = F.floor(diff_us / 1000000).cast("long")
    micros = (diff_us % 1000000).cast("long")
    duration = F.concat(
        secs.cast("string"), F.lit("."), micros.cast("string")
    ).cast("double")
    return df.select(
        "conv_id",
        "test_name",
        duration.alias("test_duration"),
        "test_status",
        F.date_format(F.col("start_ts"), "yyyy-MM-dd'T'HH:mm:ss'Z'").alias(
            "timestamp_str"
        ),
    )
