"""Per-sink grouped aggregates — the reference's monitoring
counters (`Monitoring.parse_metrics` per-job gauges,
logscraper.py:295-304) widened to the north-star shape:
counts by conv_id / severity / subsystem over hourly event-time
windows, per sink.

Plain groupBy().count(): Catalyst plans a partial (map-side)
hash aggregate before the shuffle, so the shuffled volume is the
number of distinct groups, not the number of turns — the property
that makes this viable at 10^12 turns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hourly_agg(df: DataFrame, ts_col: str = "filled_ts") -> DataFrame:
    """counts by (sink, severity, subsystem, hour)."""
    return (
        df.groupBy(
            "sink",
            "severity",
            "subsystem",
            F.date_trunc("hour", F.col(ts_col)).alias("window_start"),
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def sink_counts(df: DataFrame) -> DataFrame:
    """rows per sink — the disjointness/coverage check aggregate."""
    return df.groupBy("sink").agg(F.count(F.lit(1)).alias("cnt"))


def conv_severity_counts(df: DataFrame) -> DataFrame:
    """per-conversation severity histogram (A1 analog)."""
    return df.groupBy("conv_id", "severity").agg(
        F.count(F.lit(1)).alias("cnt")
    )
