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


def rollup_hourly(df: DataFrame, ts_col: str = "filled_ts") -> DataFrame:
    """Multi-grain counts in ONE aggregate: (sink, severity, hour)
    detail plus per-(sink, severity), per-sink and grand-total
    subtotals via ROLLUP — the dashboard query family the reference
    answers with four separate Monitoring counters
    (logscraper.py:295-304), collapsed into a single pass.

    Catalyst expands the rollup BEFORE the partial aggregate, so the
    map-side combine applies to every grain and the shuffled volume
    is (distinct groups) x (grains), never rows x grains. `grain`
    (grouping_id) disambiguates a subtotal NULL from a genuine NULL
    severity — bit i set = column i rolled up.
    """
    return df.rollup(
        "sink",
        "severity",
        F.date_trunc("hour", F.col(ts_col)).alias("window_start"),
    ).agg(F.count(F.lit(1)).alias("cnt"), F.grouping_id().alias("grain"))


def session_window_agg(
    df: DataFrame, gap_sec: int = 1800, ts_col: str = "filled_ts"
) -> DataFrame:
    """EVENT-TIME session windows: turns whose gap to the previous
    turn in the conversation is <= gap_sec merge into one session
    (Spark merges an event landing exactly at the current window end
    — verified empirically; the oracle's island rule is `diff > gap
    starts a new session` to match). Complements the count-based
    traceback sessionization (pipe_sessionize) with the idle-gap
    definition the reference's follow loop applies between polls.

    Native F.session_window, so the IDENTICAL operator runs under
    Structured Streaming with watermark-driven state eviction — no
    bespoke gaps-and-islands window to port. Batch plan: one hash
    exchange on conv_id + sort, same class as every other conv-keyed
    stage. session_end = last event + gap (Spark's window.end).
    """
    if gap_sec <= 0:
        raise ValueError("session_window_agg: gap_sec must be positive")
    return (
        df.filter(F.col(ts_col).isNotNull())
        .groupBy(
            "conv_id", F.session_window(F.col(ts_col), f"{gap_sec} seconds")
        )
        .agg(
            F.count(F.lit(1)).alias("n_turns"),
            F.min("turn_idx").alias("first_turn"),
            F.max("turn_idx").alias("last_turn"),
        )
        .select(
            "conv_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_turns",
            "first_turn",
            "last_turn",
        )
    )


def sliding_window_agg(
    df: DataFrame,
    window_sec: int = 3600,
    slide_sec: int = 1800,
    ts_col: str = "filled_ts",
) -> DataFrame:
    """Overlapping (sliding) event-time windows — the smoothed
    rate/error-budget series a monitoring dashboard draws. Each event
    lands in window_sec/slide_sec windows (2 here); F.window expands
    them BEFORE the partial aggregate, so the exchange carries
    groups x overlap rows, the same Expand-then-combine shape as the
    rollup. window_sec must be a multiple of slide_sec so the window
    set is exactly the aligned grid both engines can enumerate.
    """
    if window_sec % slide_sec != 0:
        raise ValueError(
            "sliding_window_agg: window_sec must be a multiple of slide_sec"
        )
    return (
        df.filter(F.col(ts_col).isNotNull())
        .groupBy(
            "sink",
            F.window(
                F.col(ts_col), f"{window_sec} seconds", f"{slide_sec} seconds"
            ).alias("w"),
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            "sink",
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "cnt",
        )
    )


def severity_pivot_hourly(df: DataFrame, ts_col: str = "filled_ts") -> DataFrame:
    """Hour x severity WIDE counts — pivot with an EXPLICIT value
    list (the full grok taxonomy + NONE for unparsed lines), so no
    values-discovery job runs and the output schema is fixed at plan
    time: a single partial+final hash aggregate, one exchange on the
    hour key, n_<severity> long columns.
    """
    from ..functions.grok import SEVERITIES

    values = [*SEVERITIES, "NONE"]
    wide = (
        df.withColumn("_sev", F.coalesce(F.col("severity"), F.lit("NONE")))
        .groupBy(F.date_trunc("hour", F.col(ts_col)).alias("window_start"))
        .pivot("_sev", values)
        .agg(F.count(F.lit(1)))
    )
    return wide.select(
        "window_start",
        *[
            F.coalesce(F.col(f"`{v}`"), F.lit(0)).alias(f"n_{v.lower()}")
            for v in values
        ],
    )
