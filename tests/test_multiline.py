"""Multiline traceback merge goldens (legacy Logstash multiline
filter semantics, reference
opensearch-config/config/openstack-filters.conf:11-43)."""

import datetime as dt

from pyspark.sql import functions as F

from ci_log_processing_spark.operators.multiline import merge_multiline
from ci_log_processing_spark.plans.pipeline import parse_transcripts


def _transcripts(spark, rows):
    return spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp",
    )


TS = dt.datetime(2024, 3, 1)


def test_traceback_merges_onto_anchor(spark):
    rows = [
        ("c1", 0, "assistant",
         "2024-03-01 10:00:00.000000 | ERROR [nova.compute] boom", None, TS),
        ("c1", 1, "assistant", 'Traceback (most recent call last):', None, TS),
        ("c1", 2, "assistant", '  File "api.py", line 7, in go', None, TS),
        ("c1", 3, "assistant", '    raise ValueError("boom")', None, TS),
        ("c1", 4, "assistant",
         "2024-03-01 10:00:01.000000 | INFO [nova.compute] recovered",
         None, TS),
    ]
    parsed = parse_transcripts(_transcripts(spark, rows))
    out = {
        r["session_id"]: r
        for r in merge_multiline(parsed).collect()
    }
    assert set(out) == {1, 2}
    tb = out[1]
    assert tb["anchor_turn"] == 0 and tb["last_turn"] == 3
    assert tb["n_lines"] == 4
    assert tb["event_ts"] == dt.datetime(2024, 3, 1, 10, 0, 0)
    # the full traceback is ONE record, newline-joined in turn order
    assert tb["message"] == (
        "ERROR [nova.compute] boom\n"
        "Traceback (most recent call last):\n"
        '  File "api.py", line 7, in go\n'
        '    raise ValueError("boom")'
    )
    assert out[2]["message"] == "INFO [nova.compute] recovered"
    assert out[2]["n_lines"] == 1


def test_leading_continuations_group_zero(spark):
    # continuation lines BEFORE any timestamped line: session 0,
    # no anchor -> event_ts NULL (the reference forward-fill would
    # stamp these with utcnow(); our merge keeps them a distinct,
    # anchorless group)
    rows = [
        ("c2", 0, "assistant", "    at frame one", None, TS),
        ("c2", 1, "assistant", "    at frame two", None, TS),
        ("c2", 2, "assistant",
         "2024-03-01 09:00:00.000000 | INFO start", None, TS),
    ]
    parsed = parse_transcripts(_transcripts(spark, rows))
    out = {r["session_id"]: r for r in merge_multiline(parsed).collect()}
    assert out[0]["event_ts"] is None
    assert out[0]["message"] == "    at frame one\n    at frame two"
    assert out[1]["anchor_turn"] == 2


def test_merge_counts_cover_all_lines(spark):
    # invariant: sum(n_lines) over merged events == input line count
    rows = [
        ("c%d" % c, i, "assistant",
         ("2024-03-01 10:00:0%d.000000 | INFO line" % i)
         if i % 3 == 0 else "    continuation",
         None, TS)
        for c in range(4)
        for i in range(9)
    ]
    parsed = parse_transcripts(_transcripts(spark, rows))
    merged = merge_multiline(parsed)
    total = merged.agg(F.sum("n_lines")).collect()[0][0]
    assert total == len(rows)
    assert merged.filter(F.col("n_lines") != 3).count() == 0
