"""Broadcast-enrichment goldens — miss semantics mirror the
reference's get_file_info identity default (logsender.py:375-381;
golden tests/test_logsender.py:1199-1217)."""

import datetime

from ci_log_processing_spark.operators.enrich import with_enrichment


def test_enrichment(spark):
    t0 = datetime.datetime(2024, 1, 1)
    rows = [
        ("c1", 0, "assistant", "x", None, t0),
        ("c1", 1, "tool", "x", "bash", t0),
        ("c1", 2, "tool", "x", "unknown-tool", t0),
        ("c1", 3, "mystery-role", "x", None, t0),
    ]
    df = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
    )
    out = {r["turn_idx"]: r for r in with_enrichment(df, spark).collect()}
    assert out[0]["pipeline"] == "check"
    assert out[0]["category"] is None and out[0]["tags"] == []
    assert out[1]["pipeline"] == "gate"
    assert out[1]["category"] == "shell"
    assert out[1]["tags"] == ["bash", "exec"]  # sorted, deduped
    # miss -> identity default (tool, [tool])
    assert out[2]["category"] == "unknown-tool"
    assert out[2]["tags"] == ["unknown-tool"]
    # unknown role -> NONE (makeFields build_queue default)
    assert out[3]["pipeline"] == "NONE"
