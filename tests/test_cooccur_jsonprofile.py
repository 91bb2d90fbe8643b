"""tool_cooccurrence (operators/toolgraph.py) and json_schema_profile
(operators/convmeta.py): semantics vs hand-computed expectations."""

from ci_log_processing_spark.operators.convmeta import json_schema_profile
from ci_log_processing_spark.operators.toolgraph import tool_cooccurrence

ROUTED_SCHEMA = (
    "conv_id string, turn_idx int, role string, tool string, "
    "message string, sink string"
)


def test_tool_cooccurrence_lift(spark):
    rows = [
        # grep and search co-occur in A and B; calc only in C
        ("A", 0, "assistant", "grep", "x", "tool_calls"),
        ("A", 1, "assistant", "search", "y", "tool_calls"),
        ("A", 2, "assistant", "grep", "x2", "tool_calls"),  # dup tool
        ("B", 0, "assistant", "grep", "x", "tool_calls"),
        ("B", 1, "assistant", "search", "y", "tool_calls"),
        ("C", 0, "assistant", "calc", "z", "tool_calls"),
        # dropped tool turn contributes nothing
        ("C", 1, "assistant", "grep", "q", "drop_queue"),
    ]
    df = spark.createDataFrame(rows, ROUTED_SCHEMA)
    out = {
        (r.tool_a, r.tool_b): r for r in tool_cooccurrence(df).collect()
    }
    assert set(out) == {("grep", "search")}
    r = out[("grep", "search")]
    # N=3 convs, n_grep=2, n_search=2, n_both=2
    assert (r.n_both, r.n_a, r.n_b) == (2, 2, 2)
    # lift = 2*3*1000 div (2*2) = 1500 — attraction
    assert r.lift_milli == 1500


def test_json_schema_profile_type_classes(spark):
    rows = [
        ("click", '{"k": 69, "f": 1.5, "b": true, "s": "x"}'),
        ("click", '{"k": -3}'),
        ("view", '{"k": "notnum"}'),
    ]
    df = spark.createDataFrame(rows, "event_type string, props string")
    out = {
        (r.event_type, r.key): r
        for r in json_schema_profile(df).collect()
    }
    k = out[("click", "k")]
    assert (k.n_records, k.n_int, k.n_float, k.n_bool) == (2, 2, 0, 0)
    assert k.n_distinct_values == 2
    assert out[("click", "f")].n_float == 1
    assert out[("click", "b")].n_bool == 1
    s = out[("click", "s")]
    assert (s.n_int, s.n_float, s.n_bool) == (0, 0, 0)
    # same key under another group profiles independently
    assert out[("view", "k")].n_int == 0
