"""rl_trajectories (operators/sft.py) and quantile_normalize
(operators/curation.py): semantics vs hand-computed expectations."""

import pytest

from ci_log_processing_spark.operators.curation import quantile_normalize
from ci_log_processing_spark.operators.sft import rl_trajectories

ROUTED_SCHEMA = (
    "conv_id string, turn_idx int, role string, tool string, "
    "message string, sink string"
)


@pytest.fixture()
def routed_df(spark):
    rows = [
        ("A", 0, "assistant", "search", "q1", "tool_calls"),
        ("A", 1, "assistant", "search", "q1", "tool_calls"),
        ("A", 2, "assistant", "search", "q1", "tool_calls"),
        ("A", 3, "assistant", "search", "q2", "tool_calls"),
        ("A", 4, "assistant", None, "done", "errors"),
        ("B", 0, "user", None, "hi", "agent_turns"),
        ("B", 1, "assistant", "grep", "x", "tool_calls"),
        ("B", 2, "assistant", "grep", "y", "tool_calls"),
        ("B", 3, "user", None, "", "drop_queue"),  # invisible
        ("C", 0, "user", None, "same", "agent_turns"),
        ("C", 1, "user", None, "same", "agent_turns"),
    ]
    return spark.createDataFrame(rows, ROUTED_SCHEMA)


def test_rl_trajectories_counts_and_reward(routed_df):
    out = {r.conv_id: r for r in rl_trajectories(routed_df).collect()}
    a = out["A"]
    assert (a.n_steps, a.n_tool_calls, a.n_errors) == (5, 4, 1)
    # reward_milli = ((5 - 1) * 1000) div 5 = 800 — exact integer
    assert a.reward_milli == 800
    b = out["B"]
    # dropped turn 3 is excluded from the trajectory entirely
    assert (b.n_steps, b.n_tool_calls, b.n_errors) == (3, 2, 0)
    assert b.reward_milli == 1000
    assert out["C"].reward_milli == 1000


def test_rl_trajectories_step_order_and_format(routed_df):
    out = {r.conv_id: r.traj for r in rl_trajectories(routed_df).collect()}
    assert out["A"] == "|".join(
        ["assistant:search:tool_calls"] * 4 + ["assistant:-:errors"]
    )
    # turn order survives the collect_list/array_sort round-trip,
    # and the null tool renders as '-'
    assert out["B"] == (
        "user:-:agent_turns|assistant:grep:tool_calls"
        "|assistant:grep:tool_calls"
    )


def test_quantile_normalize_per_group_ranks(spark):
    rows = [
        ("d1", "s1", 10),
        ("d2", "s1", 20),
        ("d3", "s1", 20),  # tie with d2 — doc_id breaks it
        ("d4", "s2", 999),  # singleton group
        ("d5", "s3", 5),
        ("d6", "s3", 1),
    ]
    df = spark.createDataFrame(
        rows, "doc_id string, source string, quality long"
    )
    out = {
        r.doc_id: r.q_milli
        for r in quantile_normalize(df, score_col="quality").collect()
    }
    # s1: ranks 1,2,3 over n=3 -> (rk-1)*1000 div 2 = 0, 500, 1000
    assert (out["d1"], out["d2"], out["d3"]) == (0, 500, 1000)
    # singleton group maps to 0, not a division by zero
    assert out["d4"] == 0
    # s3: min -> 0, max -> 1000 regardless of raw scale
    assert (out["d6"], out["d5"]) == (0, 1000)


def test_quantile_normalize_is_scale_free(spark):
    # multiplying every score by 7 must not change any bucket
    rows = [(f"d{i}", "s", i * 3 + 1) for i in range(11)]
    df = spark.createDataFrame(
        rows, "doc_id string, source string, quality long"
    )
    scaled = df.selectExpr(
        "doc_id", "source", "quality * 7 AS quality"
    )
    base = {
        r.doc_id: r.q_milli
        for r in quantile_normalize(df, score_col="quality").collect()
    }
    scl = {
        r.doc_id: r.q_milli
        for r in quantile_normalize(scaled, score_col="quality").collect()
    }
    assert base == scl
