"""Hypothesis property tests for the CDC family: apply_cdc against a
pure-Python dict-replay reference on arbitrary change sets, the
snapshot_asof prefix-monotonicity law, and scd2_intervals interval
invariants on arbitrary update streams.

Example counts are small (each example runs Spark jobs); hypothesis
shrinks any failure to a minimal change set.
"""

from datetime import datetime, timedelta

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F  # noqa: F401

from ci_log_processing_spark.operators.enrich import scd2_intervals
from ci_log_processing_spark.operators.snapshot import (
    apply_cdc,
    snapshot_asof,
)

# a change op: (key in a small space, op, payload tag)
_ops = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=5),
        st.sampled_from(["I", "U", "D"]),
        st.integers(min_value=0, max_value=99),
    ),
    min_size=0,
    max_size=12,
)


def _dict_replay(base: dict, changes: list) -> dict:
    """Reference semantics: last-writer-wins by seq (= list order),
    deletes drop, upserts replace-or-add."""
    last = {}
    for seq, (k, op, tag) in enumerate(changes):
        last[k] = (op, tag)
    out = dict(base)
    for k, (op, tag) in last.items():
        if op == "D":
            out.pop(k, None)
        else:
            out[k] = f"p{tag}"
    return out


def _spark_frames(spark, base, changes):
    base_df = spark.createDataFrame(
        [(k, v) for k, v in base.items()] or [(None, None)],
        "doc_id long, text string",
    ).filter("doc_id IS NOT NULL")
    ch_df = spark.createDataFrame(
        [
            (k, op, seq, f"p{tag}")
            for seq, (k, op, tag) in enumerate(changes)
        ]
        or [(None, None, None, None)],
        "doc_id long, op string, seq long, text string",
    ).filter("doc_id IS NOT NULL")
    return base_df, ch_df


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(changes=_ops)
def test_apply_cdc_matches_dict_replay(spark, changes):
    base = {0: "b0", 1: "b1", 2: "b2"}
    base_df, ch_df = _spark_frames(spark, base, changes)
    got = {
        r.doc_id: r.text for r in apply_cdc(base_df, ch_df).collect()
    }
    assert got == _dict_replay(base, changes)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(changes=_ops, cut=st.integers(min_value=0, max_value=12))
def test_snapshot_asof_equals_replay_of_prefix(spark, changes, cut):
    base = {0: "b0", 3: "b3"}
    base_df, ch_df = _spark_frames(spark, base, changes)
    got = {
        r.doc_id: r.text
        for r in snapshot_asof(base_df, ch_df, as_of_seq=cut).collect()
    }
    assert got == _dict_replay(base, changes[: cut + 1])


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    streams=st.lists(
        st.lists(st.integers(min_value=0, max_value=500), min_size=1,
                 max_size=6),
        min_size=1,
        max_size=3,
    )
)
def test_scd2_interval_invariants(spark, streams):
    t0 = datetime(2024, 1, 1)
    rows = []
    for k, offsets in enumerate(streams):
        for seq, off in enumerate(offsets):
            rows.append(
                (f"k{k}", t0 + timedelta(minutes=off),
                 f"st{seq}", seq)
            )
    cfg = spark.createDataFrame(
        rows,
        "conv_id string, cfg_ts timestamp, cfg_state string, "
        "cfg_seq long",
    )
    by_key: dict = {}
    for r in scd2_intervals(cfg).collect():
        by_key.setdefault(r.conv_id, []).append(r)
    for k, ivs in by_key.items():
        ivs.sort(key=lambda r: r.version)
        # versions are 1..n dense
        assert [r.version for r in ivs] == list(range(1, len(ivs) + 1))
        # exactly one current interval, and it is the last
        assert [r.is_current for r in ivs] == (
            [False] * (len(ivs) - 1) + [True]
        )
        # intervals chain: valid_to == next valid_from, no gaps
        for a, b in zip(ivs, ivs[1:]):
            assert a.valid_to == b.valid_from
        assert ivs[-1].valid_to is None
        # row count preserved per key
        assert len(ivs) == len(streams[int(k[1:])])
