"""Hypothesis property tests: pack_sequences invariants on arbitrary
token-length profiles, and PII pattern agreement between Spark's Java
regex and Python's re on adversarial ASCII strings.

Example counts are kept small — every example runs Spark jobs — but
hypothesis shrinks failures to minimal cases, which seeded fuzz
cannot.
"""

import re

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from ci_log_processing_spark.operators.curation import pack_sequences
from ci_log_processing_spark.operators.pii import PII_RULES, pii_scrub

CAP = 50


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    profiles=st.lists(
        st.lists(st.integers(min_value=1, max_value=120), min_size=1,
                 max_size=15),
        min_size=1,
        max_size=3,
    )
)
def test_pack_invariants(spark, profiles):
    rows = []
    nt_by_doc = {}
    for g, lens in enumerate(profiles):
        for i, n in enumerate(lens):
            doc_id = g * 1000 + i
            rows.append((f"s{g}", doc_id, " ".join(["w"] * n)))
            nt_by_doc[doc_id] = n
    docs = spark.createDataFrame(
        rows, "source string, doc_id long, text string"
    )
    out = pack_sequences(docs, capacity=CAP).collect()
    assert {r["doc_id"] for r in out} == set(nt_by_doc)  # total
    by_group = {}
    for r in out:
        by_group.setdefault(r["source"], []).append(r)
    for src, rs in by_group.items():
        rs.sort(key=lambda r: r["doc_id"])
        # bins consecutive from 0 in doc_id order; offsets cumulative
        bin_i, used = 0, 0
        for r in rs:
            n = nt_by_doc[r["doc_id"]]
            assert r["n_tokens"] == n
            if used + n > CAP and used > 0:
                bin_i += 1
                used = 0
            assert r["bin_idx"] == bin_i, (src, r)
            assert r["offset_in_bin"] == used, (src, r)
            used += n
        # capacity respected except single-doc oversized bins
        fill = {}
        for r in rs:
            fill.setdefault(r["bin_idx"], []).append(nt_by_doc[r["doc_id"]])
        for ns in fill.values():
            assert sum(ns) <= CAP or len(ns) == 1


PII_ALPHABET = "aZ09.@-+_% m"


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    texts=st.lists(
        st.text(alphabet=PII_ALPHABET, min_size=0, max_size=60),
        min_size=1,
        max_size=20,
    )
)
def test_pii_counts_match_python_re(spark, texts):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: r for r in pii_scrub(docs, text_col="text").collect()
    }
    for i, t in enumerate(texts):
        for stem, rx, _ in PII_RULES:
            expect = len(re.findall(rx, t))
            assert got[i][f"n_{stem}"] == expect, (t, stem)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    n=st.integers(min_value=1, max_value=400),
    shard=st.integers(min_value=1, max_value=64),
    seed=st.sampled_from(["shuf1", "shuf2", "epoch3"]),
)
def test_shuffle_index_equals_global_window(spark, n, shard, seed):
    """The two-level bucket rank must equal the single-partition
    global window rank for ANY size, shard width, and seed."""
    import hashlib

    from ci_log_processing_spark.operators.curation import shuffle_index
    from ci_log_processing_spark.operators.dedup import release_persisted

    docs = spark.range(n).selectExpr("id AS doc_id")
    out = {
        r["doc_id"]: (r["global_idx"], r["shard"])
        for r in shuffle_index(docs, shard_size=shard, seed=seed).collect()
    }
    release_persisted()
    ref = sorted(
        range(n),
        key=lambda i: (hashlib.md5(f"{seed}{i}".encode()).hexdigest(), i),
    )
    assert len(out) == n
    for rank, doc in enumerate(ref):
        assert out[doc] == (rank, rank // shard)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    lens=st.lists(
        st.integers(min_value=1, max_value=40), min_size=1, max_size=30
    ),
    budget=st.integers(min_value=0, max_value=300),
)
def test_token_budget_prefix_property(spark, lens, budget):
    """The admitted set is exactly the longest md5-order prefix whose
    cumulative token count fits the budget — and is monotone in the
    budget."""
    import hashlib

    from ci_log_processing_spark.operators.curation import (
        token_budget_sample,
    )

    rows = [(i, "s", " ".join(["w"] * ln)) for i, ln in enumerate(lens)]
    docs = spark.createDataFrame(
        rows, "doc_id long, source string, text string"
    )
    got = set(
        r["doc_id"] for r in token_budget_sample(docs, budget).collect()
    )
    order = sorted(
        range(len(lens)),
        key=lambda i: (hashlib.md5(f"mix1{i}".encode()).hexdigest(), i),
    )
    expect, cum = set(), 0
    for i in order:
        cum += lens[i]
        if cum > budget:
            break
        expect.add(i)
    assert got == expect
