"""gopher_rules / gopher_funnel (operators/textstats.py): Rae et
al. 2021 rule semantics vs hand-computed expectations, including
the empty-document and boundary-threshold edges."""

import pytest

from ci_log_processing_spark.operators.textstats import (
    GOPHER_RULE_ORDER,
    gopher_funnel,
    gopher_rules,
)

# a document that passes every rule: 60 plain words incl. >=2
# required stopwords, mean word length in [3, 10]
_GOOD = " ".join(["the", "with"] + ["alpha", "beta", "gamma"] * 20)


@pytest.fixture()
def docs(spark):
    rows = [
        (0, _GOOD),  # passes everything
        (1, ""),  # empty: fails word count / alpha / stopwords
        (2, "short text only"),  # fails min word count
        # bullet-heavy: every line starts with a bullet marker
        (3, "\n".join("- item %d" % i for i in range(60))),
        # ellipsis-heavy: every line ends with ...
        (4, "\n".join("the with line %d goes on..." % i for i in range(60))),
        # symbol-heavy: one '#' per word
        (5, " ".join("#tag%d" % i for i in range(60))),
        # numeric words: alpha ratio ~0 (and mean word len < 3)
        (6, " ".join(str(i % 10) for i in range(60))),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _by_id(df):
    return {r["doc_id"]: r.asDict() for r in df.collect()}


def test_rule_flags(docs):
    out = _by_id(gopher_rules(docs))

    good = out[0]
    assert good["keep"] == 1
    assert all(good[r] == 1 for r in GOPHER_RULE_ORDER)
    assert good["n_words"] == 62
    assert good["stopword_hits"] == 2

    empty = out[1]
    assert empty["n_words"] == 0
    assert empty["keep"] == 0
    assert empty["r_word_count"] == 0
    # 0 words -> ratios are 0 over max(n,1): symbol/bullet pass,
    # alpha fails (0.0 is not > 0.8)
    assert empty["r_alpha"] == 0
    assert empty["r_symbol"] == 1

    assert out[2]["r_word_count"] == 0

    bullets = out[3]
    assert bullets["bullet_ratio"] == 1.0
    assert bullets["r_bullet"] == 0 and bullets["keep"] == 0

    ell = out[4]
    assert ell["ellipsis_ratio"] == 1.0
    assert ell["r_ellipsis"] == 0 and ell["keep"] == 0
    # the trailing '...' also counts as a per-word symbol
    assert ell["r_symbol"] == 0

    sym = out[5]
    assert sym["symbol_ratio"] == 1.0
    assert sym["r_symbol"] == 0

    num = out[6]
    assert num["alpha_ratio"] == 0.0
    assert num["r_alpha"] == 0
    assert num["r_mean_word_len"] == 0  # mean word len 1 < 3


def test_rule_boundaries(spark):
    # exactly min_words words with everything else passing -> keep;
    # one fewer -> fail word count. Thresholds compare the ROUNDED
    # ratio, so a doc on the boundary behaves identically in the
    # DuckDB twin.
    base = ["the", "with"] + ["word"] * 48
    docs = spark.createDataFrame(
        [(0, " ".join(base)), (1, " ".join(base[:-1]))],
        "doc_id long, text string",
    )
    out = _by_id(gopher_rules(docs))
    assert out[0]["r_word_count"] == 1
    assert out[1]["r_word_count"] == 0


def test_funnel(docs):
    rows = {r["stage"]: r.asDict() for r in gopher_funnel(docs).collect()}
    assert set(rows) == set(GOPHER_RULE_ORDER)
    assert all(r["n_docs"] == 7 for r in rows.values())
    # isolated fails: word_count drops doc 1 and 2
    assert rows["r_word_count"]["n_fail_alone"] == 2
    # cumulative survivors are monotonically non-increasing in stage
    # order and end at the number of keep==1 docs (exactly doc 0)
    ordered = sorted(rows.values(), key=lambda r: r["stage_idx"])
    surv = [r["n_survive_cum"] for r in ordered]
    assert surv == sorted(surv, reverse=True)
    assert surv[-1] == 1
