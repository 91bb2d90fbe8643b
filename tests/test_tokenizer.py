"""BPE tokenizer training vs an independent pure-Python reference
(the classic Sennrich et al. 2016 algorithm: word-freq dict, pair
counting with collections.Counter, tuple-based merge application —
a completely different representation from the operator's
separator-framed string replace)."""

from collections import Counter

import pytest
from pyspark.sql import functions as F

from ci_log_processing_spark.operators.dedup import release_persisted
from ci_log_processing_spark.operators.tokenizer import (
    EOW,
    bpe_merges,
    bpe_token_counts,
)


def _ref_bpe(texts: list[str], n_merges: int):
    """Reference BPE: returns (merges, word->tokens)."""
    freq = Counter(w for t in texts for w in t.split(" ") if w)
    words = {w: tuple(list(w) + [EOW]) for w in freq}
    merges = []
    for rank in range(1, n_merges + 1):
        pairs: Counter = Counter()
        for w, syms in words.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += freq[w]
        if not pairs:
            break
        # max freq, ties by lexicographic (lhs, rhs)
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        (a, b), f = best
        merges.append((rank, a, b, a + b, f))
        new_words = {}
        for w, syms in words.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_words[w] = tuple(out)
        words = new_words
    return merges, words


CORPUS = [
    "low lower lowest low low",
    "new newer newest new",
    "wide wider widest wide wide wide",
    "low newer wide lowest",
    "a ab abc abcd a a ab",
]


@pytest.fixture()
def docs(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(CORPUS)], "doc_id long, text string"
    )


def test_bpe_merges_match_reference(spark, docs):
    got = [
        (r.merge_rank, r.lhs, r.rhs, r.merged, r.pair_freq)
        for r in bpe_merges(docs, n_merges=10).orderBy("merge_rank").collect()
    ]
    release_persisted()
    want, _ = _ref_bpe(CORPUS, 10)
    assert got == want


def test_bpe_token_counts_match_reference(spark, docs):
    got = {
        r.doc_id: r.n_bpe_tokens
        for r in bpe_token_counts(docs, n_merges=6).collect()
    }
    release_persisted()
    _, words = _ref_bpe(CORPUS, 6)
    want = {
        i: sum(len(words[w]) for w in t.split(" ") if w)
        for i, t in enumerate(CORPUS)
    }
    assert got == want


def test_bpe_overlapping_pair_left_to_right(spark):
    # pair ('a','a') over 'aaaa': L2R non-overlap -> [aa, aa, </w>];
    # over 'aaa' -> [aa, a, </w>]. The first merge must be (a,a).
    docs = spark.createDataFrame(
        [(0, "aaaa aaa aaaa")], "doc_id long, text string"
    )
    m = bpe_merges(docs, n_merges=1).collect()[0]
    release_persisted()
    assert (m.lhs, m.rhs) == ("a", "a")
    # aaaa contributes 3 (a,a) windows x2 freq... reference decides:
    want, _ = _ref_bpe(["aaaa aaa aaaa"], 1)
    assert (m.merge_rank, m.lhs, m.rhs, m.merged, m.pair_freq) == want[0]


def test_bpe_early_stop_when_fully_merged(spark):
    # single 1-char word: symbols [x, </w>] -> one merge possible,
    # then every word is a single symbol and training stops early
    docs = spark.createDataFrame([(0, "x x x")], "doc_id long, text string")
    got = bpe_merges(docs, n_merges=5).collect()
    release_persisted()
    assert len(got) == 1
    assert (got[0].lhs, got[0].rhs) == ("x", EOW)


def test_bpe_tie_breaks_lexicographic(spark):
    # words 'ab' and 'ba' give pairs (a,b),(b,</w>),(b,a),(a,</w>)
    # all freq 1 -> lexicographic min (a,</w>) wins ('<' = 0x3C
    # sorts before every lowercase letter, bytewise in both engines)
    docs = spark.createDataFrame([(0, "ab ba")], "doc_id long, text string")
    m = bpe_merges(docs, n_merges=1).collect()[0]
    release_persisted()
    assert (m.lhs, m.rhs) == ("a", EOW)
    want, _ = _ref_bpe(["ab ba"], 1)
    assert (m.merge_rank, m.lhs, m.rhs, m.merged, m.pair_freq) == want[0]


def test_bpe_words_with_separator_byte_dropped(spark):
    bad = "a\x01b"
    docs = spark.createDataFrame(
        [(0, f"ok {bad} ok")], "doc_id long, text string"
    )
    counts = {
        r.doc_id: r.n_bpe_tokens
        for r in bpe_token_counts(docs, n_merges=1).collect()
    }
    release_persisted()
    # the \x01 word contributes nothing; 'ok' merged once: ok,</w>
    # after merge (o,k) -> [ok, </w>] = 2 tokens x2 words
    assert counts == {0: 4}


def test_bpe_merges_gate_shape(spark, docs):
    out = bpe_merges(docs, n_merges=4)
    assert [f.name for f in out.schema.fields] == [
        "merge_rank", "lhs", "rhs", "merged", "pair_freq",
    ]
    assert out.count() == 4
    release_persisted()


def test_bpe_token_counts_arrow_matches_join_variant(spark, docs):
    from ci_log_processing_spark.operators.tokenizer import (
        bpe_token_counts_arrow,
    )

    join_side = {
        r.doc_id: r.n_bpe_tokens
        for r in bpe_token_counts(docs, n_merges=4).collect()
    }
    release_persisted()
    arrow_side = {
        r.doc_id: r.n_bpe_tokens
        for r in bpe_token_counts_arrow(docs, n_merges=4).collect()
    }
    release_persisted()
    assert join_side == arrow_side


def test_bpe_token_counts_arrow_drops_uncountable_docs(spark):
    from ci_log_processing_spark.operators.tokenizer import (
        bpe_token_counts_arrow,
    )

    docs = spark.createDataFrame(
        [(0, "ab ab"), (1, "\x01bad"), (2, "")],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: r.n_bpe_tokens
        for r in bpe_token_counts_arrow(docs, n_merges=1).collect()
    }
    release_persisted()
    # docs 1 and 2 have no countable word — absent, like the join
    # variant's inner join
    assert set(out) == {0}


def test_bpe_fertility_bounds_and_identity(spark):
    """Fertility >= 1000 milli by construction (a word is >= 1
    token); a corpus whose words are all single learned symbols
    after enough merges approaches 2000 (word + </w> marker)."""
    from ci_log_processing_spark.operators.dedup import (
        release_persisted,
    )
    from ci_log_processing_spark.operators.tokenizer import (
        bpe_fertility,
    )

    rows = [(i, "ab ab ab", "s0") for i in range(4)]
    rows += [(10 + i, "xyzq wvut", "s1") for i in range(4)]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, source string"
    )
    got = {r["source"]: r for r in bpe_fertility(df, n_merges=8).collect()}
    release_persisted()
    for src, r in got.items():
        assert r["fertility_milli"] >= 1000
    assert got["s0"]["n_ws_tokens"] == 12   # 3 words x 4 docs
    assert got["s1"]["n_ws_tokens"] == 8    # 2 words x 4 docs
    # 'ab' merges fully (high freq): 'a b </w>' -> 'ab</w>' = 1
    # symbol -> fertility 1000; rare 4-char words stay fragmented
    assert got["s0"]["fertility_milli"] <= got["s1"]["fertility_milli"]
    assert got["s0"]["n_docs"] == 4
