"""URL canonicalization / blocklist / keep-first dedup
(operators/urls.py) — the crawl-provenance pass that precedes
content dedup."""

from ci_log_processing_spark.operators.urls import (
    attach_urls,
    normalize_urls,
    url_dedup,
)


def test_normalization_rule(spark):
    rows = [
        (1, "http://www.Example.com:80/a/?utm_source=x&b=2&a=1#frag"),
        (2, "https://example.com/a?a=1&b=2"),
        (3, "https://sub.example.com:443/a"),
        (4, "https://example.com/plain?fbclid=zzz&gclid=q&ref=h"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, url string")
    out = {
        r["doc_id"]: (r["url_norm"], r["domain"])
        for r in normalize_urls(docs).collect()
    }
    # scheme/www/port/fragment/trailing-slash normalize away and
    # params are sorted -> 1 and 2 are the SAME page
    assert out[1] == ("https://example.com/a?a=1&b=2", "example.com")
    assert out[1][0] == out[2][0]
    # subdomain is identity-relevant (only www. strips)
    assert out[3] == ("https://sub.example.com/a", "sub.example.com")
    # all-tracking query collapses to no query
    assert out[4][0] == "https://example.com/plain"


def test_blocklist_and_keep_first(spark):
    rows = [
        (5, "https://example.com/x"),
        (9, "http://www.example.com/x/"),      # same page as 5
        (7, "https://tracker.biz/x"),           # blocked exact
        (8, "https://cdn.tracker.biz/x"),       # blocked subdomain
        (6, "https://nottracker.biz/x"),        # NOT blocked (no dot)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, url string")
    out = sorted(r["doc_id"] for r in url_dedup(docs).collect())
    assert out == [5, 6]


def test_attach_urls_deterministic(spark):
    docs = spark.createDataFrame(
        [(i,) for i in range(12)], "doc_id long"
    )
    urls = {r["doc_id"]: r["url"] for r in attach_urls(docs).collect()}
    assert urls[0] == "http://example.com/p/0/?utm_source=x&id=0"
    assert urls[1] == "https://www.Example.com/p/1?id=1&fbclid=abc"
    assert urls[4] == "https://tracker.biz/p/4/?id=4&fbclid=abc"


def test_token_entropy_formula(spark):
    """Hand-computed entropies: uniform tokens -> ln(k); single
    repeated token -> 0; mixed counts match the closed form."""
    import math

    from ci_log_processing_spark.operators.textstats import token_entropy

    docs = spark.createDataFrame(
        [
            (1, "a b c d"),          # uniform over 4 -> ln 4
            (2, "x x x x x"),        # single token -> 0
            (3, "a a b"),            # H = ln3 - (2 ln2)/3
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in token_entropy(docs).collect()}
    assert abs(out[1]["token_entropy"] - math.log(4)) < 1e-6
    assert out[1]["n_tok"] == 4
    assert out[2]["token_entropy"] == 0.0
    assert (
        abs(
            out[3]["token_entropy"]
            - (math.log(3) - 2 * math.log(2) / 3)
        )
        < 1e-6
    )
