"""html_clean (functions/html.py): element removal, entity decode
ordering, and whitespace collapse on hand-built cases."""

from ci_log_processing_spark.functions.html import html_clean


def _clean(spark, html):
    df = spark.createDataFrame([(1, html)], "doc_id long, html string")
    return html_clean(df).collect()[0]


def test_script_and_style_content_removed(spark):
    r = _clean(
        spark,
        "<p>keep</p><script>if (1 < 2) { bad() }</script>"
        "<style>p > a {color:red}</style><p>also</p>",
    )
    assert r.clean_text == "keep also"


def test_multiline_script_removed(spark):
    r = _clean(spark, "<p>a</p><SCRIPT>\nline1\nline2\n</SCRIPT><p>b</p>")
    assert r.clean_text == "a b"


def test_entity_decode_amp_last(spark):
    # &amp;lt; must decode to the literal string "&lt;", NOT "<"
    r = _clean(spark, "<p>&amp;lt; &lt;i&gt; &quot;q&quot; &#39;s&#39;</p>")
    assert r.clean_text == "&lt; <i> \"q\" 's'"


def test_decoded_entities_survive_tag_strip(spark):
    # &lt;tail&gt; decodes AFTER tag-strip, so <tail> stays literal
    r = _clean(spark, "<div>&lt;tail&gt;</div>")
    assert r.clean_text == "<tail>"


def test_whitespace_collapse_and_len(spark):
    r = _clean(spark, "<p>  a\n\n b\t c  </p>")
    assert r.clean_text == "a b c"
    assert r.n_chars_clean == 5
