"""JSONL ingest: PERMISSIVE parse, record-level corrupt quarantine,
field nulling on bad rows, good/bad split."""

from ci_log_processing_spark.sources.jsonl import (
    read_documents_jsonl,
    split_quarantine,
)


def test_jsonl_quarantines_bad_records(spark, tmp_path):
    p = str(tmp_path / "shard")
    lines = [
        '{"doc_id": 1, "text": "good one"}',
        '{"doc_id": 2, "text": "truncat',          # invalid JSON
        '{"doc_id": 3, "text": "also fine"}',
        "not json at all",
        "",                                        # blank: quarantined
        '{"doc_id": 5}',                           # missing field: VALID
    ]
    (tmp_path / "raw.jsonl").write_text("\n".join(lines))
    spark.read.text(str(tmp_path / "raw.jsonl")).coalesce(1).write.text(p)

    df = read_documents_jsonl(spark, p, "doc_id long, text string")
    good, bad = split_quarantine(df)
    # corrupt-only aggregations must WORK (the JSON datasource's own
    # corrupt column throws QUERY_ONLY_CORRUPT_RECORD_COLUMN here)
    assert bad.count() == 3
    assert good.count() == 3
    g = {r["doc_id"]: r["text"] for r in good.collect()}
    # missing fields are NOT corruption — only unparseable lines are;
    # blank lines must NOT appear as phantom all-NULL good docs
    assert g == {1: "good one", 3: "also fine", 5: None}
    b = bad.collect()
    # quarantined rows keep no parsed fields but DO keep raw bytes
    assert all(r["doc_id"] is None for r in b)
    assert sorted(r["raw_line"] for r in b) == sorted(
        ['{"doc_id": 2, "text": "truncat', "not json at all", ""]
    )
