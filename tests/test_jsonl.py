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


def test_csv_quarantine_semantics(spark, tmp_path):
    """CSV corruption contract: type-cast failure, extra tokens AND
    short rows all quarantine (token-count mismatch flags both
    ways); a short row keeps its parsed prefix fields for triage."""
    from ci_log_processing_spark.sources.jsonl import (
        read_documents_csv,
        split_quarantine,
    )

    lines = [
        "1,hello world,en,src0,11",        # good
        "x2,broken id,en,src0,9",          # type failure -> corrupt
        "3,short row,en",                   # missing fields -> corrupt
        "4,too,many,fields,5,EXTRA",        # extra token -> corrupt
        "",                                 # blank -> corrupt
    ]
    p = tmp_path / "shard.csv"
    p.write_text("\n".join(lines) + "\n")
    out = read_documents_csv(
        spark, str(p),
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    rows = {r["raw_line"] or r["doc_id"]: r for r in out.collect()}
    good, bad = split_quarantine(out)
    assert rows[1]["is_corrupt"] is False
    assert rows["x2,broken id,en,src0,9"]["is_corrupt"] is True
    # short row: quarantined (CSV flags token-count mismatch both
    # ways), parsed prefix fields still populated for triage
    short = rows["3,short row,en"]
    assert short["is_corrupt"] is True and short["doc_id"] == 3
    assert short["n_chars"] is None
    assert rows["4,too,many,fields,5,EXTRA"]["is_corrupt"] is True
    # blank line: explicitly quarantined, never a phantom NULL row
    assert good.count() == 1 and bad.count() == 4
    # quarantined rows keep raw bytes; good rows don't carry them
    assert all(r["raw_line"] is not None for r in bad.collect())
