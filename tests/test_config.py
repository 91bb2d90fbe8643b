"""Config merge / gz expansion parity (SURVEY.md §2.2 P10/P11;
reference goldens tests/test_logscraper.py:509-562)."""

from ci_log_processing_spark.functions.config import (
    expand_gz,
    load_config,
    merge_dicts,
)


def test_merge_nested_dicts():
    a = {"x": {"y": 1}, "keep": "a"}
    b = {"x": {"z": 2}, "new": True}
    assert merge_dicts(a, b) == {
        "x": {"y": 1, "z": 2},
        "keep": "a",
        "new": True,
    }


def test_merge_lists_extend():
    a = {"files": [{"name": "job.log", "tags": ["console"]}]}
    b = {"files": [{"name": "perf.json", "tags": ["perf"]}]}
    assert merge_dicts(a, b)["files"] == [
        {"name": "job.log", "tags": ["console"]},
        {"name": "perf.json", "tags": ["perf"]},
    ]


def test_merge_conflicts_keep_existing(caplog):
    # reference parity (logscraper.py:485-492): every non-dict/
    # non-list conflict keeps the existing value and logs — INCLUDING
    # same-type scalars ({'n': 1} merged with {'n': 2} stays 1)
    a = {"n": 1, "s": "x"}
    merged = merge_dicts(a, {"n": 2, "s": [1]})
    assert merged["n"] == 1      # same-type scalar: existing kept
    assert merged["s"] == "x"    # incompatible: existing kept


def test_load_config_merges_files(tmp_path):
    p1 = tmp_path / "a.yaml"
    p2 = tmp_path / "b.yaml"
    p1.write_text("files:\n  - name: job.log\n    tags: [console]\n")
    p2.write_text("files:\n  - name: perf.json\n    tags: [perf]\n")
    cfg = load_config(str(p1), str(p2))
    assert [f["name"] for f in cfg["files"]] == ["job.log", "perf.json"]


def test_expand_gz():
    # reference parity (logscraper.py:515-527): twins appended after
    # the full original list; already-.gz names double too
    assert expand_gz(["job.log", "x.gz"]) == [
        "job.log", "x.gz", "job.log.gz", "x.gz.gz",
    ]
