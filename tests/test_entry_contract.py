"""Driver-contract consistency: the __spark_entry__ surface the
grading driver consumes must stay internally coherent — every
oracle key names a real query, the verification rotation only lists
real queries, and nothing shadows anything. Pure-Python (no Spark
session), so it runs first and fails fast."""

import importlib
import sys


def _entry():
    if "__spark_entry__" in sys.modules:
        return sys.modules["__spark_entry__"]
    return importlib.import_module("__spark_entry__")


def test_oracle_keys_subset_of_queries():
    e = _entry()
    qs = set(e.queries())
    extra = set(e.oracle_sql()) - qs
    assert not extra, f"oracle_sql keys with no queries() entry: {extra}"


def test_every_query_has_oracle():
    # the repo-wide bar: NO rows-only checks — every operator claims
    # hash-exactness vs an independent DuckDB twin
    e = _entry()
    missing = set(e.queries()) - set(e.oracle_sql())
    assert not missing, f"queries() entries with no oracle: {missing}"


def test_verify_first_names_real_queries():
    e = _entry()
    qs = set(e.queries())
    bad = [n for n in e._VERIFY_FIRST if n not in qs]
    assert not bad, f"_VERIFY_FIRST names not in queries(): {bad}"


def test_verify_first_has_no_duplicates():
    e = _entry()
    assert len(e._VERIFY_FIRST) == len(set(e._VERIFY_FIRST))


def test_rotation_puts_verify_first_first():
    e = _entry()
    ordered = list(e.queries())
    head = ordered[: len(e._VERIFY_FIRST)]
    assert head == [n for n in e._VERIFY_FIRST if n in set(ordered)]


def test_oracle_sql_strings_are_nonempty():
    e = _entry()
    for name, sql in e.oracle_sql().items():
        assert isinstance(sql, str) and sql.strip(), name


def test_catalog_md_in_sync():
    """CATALOG.md (VERDICT_r4 item 6) is generated from queries() /
    oracle_sql() / the committed CORRECTNESS and GATE_LOCAL
    artifacts; a stale committed copy fails here — regenerate with
    `python tools/make_catalog.py`."""
    import os
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, os.path.join(repo, "tools"))
    try:
        import make_catalog
    finally:
        sys.path.pop(0)
    with open(os.path.join(repo, "CATALOG.md")) as f:
        committed = f.read()
    assert committed == make_catalog.build_catalog(), (
        "CATALOG.md is stale — run python tools/make_catalog.py"
    )
