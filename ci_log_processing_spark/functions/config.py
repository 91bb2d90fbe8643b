"""Config loading / merging — reference `merge_dicts` + `load_config`
(logscraper.py:482-512) and the `.gz` file-list expansion
(`get_files_to_check`, logscraper.py:515-527).

Driver-side Python by design: this is job configuration, not the
data path (SURVEY.md §2.2 P10/P11). Semantics preserved exactly:

  * dict values merge recursively;
  * list values EXTEND (not replace);
  * incompatible types: the existing value wins, a warning is
    logged (the reference logs and skips, logscraper.py:494-497);
  * every configured name is doubled with a '.gz' twin so
    compressed uploads route identically.
"""

from __future__ import annotations

import logging

log = logging.getLogger(__name__)


def merge_dicts(base: dict, other: dict) -> dict:
    """Recursively merge ``other`` into ``base`` (in place, returned).

    Reference: merge_dicts, logscraper.py:482-499.
    """
    for key, value in other.items():
        if key not in base:
            base[key] = value
            continue
        current = base[key]
        if isinstance(current, dict) and isinstance(value, dict):
            merge_dicts(current, value)
        elif isinstance(current, list) and isinstance(value, list):
            current.extend(value)
        elif type(current) is type(value):
            base[key] = value
        else:
            log.warning(
                "config merge: incompatible types for %r (%s vs %s); "
                "keeping existing value",
                key,
                type(current).__name__,
                type(value).__name__,
            )
    return base


def load_config(*paths: str) -> dict:
    """Merge YAML config files left to right (load_config,
    logscraper.py:502-512)."""
    import yaml

    merged: dict = {}
    for path in paths:
        with open(path) as f:
            doc = yaml.safe_load(f) or {}
        merge_dicts(merged, doc)
    return merged


def expand_gz(names: list[str]) -> list[str]:
    """Double the download list with .gz twins (get_files_to_check,
    logscraper.py:515-527): ['job.log'] -> ['job.log', 'job.log.gz'].
    Names already ending in .gz are kept as-is, not doubled."""
    out: list[str] = []
    for n in names:
        out.append(n)
        if not n.endswith(".gz"):
            out.append(n + ".gz")
    return out
