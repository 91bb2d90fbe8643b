"""Config loading / merging — reference `merge_dicts` + `load_config`
(logscraper.py:482-512) and the `.gz` file-list expansion
(`get_files_to_check`, logscraper.py:515-527).

Driver-side Python by design: this is job configuration, not the
data path (SURVEY.md §2.2 P10/P11). Semantics preserved exactly:

  * dict values merge recursively;
  * list values EXTEND (not replace);
  * ANY other conflict — including same-type scalars — keeps the
    existing value and logs (the reference's else branch handles
    every non-list/non-dict case, logscraper.py:485-492);
  * the download list is doubled with '.gz' twins appended AFTER
    the full original list — including names already ending in .gz
    (the reference does not special-case them,
    logscraper.py:515-527).
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
        else:
            # the reference keeps the existing value and logs for ALL
            # remaining conflicts, including same-type scalars
            # ({'n': 1} merged with {'n': 2} stays 1) —
            # logscraper.py:485-492
            log.warning(
                "config merge: incompatible merge for %r (%s vs %s); "
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
    logscraper.py:515-527): ['a.log', 'b.log'] ->
    ['a.log', 'b.log', 'a.log.gz', 'b.log.gz'].

    Exact reference parity: twins are appended AFTER the whole
    original list (not interleaved), and names already ending in
    .gz are doubled too ('x.gz' -> 'x.gz.gz') — the reference does
    not special-case them.
    """
    return list(names) + [n + ".gz" for n in names]
