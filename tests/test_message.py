"""Message-split goldens — reference tests/test_logsender.py:1170-1175."""

import pytest
from pyspark.sql import functions as F

from ci_log_processing_spark.functions.message import (
    get_message_py,
    message_col,
)

CASES = [
    # text after FIRST pipe, lstripped
    ("2022-02-28 09:39:09.596 | Job console starting...", "Job console starting..."),
    # multi-pipe keeps later pipes
    ("ts|a|b|c", "a|b|c"),
    # no pipe -> whole line (not stripped)
    ("  no pipe here", "  no pipe here"),
    # newline removed
    ("head | tail\n", "tail"),
    # empty after pipe
    ("2022-02-28 09:39:11.0 | ", ""),
    ("", ""),
]


@pytest.mark.parametrize("line,expected", CASES)
def test_python(line, expected):
    assert get_message_py(line) == expected


def test_catalyst(spark):
    df = spark.createDataFrame([(i, line) for i, (line, _) in enumerate(CASES)], "i int, text string")
    got = {r["i"]: r["m"] for r in df.select("i", message_col(F.col("text")).alias("m")).collect()}
    for i, (_, expected) in enumerate(CASES):
        assert got[i] == expected, CASES[i]
