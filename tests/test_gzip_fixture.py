"""Gzip'd log sample fixture — the reference doubles its download
list with .gz variants (get_files_to_check, logscraper.py:515-527)
and the north star lists gzip log samples as a fixture class.
Spark reads .gz text transparently; the parse cascade must behave
identically on decompressed lines."""

import gzip

from pyspark.sql import functions as F

from ci_log_processing_spark.functions.timestamps import (
    parse_timestamp_py,
    ts_cascade_col,
)

LINES = [
    "2022-02-28 09:39:09.596 | Job console starting...",
    "2022-03-21T08:39:18.220547Z | Last metadata expiration check",
    "Mar 31 04:50:23.795709 nested-virt some log",
    "    raise ValueError('continuation')",
    "Friday 25 February 2022  09:27:51 +0000 (0:00:00.056)",
]


def test_gzip_roundtrip(spark, tmp_path):
    gz = tmp_path / "job-output.txt.gz"
    with gzip.open(gz, "wt") as f:
        f.write("\n".join(LINES) + "\n")

    df = spark.read.text(str(gz))
    assert df.count() == len(LINES)
    got = {
        r["value"]: r["ts"]
        for r in df.withColumn(
            "ts", ts_cascade_col(F.col("value"), 2024)
        ).collect()
    }
    for line in LINES:
        assert got[line] == parse_timestamp_py(line, 2024), line
