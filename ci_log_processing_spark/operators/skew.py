"""Explicit partitioning / skew handling (north rule: salted-hash
partitioning on conv_id with skew handling for long transcripts).

Why an explicit repartition instead of trusting the scan layout:
projections are pipelined into the scan stage, so the (CPU-heavy)
regex parse inherits FILE parallelism — a handful of packed parquet
splits can serialize a 32-core job (observed: local[32] no faster
than local[8] until this exchange was added). Hash-repartitioning
by conv_id right after the scan

  * moves the parse behind an exchange sized to the session's
    shuffle partitions — full CPU parallelism;
  * is the exact distribution the forward-fill window needs
    (hashpartitioning(conv_id, N)), so Catalyst reuses it and the
    window adds NO second shuffle;
  * evens out long-transcript skew across ~|convs| >> N keys.

For a single pathological conversation (one conv >> one partition's
budget) the window itself must see the whole conv, so splitting it
is semantically impossible — AQE's skew handling plus the fact that
conv sizes are bounded (10^4 turns) keeps the straggler bounded. A
true salt (conv_id, turn_idx // B) bucket split IS available for
salt-safe stages (aggregates), see salted_bucket().
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def repartition_by_conv(
    df: DataFrame, spark: SparkSession, num_partitions: int | None = None
) -> DataFrame:
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions"))
    return df.repartition(num_partitions, F.col("conv_id"))


def salted_bucket(turns_per_bucket: int = 512) -> Column:
    """(conv_id, turn_idx // B) salt for order-insensitive stages
    (counts, sums): splits a mega-conversation across partitions;
    aggregate partials are merged by a second, tiny reduce."""
    return F.concat_ws(
        "#",
        F.col("conv_id"),
        (F.col("turn_idx") / turns_per_bucket).cast("int").cast("string"),
    )
