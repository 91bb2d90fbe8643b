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


def key_skew_audit(
    df: DataFrame, key_col: str, top_n: int = 20
) -> DataFrame:
    """Partition-planning diagnostic: the top-N heaviest keys with
    their exact row share — the table you read BEFORE choosing a
    shuffle key, salt factor, or AQE skew threshold (the study that
    motivated this module's repartition_by_conv/salted_bucket pair).

    Scale shape: one partial-aggregated count shuffle over the key
    (shuffled volume = distinct keys), a TakeOrderedAndProject heap
    for the top-N (never a global sort), and a broadcast of the
    1-row total. The per-key counts are persisted (registry-scoped,
    released via dedup.release_persisted) because BOTH the top-N heap
    and the total consume them — without the persist each branch
    would re-shuffle the base data. The rank window runs over the N
    surviving rows only. share_milli is exact integer thousandths so
    the audit is engine-reproducible (no float drift).
    """
    from pyspark.sql.window import Window

    from .dedup import _register_persist

    counts = _register_persist(
        df.groupBy(key_col).agg(F.count(F.lit(1)).alias("cnt"))
    )
    total = counts.agg(F.sum("cnt").alias("total"))
    top = counts.orderBy(
        F.col("cnt").desc(), F.col(key_col)
    ).limit(int(top_n))
    w = Window.orderBy(F.col("cnt").desc(), F.col(key_col))
    return (
        top.crossJoin(F.broadcast(total))
        .select(
            F.col(key_col).alias("key"),
            "cnt",
            F.expr("(cnt * 1000) div total").alias("share_milli"),
            F.row_number().over(w).alias("rank"),
        )
    )
