"""BucketedTableSink (sinks.py): co-bucketed tables join with ZERO
exchange — the write-time shuffle is amortized across later joins."""

import pytest
from pyspark.sql import functions as F

from ci_log_processing_spark.sinks import BucketedTableSink


@pytest.fixture(scope="module")
def bucket_db(spark, tmp_path_factory):
    loc = tmp_path_factory.mktemp("bucket_wh")
    spark.sql(f"CREATE DATABASE IF NOT EXISTS bstudy LOCATION '{loc}'")
    yield "bstudy"
    spark.sql("DROP DATABASE IF EXISTS bstudy CASCADE")


def _exchanges(df):
    plan = df._jdf.queryExecution().executedPlan().toString()
    return plan.count("Exchange hashpartitioning")


def test_cobucketed_join_has_zero_exchange(spark, bucket_db):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    embs = spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet"
    ).withColumnRenamed("vec_id", "doc_id")

    for name, df in (("docs_b", docs), ("embs_b", embs)):
        sink = BucketedTableSink(f"{bucket_db}.{name}", "doc_id", n_buckets=8)
        sink.ensure(spark)
        sink.append(df)

    old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    old_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    try:
        # forbid broadcast so the assertion exercises the bucketed
        # SMJ path (a broadcast join trivially has no hash exchange)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.enabled", "false")

        db = spark.table(f"{bucket_db}.docs_b")
        eb = spark.table(f"{bucket_db}.embs_b")
        joined_b = db.join(eb, "doc_id").select("doc_id", "source")
        assert _exchanges(joined_b) == 0, "co-bucketed join must not shuffle"

        joined_p = docs.join(embs, "doc_id").select("doc_id", "source")
        assert _exchanges(joined_p) == 2, "plain join shuffles both sides"

        # same answer either way
        assert joined_b.count() == joined_p.count() == docs.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)
        spark.conf.set("spark.sql.adaptive.enabled", old_aqe)


def test_bucketed_sink_validates_and_creates_db(spark, bucket_db):
    with pytest.raises(ValueError, match="n_buckets"):
        BucketedTableSink("t", "k", n_buckets=0)
    # ensure() on an unqualified table name is a no-op
    BucketedTableSink("unqualified", "k").ensure(spark)
