"""Multiline traceback event merging — the legacy Logstash multiline
filter the reference repo carries
(opensearch-config/config/openstack-filters.conf:11-43): continuation
lines (no leading timestamp — python tracebacks, `TRACE`/`ERROR`
stack frames) are joined onto the PREVIOUS timestamped event, which
becomes one document whose message is the full traceback.

Spark-first shape: the forward-fill window already computes, per
(conv, turn order), a running count of timestamped lines — that count
IS the merged-event id (anchor line + its continuations share it).
One window + one groupBy; the aggregation is a partial+final
HashAggregate on (conv_id, session_id), and the window reuses the
conv-keyed exchange the pipeline already has — no extra shuffle
beyond the aggregate itself.

Ordered concatenation without a sort-within-group shuffle:
collect_list(struct(turn_idx, message)) -> array_sort -> transform ->
array_join. turn_idx is unique per conv so the struct sort is total.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def with_session_id(parsed: DataFrame) -> DataFrame:
    """session_id = number of timestamped lines seen so far in the
    conversation (anchor + continuations share one id; leading
    continuation lines before any timestamp get id 0)."""
    w = (
        Window.partitionBy("conv_id")
        .orderBy("turn_idx")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return parsed.withColumn("session_id", F.count("event_ts").over(w))


def merge_multiline(parsed: DataFrame) -> DataFrame:
    """Collapse each (anchor, continuations...) group into ONE event.

    Input: parsed rows with conv_id, turn_idx, event_ts, message.
    Output one row per merged event:
      conv_id, session_id, anchor_turn, last_turn, n_lines,
      event_ts   (the anchor's timestamp; NULL for an id-0 preamble
                  group that has no anchor),
      message    (all member messages joined with newlines, in turn
                  order — "the full traceback as one record").
    """
    s = with_session_id(parsed)
    ordered = F.array_join(
        F.transform(
            F.array_sort(
                F.collect_list(F.struct("turn_idx", "message"))
            ),
            lambda x: x["message"],
        ),
        "\n",
    )
    return s.groupBy("conv_id", "session_id").agg(
        F.min("turn_idx").alias("anchor_turn"),
        F.max("turn_idx").alias("last_turn"),
        F.count(F.lit(1)).alias("n_lines"),
        F.max("event_ts").alias("event_ts"),
        ordered.alias("message"),
    )
