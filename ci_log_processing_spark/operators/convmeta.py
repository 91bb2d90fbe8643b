"""Conversation-metadata normalization — the reference's
makeZuulCapability + makeFields pair (logsender.py:220-285).

The reference tolerates two API generations: `project`, `ref`,
`buildset` arrive as dicts (new Zuul) or scalars (old). Its golden
test demands identical parsed_fields from both
(tests/test_logsender.py:1035-1050). Spark translation: parse the
raw JSON TWICE with the two shapes' schemas (from_json yields NULL
on shape mismatch instead of failing) and F.coalesce field-wise —
the declarative analog of dict-or-scalar branching.

Field semantics from makeFields (logsender.py:252-285):
  build_node  constant 'zuul-executor'
  voting      bool -> int
  build_set   str(buildset) default 'NONE'
  build_queue pipeline default 'NONE'
  build_change int-as-string, '' when absent (the reference's
              int-or-'' mixed type pinned to STRING)
  change_url  falls back to ref_url (makeZuulCapability:246-248)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

NEW_SCHEMA = (
    "STRUCT<project: STRUCT<name: STRING>, "
    "ref: STRUCT<branch: STRING, change: STRING, patchset: STRING>, "
    "buildset: STRUCT<uuid: STRING>, "
    "pipeline: STRING, voting: BOOLEAN, change_url: STRING, ref_url: STRING>"
)
OLD_SCHEMA = (
    "STRUCT<project: STRING, branch: STRING, change: STRING, "
    "patchset: STRING, buildset: STRING, pipeline: STRING, "
    "voting: BOOLEAN, change_url: STRING, ref_url: STRING>"
)


def normalize_meta(df: DataFrame, json_col: str = "meta_json") -> DataFrame:
    new = F.from_json(F.col(json_col), NEW_SCHEMA)
    old = F.from_json(F.col(json_col), OLD_SCHEMA)
    change = F.coalesce(new["ref"]["change"], old["change"])
    return df.select(
        "conv_id",
        F.lit("zuul-executor").alias("build_node"),
        F.coalesce(new["project"]["name"], old["project"]).alias("project"),
        F.coalesce(new["voting"], old["voting"])
        .cast("int")
        .alias("voting"),
        F.coalesce(
            new["buildset"]["uuid"], old["buildset"], F.lit("NONE")
        ).alias("build_set"),
        F.coalesce(new["pipeline"], old["pipeline"], F.lit("NONE")).alias(
            "build_queue"
        ),
        F.coalesce(new["ref"]["branch"], old["branch"]).alias("build_branch"),
        # int(change) if change else '' — pinned to string type.
        # try_cast: the reference tolerates arbitrary API garbage in
        # `change`; a plain cast would throw under default ANSI mode.
        F.coalesce(change.try_cast("long").cast("string"), F.lit("")).alias(
            "build_change"
        ),
        F.coalesce(new["ref"]["patchset"], old["patchset"]).alias(
            "build_patchset"
        ),
        F.lit("local").alias("node_provider"),
        F.coalesce(
            new["change_url"], old["change_url"], old["ref_url"], new["ref_url"]
        ).alias("change_url"),
    )
