"""DuckDB oracle SQL for every pipeline operator.

The driver runs each Spark query side-by-side with the SQL returned
here (on the same pre-registered parquet views) and compares
row-count + schema + order-insensitive value hashes. These strings
are therefore an INDEPENDENT re-implementation of the pipeline
semantics in ANSI-ish SQL — kept deliberately separate from the
DataFrame code under test.

Layout: small composable CTE builders; `pipeline_cte()` produces the
shared parse -> ffill -> enrich -> route prefix.
"""

from __future__ import annotations

from .functions.grok import severity_sql_duckdb, subsystem_sql_duckdb
from .functions.message import message_sql_duckdb
from .functions.timestamps import ts_cascade_sql_duckdb
from .operators.enrich import ROLE_PIPELINE, TOOL_CATEGORY
from .operators.route import PREAMBLE_PREFIX
from .sources.transcripts import text_sql, transcripts_sql

BATCH_TS = "2024-01-01 00:00:00"
REF_YEAR = 2024


def _role_pipeline_values() -> str:
    rows = ", ".join(f"('{r}', '{p}')" for r, p in sorted(ROLE_PIPELINE.items()))
    return f"(VALUES {rows}) AS rp(role, pipeline)"


def _tool_category_values() -> str:
    rows = ", ".join(
        "('{t}', '{c}', [{tags}])".format(
            t=t, c=c, tags=", ".join(f"'{x}'" for x in tags)
        )
        for t, (c, tags) in sorted(TOOL_CATEGORY.items())
    )
    return f"(VALUES {rows}) AS tc(tool, category, cat_tags)"


def pipeline_cte(skip_debug: bool = True) -> str:
    """Shared WITH-prefix: transcripts -> parsed -> filled -> enriched
    -> routed. Ends with CTE name `routed`."""
    msg = message_sql_duckdb("text")
    sev = severity_sql_duckdb("message")
    sub = subsystem_sql_duckdb("message")
    ts = ts_cascade_sql_duckdb("text", REF_YEAR)

    debug_arm = (
        "WHEN text LIKE '%DEBUG%' THEN 'drop_queue'" if skip_debug else ""
    )
    debug_reason = (
        "WHEN text LIKE '%DEBUG%' THEN 'debug'" if skip_debug else ""
    )

    return f"""
WITH transcripts AS ({transcripts_sql('duckdb', 'events')}),
parsed AS (
  SELECT conv_id, turn_idx, role, text, tool, ts,
         {ts} AS event_ts,
         {msg} AS message
  FROM transcripts
),
parsed2 AS (
  SELECT *, {sev} AS severity, {sub} AS subsystem FROM parsed
),
filled AS (
  SELECT *,
    coalesce(
      last_value(event_ts IGNORE NULLS) OVER (
        PARTITION BY conv_id ORDER BY turn_idx
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
      TIMESTAMP '{BATCH_TS}') AS filled_ts,
    count(event_ts) OVER (
      PARTITION BY conv_id ORDER BY turn_idx
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prior_ts_count
  FROM parsed2
),
enriched AS (
  SELECT f.*,
    coalesce(rp.pipeline, 'NONE') AS pipeline,
    CASE WHEN f.tool IS NULL THEN NULL
         ELSE coalesce(tc.category, f.tool) END AS category,
    CASE WHEN f.tool IS NULL THEN []::VARCHAR[]
         ELSE list_sort(list_distinct(
              coalesce(tc.cat_tags, []::VARCHAR[]) || [f.tool])) END AS tags
  FROM filled f
  LEFT JOIN {_role_pipeline_values()} ON f.role = rp.role
  LEFT JOIN {_tool_category_values()} ON f.tool = tc.tool
),
routed AS (
  SELECT *,
    CASE
      WHEN starts_with(text, '{PREAMBLE_PREFIX}') AND prior_ts_count = 0
        THEN 'drop_queue'
      {debug_arm}
      WHEN length(message) = 0 THEN 'drop_queue'
      WHEN severity IN ('ERROR', 'CRITICAL') THEN 'errors'
      WHEN tool IS NOT NULL OR role = 'tool' THEN 'tool_calls'
      ELSE 'agent_turns'
    END AS sink,
    CASE
      WHEN starts_with(text, '{PREAMBLE_PREFIX}') AND prior_ts_count = 0
        THEN 'preamble'
      {debug_reason}
      WHEN length(message) = 0 THEN 'empty_message'
      ELSE NULL
    END AS drop_reason
  FROM enriched
)
"""


# --- per-query oracles -------------------------------------------------

PARSE_COLS = "conv_id, turn_idx, event_ts, severity, subsystem, message"


def q_parse() -> str:
    return pipeline_cte() + f"SELECT {PARSE_COLS} FROM parsed2"


def q_ffill() -> str:
    return pipeline_cte() + (
        "SELECT conv_id, turn_idx, event_ts, filled_ts FROM filled"
    )


def q_enrich() -> str:
    return pipeline_cte() + (
        "SELECT conv_id, turn_idx, role, tool, pipeline, category, "
        # DuckDB's array_to_string returns NULL for []; Spark's
        # concat_ws returns '' — normalize to Spark's behavior
        "coalesce(array_to_string(tags, ','), '') AS tags_str FROM enriched"
    )


def q_route() -> str:
    return pipeline_cte() + (
        "SELECT conv_id, turn_idx, sink, drop_reason FROM routed"
    )


def q_sink_counts() -> str:
    return pipeline_cte() + (
        "SELECT sink, count(*) AS cnt FROM routed GROUP BY sink"
    )


def q_sink_rows(sink: str) -> str:
    cols = (
        "conv_id, turn_idx, role, tool, event_ts, filled_ts, severity, "
        "subsystem, message, pipeline, category, drop_reason"
    )
    return pipeline_cte() + (
        f"SELECT {cols} FROM routed WHERE sink = '{sink}'"
    )


def q_agg_hourly() -> str:
    return pipeline_cte() + (
        "SELECT sink, severity, subsystem, "
        "date_trunc('hour', filled_ts) AS window_start, count(*) AS cnt "
        "FROM routed GROUP BY 1, 2, 3, 4"
    )


def q_conv_severity() -> str:
    return pipeline_cte() + (
        "SELECT conv_id, severity, count(*) AS cnt "
        "FROM routed GROUP BY 1, 2"
    )


def q_checkpoint_antijoin() -> str:
    # simulated checkpoint: conversations already processed =
    # those whose numeric suffix % 3 = 0 (deterministic)
    return pipeline_cte() + (
        "SELECT conv_id, turn_idx, sink FROM routed r "
        "WHERE NOT EXISTS (SELECT 1 FROM ("
        "  SELECT DISTINCT conv_id FROM routed "
        "  WHERE CAST(substr(conv_id, 6) AS INT) % 3 = 0) c "
        " WHERE c.conv_id = r.conv_id)"
    )


def q_dedup_messages() -> str:
    return pipeline_cte() + (
        "SELECT conv_id, count(DISTINCT message) AS distinct_messages "
        "FROM routed GROUP BY conv_id"
    )


def q_ts_formats() -> str:
    """Per line-class parse coverage (the timestamp-format table test
    as a query). Standalone CTE chain keeping event_id so the class
    is recoverable."""
    ts = ts_cascade_sql_duckdb("text", REF_YEAR)
    return f"""
WITH e AS (
  SELECT CAST(event_id % 12 AS INT) AS line_class,
         {text_sql('duckdb')} AS text
  FROM events
),
p AS (SELECT line_class, {ts} AS event_ts FROM e)
SELECT line_class, count(event_ts) AS parsed_cnt, count(*) AS total_cnt,
       min(event_ts) AS min_ts, max(event_ts) AS max_ts
FROM p GROUP BY 1
"""
