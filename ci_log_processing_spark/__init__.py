"""ci_log_processing_spark — a PySpark-native rebuild of the
openstack/ci-log-processing analytics pipeline.

The reference (studied read-only at /root/reference) is a per-row
Python pipeline: logscraper polls the Zuul CI REST API for finished
builds and materializes their log files; logsender parses every log
line (timestamp cascade, message split), enriches with build
metadata, routes lines to per-purpose OpenSearch indices, and
bulk-sends them (logscraper/logsender.py).

This package re-expresses the same semantics Spark-first over a
table of multi-turn conversation/agent transcripts
(conv_id, turn_idx, role, text, tool, ts):

  parse  — vectorized timestamp cascade + severity/subsystem grok
           (reference: logsender.py:332-372) as Arrow pandas UDFs
           and as pure Catalyst column expressions;
  enrich — broadcast-lookup maps (reference: get_file_info,
           logsender.py:375-381, makeFields 252-285);
  route  — disjoint multi-sink fan-out (reference: send_to_es
           routing, logsender.py:467-495);
  aggregate — per-sink grouped counts over time windows
           (reference: Monitoring.parse_metrics,
           logscraper.py:295-304).

Everything relational stays in the DataFrame API so Catalyst can
push filters, prune columns, and pick join strategies; the only
Python in the hot path is Arrow-vectorized pandas UDFs.
"""

__version__ = "0.1.0"
