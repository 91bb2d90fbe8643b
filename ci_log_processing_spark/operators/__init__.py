from .ffill import with_filled_ts, with_prior_ts_count  # noqa: F401
from .enrich import (  # noqa: F401
    ROLE_PIPELINE,
    TOOL_CATEGORY,
    with_enrichment,
)
from .route import SINKS, with_sink  # noqa: F401
from .aggregate import sink_counts, hourly_agg  # noqa: F401
