from .tables import load_table, register_views  # noqa: F401
from .transcripts import (  # noqa: F401
    transcripts_sql,
    load_transcripts,
)
