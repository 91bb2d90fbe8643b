from .timestamps import (  # noqa: F401
    TIMESTAMP_PATTERNS,
    parse_timestamp_py,
    ts_cascade_col,
)
from .message import message_col, get_message_py  # noqa: F401
from .grok import (  # noqa: F401
    SEVERITIES,
    severity_col,
    subsystem_col,
    make_grok_udf,
)
