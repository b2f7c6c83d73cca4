from .windows import stream_events, tumbling_counts, sliding_counts
from .sessions import session_aggregate
from .stateful import running_user_totals
from .ingest import ingest_viewing_logs

__all__ = [
    "stream_events",
    "tumbling_counts",
    "sliding_counts",
    "session_aggregate",
    "running_user_totals",
    "ingest_viewing_logs",
]
