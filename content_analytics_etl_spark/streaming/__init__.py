from .windows import stream_events, tumbling_counts, sliding_counts
from .sessions import session_aggregate
from .stateful import running_user_totals

__all__ = [
    "stream_events",
    "tumbling_counts",
    "sliding_counts",
    "session_aggregate",
    "running_user_totals",
]
