from .windows import stream_events, tumbling_counts, sliding_counts
from .sessions import session_aggregate
from .stateful import running_user_totals
from .ingest import ingest_viewing_logs
from .joins import view_click_conversions
from .dedup import dedup_stream_exact, dedup_stream_within_watermark
from .cdc import apply_cdc_stream, latest_snapshot
from .sketch import (
    sketch_registers,
    estimate_from_registers,
    quantile_sketch_bins,
)

__all__ = [
    "apply_cdc_stream",
    "latest_snapshot",
    "dedup_stream_exact",
    "dedup_stream_within_watermark",
    "view_click_conversions",
    "stream_events",
    "tumbling_counts",
    "sliding_counts",
    "session_aggregate",
    "running_user_totals",
    "ingest_viewing_logs",
    "sketch_registers",
    "quantile_sketch_bins",
    "estimate_from_registers",
]
