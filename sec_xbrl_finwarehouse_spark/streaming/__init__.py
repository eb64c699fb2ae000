from .dedup_ingest import foreach_batch_dedup_ingest  # noqa: F401
from .events_stream import (  # noqa: F401
    sessionize_stream,
    stream_events,
    user_running_totals,
    windowed_counts,
)
