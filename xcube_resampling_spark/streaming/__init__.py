from .stateful import dedup_stream, first_event_per_key
from .windows import (
    sessionize,
    streaming_cube_rollup,
    windowed_event_stats,
)

__all__ = ["dedup_stream", "first_event_per_key", "sessionize",
           "streaming_cube_rollup", "windowed_event_stats"]
