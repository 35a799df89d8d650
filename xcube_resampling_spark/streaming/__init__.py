from .stateful import first_event_per_key
from .windows import sessionize, windowed_event_stats

__all__ = ["first_event_per_key", "sessionize", "windowed_event_stats"]
