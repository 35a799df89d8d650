from .windows import sessionize, windowed_event_stats

__all__ = ["sessionize", "windowed_event_stats"]
