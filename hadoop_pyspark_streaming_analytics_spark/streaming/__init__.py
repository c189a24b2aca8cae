from .queries import running_sensor_stats, sliding_window_max, tumbling_window_stats

__all__ = ["running_sensor_stats", "tumbling_window_stats", "sliding_window_max"]
