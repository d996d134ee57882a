from .logging import RTFMeter, Timer, get_logger
from .profiling import device_time, trace

__all__ = ["get_logger", "Timer", "RTFMeter", "device_time", "trace"]
