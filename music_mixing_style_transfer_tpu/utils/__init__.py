from .logging import RTFMeter, Timer, get_logger

__all__ = ["get_logger", "Timer", "RTFMeter"]
