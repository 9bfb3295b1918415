from .registry import Registry
from .logger import setup_logger
from .metrics import SmoothedValue, MetricLogger
from .timer import Timer

__all__ = ["Registry", "setup_logger", "SmoothedValue", "MetricLogger", "Timer"]
