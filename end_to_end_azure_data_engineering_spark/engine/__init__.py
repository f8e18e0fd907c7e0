from .session import get_spark, stop_spark
from .clock import Clock, FixedClock, SystemClock
from .pin import pin

__all__ = ["get_spark", "stop_spark", "Clock", "FixedClock", "SystemClock", "pin"]
