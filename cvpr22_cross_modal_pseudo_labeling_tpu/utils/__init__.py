from .logger import get_logger, setup_logger
from .metric_logger import MetricLogger, SmoothedValue, Timer
