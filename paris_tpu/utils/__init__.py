from .logging import setup_logging, StageTimers, fmt_duration
from .profiling import trace, annotate, ThroughputMeter
