from .logging import setup_logging, StageTimers, fmt_duration
