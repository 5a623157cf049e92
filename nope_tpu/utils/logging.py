"""Logging configuration (``/root/reference/src/utils/logging.py`` +
the Hydra job_logging presets, minus Hydra)."""

from __future__ import annotations

import logging
import sys
from typing import Iterable


class LevelsFilter(logging.Filter):
    """Keep only the named levels (used to split INFO/ERROR streams)."""

    def __init__(self, levels: Iterable[str]):
        super().__init__()
        self.levels = [getattr(logging, level) for level in levels]

    def filter(self, record):
        return record.levelno in self.levels


class StreamToLogger:
    """File-like object redirecting writes to a logger."""

    def __init__(self, logger: logging.Logger, level: int):
        self.logger = logger
        self.level = level

    def write(self, buf):
        for line in buf.rstrip().splitlines():
            self.logger.log(self.level, line.rstrip())

    def flush(self):
        pass


class TqdmLoggingHandler(logging.Handler):
    """tqdm-safe log handler."""

    def emit(self, record):
        try:
            import tqdm

            tqdm.tqdm.write(self.format(record))
            self.flush()
        except Exception:
            self.handleError(record)


def configure(level: int = logging.INFO, log_file: str | None = None) -> None:
    handlers: list[logging.Handler] = [logging.StreamHandler(sys.stdout)]
    if log_file:
        handlers.append(logging.FileHandler(log_file))
    logging.basicConfig(
        level=level,
        format="[%(asctime)s][%(name)s][%(levelname)s] %(message)s",
        handlers=handlers,
        force=True,
    )
