"""Structured JSON logging (operator S33 in SURVEY.md section 2.1).

The reference logs through slog's JSON handler with key-value context on
every message (cmd/duckdb-record-processor/main.go:27;
cmd/parquetgo-record-processor/handler.go:106,116,148). Python analog: a
logging.Formatter emitting one JSON object per line, with ``extra={...}``
kwargs surfaced as top-level keys.
"""

from __future__ import annotations

import json
import logging
import sys
import time
from typing import IO

_RESERVED = set(
    logging.LogRecord(
        "", logging.INFO, "", 0, "", None, None
    ).__dict__
) | {"message", "asctime", "taskName"}


class JsonFormatter(logging.Formatter):
    def format(self, record: logging.LogRecord) -> str:
        out = {
            "time": time.strftime(
                "%Y-%m-%dT%H:%M:%S", time.gmtime(record.created)
            ),
            "level": record.levelname,
            "msg": record.getMessage(),
        }
        for key, value in record.__dict__.items():
            if key not in _RESERVED and not key.startswith("_"):
                try:
                    json.dumps(value)
                    out[key] = value
                except TypeError:
                    out[key] = repr(value)
        if record.exc_info:
            out["error"] = self.formatException(record.exc_info)
        return json.dumps(out)


def json_logger(
    name: str, level: int = logging.INFO, stream: IO[str] | None = None
) -> logging.Logger:
    """A logger writing one JSON object per line (slog.NewJSONHandler
    analog). Reuses the handler if already configured."""
    logger = logging.getLogger(name)
    logger.setLevel(level)
    if not any(
        isinstance(h.formatter, JsonFormatter) for h in logger.handlers
    ):
        handler = logging.StreamHandler(stream or sys.stderr)
        handler.setFormatter(JsonFormatter())
        logger.addHandler(handler)
        logger.propagate = False
    return logger
