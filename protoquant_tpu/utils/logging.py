"""Structured logging (SURVEY.md §5.5): std logging with an optional JSON
formatter; engine counters are surfaced via Engine.metrics()."""

from __future__ import annotations

import json
import logging
import sys


class JsonFormatter(logging.Formatter):
    def format(self, record):
        out = {
            "ts": self.formatTime(record),
            "level": record.levelname,
            "logger": record.name,
            "msg": record.getMessage(),
        }
        if record.exc_info:
            out["exc"] = self.formatException(record.exc_info)
        extra = getattr(record, "metrics", None)
        if extra:
            out["metrics"] = extra
        return json.dumps(out)


def get_logger(name: str = "protoquant_tpu", json_format: bool = False,
               level: int = logging.INFO) -> logging.Logger:
    logger = logging.getLogger(name)
    if not logger.handlers:
        h = logging.StreamHandler(sys.stderr)
        h.setFormatter(
            JsonFormatter()
            if json_format
            else logging.Formatter("%(asctime)s %(levelname)s %(name)s: %(message)s")
        )
        logger.addHandler(h)
        logger.setLevel(level)
    return logger
