"""Structured logging, parity for the reference's singleton logger
(`stream_cdc/utils/logger.py:1-82`: env-configured level via LOG_LEVEL,
app name via APP_NAME, one consistent format).

Differences are Spark-shaped rather than cosmetic:
  - loggers are configured per *process*: the driver and every Python
    worker (UDF/mapInPandas) get their own handler on first use — there is
    no cross-process singleton to share, so the function is idempotent per
    interpreter instead of guarding a class-level instance;
  - an optional JSON line format (`LOG_FORMAT=json`) so driver logs can be
    shipped next to Spark's own structured event logs and joined on
    timestamp during incident analysis.
"""

from __future__ import annotations

import json
import logging
import os
import time


class JsonFormatter(logging.Formatter):
    def format(self, record: logging.LogRecord) -> str:
        out = {
            "ts": round(time.time(), 3),
            "level": record.levelname,
            "logger": record.name,
            "msg": record.getMessage(),
        }
        if record.exc_info and record.exc_info[0] is not None:
            out["exc"] = repr(record.exc_info[1])
        return json.dumps(out, separators=(",", ":"))


_TEXT_FORMAT = "%(asctime)s [%(levelname)s] %(name)s: %(message)s"


def get_logger(name: str | None = None, level: str | None = None) -> logging.Logger:
    """Idempotent per-process logger, env-configured like the reference:
    APP_NAME names it, LOG_LEVEL sets the level, LOG_FORMAT=json switches
    to JSON lines. Repeated calls return the same configured logger."""
    logger = logging.getLogger(name or os.getenv("APP_NAME", "stream-cdc-spark"))
    resolved = (level or os.getenv("LOG_LEVEL", "INFO")).upper()
    logger.setLevel(getattr(logging, resolved, logging.INFO))
    if not logger.handlers:
        handler = logging.StreamHandler()
        if os.getenv("LOG_FORMAT", "").lower() == "json":
            handler.setFormatter(JsonFormatter())
        else:
            handler.setFormatter(logging.Formatter(_TEXT_FORMAT))
        logger.addHandler(handler)
        logger.propagate = False
    return logger
