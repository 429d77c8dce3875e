"""Logging setup (analog of reference rtp_llm/config/log_config.py)."""

from __future__ import annotations

import logging
import os
import sys

_FORMAT = "[%(asctime)s.%(msecs)03d][%(levelname)s][%(name)s] %(message)s"
_DATEFMT = "%Y-%m-%d %H:%M:%S"
_configured = False


def init_logging(level: str | None = None) -> None:
    global _configured
    if _configured:
        return
    level = level or os.environ.get("RTP_LOG_LEVEL", "INFO")
    logging.basicConfig(
        level=getattr(logging, level.upper(), logging.INFO),
        format=_FORMAT,
        datefmt=_DATEFMT,
        stream=sys.stderr,
    )
    _configured = True


def get_logger(name: str) -> logging.Logger:
    init_logging()
    return logging.getLogger(name)
