"""Env-filtered logging (parity with the reference's tracing setup:
cli/src/logging.rs — EnvFilter default `info`, --quiet → error-only to
stderr).

    from dsocr_tpu.utils.logging import init_logging, get_logger
    init_logging()           # respects DSOCR_LOG (debug|info|warning|error)
    log = get_logger("dsocr.server")
"""

from __future__ import annotations

import logging
import os
import sys

_INITIALIZED = False


def init_logging(quiet: bool = False) -> None:
    global _INITIALIZED
    level_name = "error" if quiet else os.environ.get("DSOCR_LOG", "info")
    level = getattr(logging, level_name.upper(), logging.INFO)
    root = logging.getLogger("dsocr")
    if not _INITIALIZED:
        handler = logging.StreamHandler(sys.stderr)
        handler.setFormatter(
            logging.Formatter(
                "%(asctime)s %(levelname).1s %(name)s: %(message)s",
                datefmt="%H:%M:%S",
            )
        )
        root.addHandler(handler)
        root.propagate = False
        _INITIALIZED = True
    root.setLevel(level)


def get_logger(name: str = "dsocr") -> logging.Logger:
    return logging.getLogger(name)
