"""Logging setup (reference utils/logger.py:7): per-process python
logging with optional file output; only process 0 logs to console by
default."""

import logging
import os
import sys
from typing import Optional


def setup_logger(
    name: str = "cmpl_tpu",
    save_dir: Optional[str] = None,
    process_index: int = 0,
    filename: str = "log.txt",
) -> logging.Logger:
    logger = logging.getLogger(name)
    logger.setLevel(logging.DEBUG)
    logger.propagate = False
    fmt = logging.Formatter(
        "%(asctime)s %(name)s %(levelname)s: %(message)s"
    )
    # idempotent per handler KIND, not all-or-nothing: a later call
    # that first learns save_dir must still attach the FileHandler
    # (an early `if logger.handlers: return` silently dropped it)
    has_stream = any(
        type(h) is logging.StreamHandler for h in logger.handlers
    )
    has_file = any(
        isinstance(h, logging.FileHandler) for h in logger.handlers
    )
    if process_index == 0 and not has_stream:
        ch = logging.StreamHandler(sys.stdout)
        ch.setLevel(logging.DEBUG)
        ch.setFormatter(fmt)
        logger.addHandler(ch)
    if save_dir and not has_file:
        os.makedirs(save_dir, exist_ok=True)
        fh = logging.FileHandler(
            os.path.join(save_dir, f"{filename}.rank{process_index}")
        )
        fh.setLevel(logging.DEBUG)
        fh.setFormatter(fmt)
        logger.addHandler(fh)
    if not logger.handlers:
        logger.addHandler(logging.NullHandler())
    return logger


def get_logger(suffix: str = "") -> logging.Logger:
    name = "cmpl_tpu" + (f".{suffix}" if suffix else "")
    return logging.getLogger(name)
