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
    if logger.handlers:
        return logger
    fmt = logging.Formatter(
        "%(asctime)s %(name)s %(levelname)s: %(message)s"
    )
    if process_index == 0:
        ch = logging.StreamHandler(sys.stdout)
        ch.setLevel(logging.DEBUG)
        ch.setFormatter(fmt)
        logger.addHandler(ch)
    if save_dir:
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
