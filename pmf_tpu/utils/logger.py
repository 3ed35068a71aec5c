"""Process-0-only logging utilities.

Parity: pc_processor/utils/utils.py:46-72 (master-only logger patch).
In JAX multi-host, ``jax.process_index() == 0`` is the master; on a single
host this is always true.
"""
from __future__ import annotations

import logging
import os
import sys


def is_main_process() -> bool:
    try:
        import jax

        return jax.process_index() == 0
    except Exception:
        return True


def make_logger(name: str = "pmf_tpu", log_file: str | None = None,
                main_only: bool = True) -> logging.Logger:
    """File+console logger; non-master processes get a silent logger."""
    logger = logging.getLogger(name)
    logger.setLevel(logging.INFO)
    logger.handlers.clear()
    logger.propagate = False

    if main_only and not is_main_process():
        logger.addHandler(logging.NullHandler())
        return logger

    fmt = logging.Formatter("%(asctime)s %(levelname)s: %(message)s", "%Y-%m-%d %H:%M:%S")
    ch = logging.StreamHandler(sys.stdout)
    ch.setFormatter(fmt)
    logger.addHandler(ch)
    if log_file is not None:
        os.makedirs(os.path.dirname(os.path.abspath(log_file)), exist_ok=True)
        fh = logging.FileHandler(log_file)
        fh.setFormatter(fmt)
        logger.addHandler(fh)
    return logger
