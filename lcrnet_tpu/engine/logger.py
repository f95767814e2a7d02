"""Logging (reference `utils/engine/logger.py:6-54`): console + file,
process-0 gated for multi-host runs."""

from __future__ import annotations

import logging
import os
import sys
from typing import Optional


def make_logger(log_file: Optional[str] = None, name: str = "lcrnet") -> logging.Logger:
    logger = logging.getLogger(name)
    if logger.handlers:
        return logger
    logger.setLevel(logging.DEBUG)
    try:
        import jax

        is_primary = jax.process_index() == 0
    except Exception:
        is_primary = True
    if is_primary:
        sh = logging.StreamHandler(sys.stdout)
        sh.setLevel(logging.INFO)
        sh.setFormatter(logging.Formatter("[%(asctime)s] [%(levelname)s] %(message)s"))
        logger.addHandler(sh)
        if log_file:
            os.makedirs(os.path.dirname(os.path.abspath(log_file)), exist_ok=True)
            fh = logging.FileHandler(log_file)
            fh.setLevel(logging.DEBUG)
            fh.setFormatter(logging.Formatter("[%(asctime)s] [%(levelname)s] %(message)s"))
            logger.addHandler(fh)
    else:
        logger.addHandler(logging.NullHandler())
    return logger
