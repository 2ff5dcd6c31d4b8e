"""Process-0 logger (ref: /root/reference/utils/logger.py).

In SPMD JAX, "rank 0" is jax.process_index() == 0; other processes get a
null logger, matching the reference's master-only logging behavior.
"""

from __future__ import annotations

import logging
import os

import jax


def create_experiment_dir(results_dir: str, model_name: str) -> str:
    """Auto-numbered experiment subdir `{index:03d}-{model}` (ref:
    train_c2i.py:71-84). Only process 0 creates; others discover the
    latest index (single-host callers just get the new dir)."""
    os.makedirs(results_dir, exist_ok=True)
    safe = model_name.replace("/", "-")
    existing = [d for d in os.listdir(results_dir)
                if os.path.isdir(os.path.join(results_dir, d))
                and d[:3].isdigit()]
    if jax.process_index() == 0:
        index = 1 + max((int(d[:3]) for d in existing), default=-1)
        exp = os.path.join(results_dir, f"{index:03d}-{safe}")
        os.makedirs(exp, exist_ok=True)
    else:
        index = max((int(d[:3]) for d in existing), default=0)
        exp = os.path.join(results_dir, f"{index:03d}-{safe}")
    return exp


def create_logger(logging_dir: str = None, name: str = "llamagen_tpu"
                  ) -> logging.Logger:
    logger = logging.getLogger(name)
    logger.handlers.clear()
    if jax.process_index() == 0:
        logger.setLevel(logging.INFO)
        fmt = logging.Formatter(
            "[%(asctime)s] %(message)s", datefmt="%Y-%m-%d %H:%M:%S")
        sh = logging.StreamHandler()
        sh.setFormatter(fmt)
        logger.addHandler(sh)
        if logging_dir is not None:
            os.makedirs(logging_dir, exist_ok=True)
            fh = logging.FileHandler(os.path.join(logging_dir, "log.txt"))
            fh.setFormatter(fmt)
            logger.addHandler(fh)
    else:
        logger.addHandler(logging.NullHandler())
    return logger
