"""Process-0 logger (ref: /root/reference/utils/logger.py).

In SPMD JAX, "rank 0" is jax.process_index() == 0; other processes get a
null logger, matching the reference's master-only logging behavior.
"""

from __future__ import annotations

import logging
import os

import jax


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
