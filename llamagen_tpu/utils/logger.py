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
    train_c2i.py:71-84). Process 0 picks the index and creates the dir;
    other processes receive the index via an on-device broadcast — a
    directory listing on their side would race process 0's mkdir (and
    non-shared filesystems would never see it), scattering one run's
    logs/checkpoints over different experiment dirs. Same mechanism as
    the reference's timestamp broadcast (train_c2i_fsdp.py:122-131)."""
    os.makedirs(results_dir, exist_ok=True)
    safe = model_name.replace("/", "-")
    if jax.process_index() == 0:
        existing = [d for d in os.listdir(results_dir)
                    if os.path.isdir(os.path.join(results_dir, d))
                    and d[:3].isdigit()]
        index = 1 + max((int(d[:3]) for d in existing), default=-1)
    else:
        index = 0
    if jax.process_count() > 1:
        import numpy as np
        from jax.experimental import multihost_utils

        index = int(multihost_utils.broadcast_one_to_all(
            np.int32(index)))
    exp = os.path.join(results_dir, f"{index:03d}-{safe}")
    if jax.process_index() == 0:
        os.makedirs(exp, exist_ok=True)
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
