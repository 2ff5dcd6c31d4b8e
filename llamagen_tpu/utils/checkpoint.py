"""Checkpoint save/restore built on orbax.

Replaces the reference's torch.save dict checkpoints
(`/root/reference/autoregressive/train/train_c2i.py:227-250`,
`tokenizer_image/vq_train.py:238-263`) with orbax PyTree checkpoints:
sharded, async-friendly, resumable on a different mesh shape (unlike the
reference FSDP resume which asserts equal world size,
train_c2i_fsdp.py:193-201 — orbax reshards on restore).
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


def save(path: str, tree: Any, *, force: bool = True) -> None:
    """Save a pytree (train state / params) to `path` (a directory)."""
    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, tree, force=force)


def restore(path: str, template: Any) -> Any:
    """Restore into the sharding/structure of `template`.

    `template` may be a pytree of jax.ShapeDtypeStruct with shardings (for
    sharded restore onto a new mesh) or concrete arrays.
    """
    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(path, template)


def save_step(ckpt_dir: str, step: int, tree: Any) -> str:
    path = os.path.join(ckpt_dir, f"step_{step:08d}")
    save(path, tree)
    return path


def latest_step(ckpt_dir: str) -> Optional[int]:
    if not os.path.isdir(ckpt_dir):
        return None
    steps = []
    for name in os.listdir(ckpt_dir):
        if name.startswith("step_"):
            try:
                steps.append(int(name[len("step_"):]))
            except ValueError:
                pass
    return max(steps) if steps else None


def restore_latest(ckpt_dir: str, template: Any):
    step = latest_step(ckpt_dir)
    if step is None:
        return None, None
    return step, restore(os.path.join(ckpt_dir, f"step_{step:08d}"), template)


def as_abstract(tree: Any) -> Any:
    """Concrete pytree -> ShapeDtypeStruct template (keeps shardings)."""
    def to_abstract(x):
        if hasattr(x, "sharding"):
            return jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=x.sharding)
        arr = np.asarray(x)
        return jax.ShapeDtypeStruct(arr.shape, arr.dtype)
    return jax.tree.map(to_abstract, tree)
