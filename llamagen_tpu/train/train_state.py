"""Optimizer / train-state plumbing shared by the GPT and VQ trainers.

Equivalent surface to the reference's optimizer setup
(`/root/reference/autoregressive/train/train_c2i.py:28-50`: AdamW with
weight-decay applied only to matrices, fused impl) — here optax.adamw with
a name-based decay mask (norm scales and biases excluded; the reference
FSDP trainer uses the same name-based split, train_c2i_fsdp.py:77-86),
XLA-fused for free.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax


class TrainState(NamedTuple):
    step: jnp.ndarray
    params: Any
    opt_state: Any
    ema_params: Optional[Any] = None


def _no_decay(path) -> bool:
    keys = [getattr(p, "key", getattr(p, "name", str(p))) for p in path]
    joined = "/".join(str(k) for k in keys)
    return ("norm" in joined) or joined.endswith("bias") or ("scale" in joined)


def decay_mask(params):
    """True where weight decay applies (matrices; not norms/biases)."""
    return jax.tree_util.tree_map_with_path(
        lambda path, _: not _no_decay(path), params)


def make_optimizer(lr: float = 1e-4, weight_decay: float = 5e-2,
                   beta1: float = 0.9, beta2: float = 0.95,
                   max_grad_norm: float = 1.0,
                   warmup_steps: int = 0) -> optax.GradientTransformation:
    """AdamW + global-norm clipping (ref: train_c2i.py:46-48,197-199)."""
    if warmup_steps > 0:
        schedule = optax.linear_schedule(0.0, lr, warmup_steps)
    else:
        schedule = lr
    tx = optax.chain(
        optax.clip_by_global_norm(max_grad_norm),
        optax.adamw(schedule, b1=beta1, b2=beta2,
                    weight_decay=weight_decay, mask=decay_mask),
    )
    return tx


def init_train_state(params, tx: optax.GradientTransformation,
                     use_ema: bool = False) -> TrainState:
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=tx.init(params),
        ema_params=jax.tree.map(jnp.copy, params) if use_ema else None,
    )


def ema_update(ema_params, params, decay: float = 0.9999):
    """Polyak averaging (ref: utils/ema.py:5-14)."""
    return jax.tree.map(
        lambda e, p: e * decay + p.astype(e.dtype) * (1.0 - decay),
        ema_params, params)


def as_dropout_key(rng):
    """Re-wrap a PRNG key as an `rbg` key for dropout-mask generation.

    The training step draws ~1.3G random bits per GPT-B batch-256 step
    (token/resid/ffn dropout masks over [B, S, D] x 25 instances,
    generated TWICE under remat). With the default threefry2x32 that is
    the largest non-attention item of the step (+0.112 s of 0.666,
    tests/bench_train_anatomy.py); `rbg` uses the TPU's hardware RNG
    instructions. Dropout needs no counter-based reproducibility
    guarantees across jax versions/backends — same-run determinism
    (same key -> same mask) is preserved.
    """
    data = rng if rng.dtype == jnp.uint32 else jax.random.key_data(rng)
    data = data.reshape(-1)[:2]
    return jax.random.wrap_key_data(
        jnp.concatenate([data, data]), impl="rbg")
