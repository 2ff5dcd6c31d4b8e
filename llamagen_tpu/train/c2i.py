"""Class-conditional GPT training step (DP / FSDP via mesh sharding).

Replaces the reference's DDP/FSDP trainers
(`/root/reference/autoregressive/train/train_c2i.py` hot loop :184-250 and
`train_c2i_fsdp.py`) with a single pjit-sharded step: gradients are
reduced and parameters gathered by XLA from the sharding annotations —
dp axis = DDP, fsdp axis = FULL_SHARD, both at once = HSDP.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from llamagen_tpu.config import GPTConfig
from llamagen_tpu.models import gpt
from llamagen_tpu.parallel import partition
from llamagen_tpu.train.train_state import (TrainState, as_dropout_key,
                                             ema_update,
                                            init_train_state, make_optimizer)


class Batch(NamedTuple):
    """One training batch of pre-extracted codes (ref: dataset/imagenet.py)."""
    labels: jnp.ndarray   # [B] int32 class ids (c2i) or [B,T,cap_dim] (t2i)
    tokens: jnp.ndarray   # [B, block_size] int32 code ids
    valid: Optional[jnp.ndarray] = None  # [B] f32, t2i bad-sample mask


def loss_fn(params, cfg: GPTConfig, batch: Batch, rng,
            compute_dtype=jnp.bfloat16, remat=True):
    """Teacher-forced CE over the code grid (ref: gpt.py:370-381)."""
    _, loss = gpt.forward_train(
        params, cfg, batch.labels, batch.tokens[:, :-1],
        targets=batch.tokens, valid=batch.valid, rng=rng, train=True,
        compute_dtype=compute_dtype, remat=remat)
    return loss


def make_train_step(cfg: GPTConfig, tx: optax.GradientTransformation,
                    ema_decay: Optional[float] = 0.9999,
                    compute_dtype=jnp.bfloat16, remat=True):
    """Build the jitted train step; sharding propagates from input placement."""

    def train_step(state: TrainState, batch: Batch, rng):
        # rbg keys: hardware-RNG dropout masks (train_state.as_dropout_key)
        rng = jax.random.fold_in(as_dropout_key(rng), state.step)
        loss, grads = jax.value_and_grad(loss_fn)(
            state.params, cfg, batch, rng, compute_dtype, remat)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        ema = state.ema_params
        if ema is not None and ema_decay is not None:
            ema = ema_update(ema, params, ema_decay)
        metrics = {"loss": loss, "grad_norm": optax.global_norm(grads)}
        return TrainState(step=state.step + 1, params=params,
                          opt_state=opt_state, ema_params=ema), metrics

    return jax.jit(train_step, donate_argnums=(0,))


def _opt_state_shardings(opt_abstract, params_abstract, param_sharding, mesh):
    """Adam moments get the param sharding; scalar leaves replicate."""
    flat_params = jax.tree_util.tree_flatten(params_abstract)[0]
    flat_spec = jax.tree_util.tree_flatten(
        param_sharding, is_leaf=lambda x: isinstance(x, NamedSharding))[0]
    shape_to_spec = {}
    for p, s in zip(flat_params, flat_spec):
        shape_to_spec.setdefault((p.shape, p.dtype), s)

    def map_leaf(leaf):
        return shape_to_spec.get((leaf.shape, leaf.dtype),
                                 NamedSharding(mesh, P()))

    return jax.tree.map(map_leaf, opt_abstract)


def init_sharded_gpt_state(cfg: GPTConfig, tx, mesh: Mesh, *,
                           use_ema: bool, seed: int,
                           param_dtype=jnp.float32) -> TrainState:
    """Initialize a GPT TrainState directly into its mesh shards.

    Parameters are initialized INTO their FSDP/TP shards (no host-side
    full materialization — matters for GPT-3B+); Adam moments take the
    param shardings, scalars replicate. Shared by the c2i and t2i
    trainers (they differ only in the step function)."""
    pspecs = partition.gpt_param_specs(cfg)
    param_sharding = jax.tree.map(lambda s: NamedSharding(mesh, s), pspecs,
                                  is_leaf=lambda x: isinstance(x, P))

    def init_fn(rng):
        params = gpt.init_params(rng, cfg, dtype=param_dtype)
        return init_train_state(params, tx, use_ema=use_ema)

    abstract = jax.eval_shape(init_fn, jax.random.PRNGKey(seed))
    out_shardings = TrainState(
        step=NamedSharding(mesh, P()),
        params=param_sharding,
        opt_state=_opt_state_shardings(abstract.opt_state, abstract.params,
                                       param_sharding, mesh),
        ema_params=param_sharding if use_ema else None,
    )
    return jax.jit(init_fn, out_shardings=out_shardings)(
        jax.random.PRNGKey(seed))


def build_trainer(cfg: GPTConfig, mesh: Mesh, *, lr: float = 1e-4,
                  weight_decay: float = 5e-2, beta1: float = 0.9,
                  beta2: float = 0.95, max_grad_norm: float = 1.0,
                  warmup_steps: int = 0, use_ema: bool = True,
                  ema_decay: float = 0.9999, seed: int = 0,
                  param_dtype=jnp.float32, compute_dtype=jnp.bfloat16,
                  remat=True):
    """Initialize a mesh-sharded train state and the jitted step function."""
    tx = make_optimizer(lr, weight_decay, beta1, beta2, max_grad_norm,
                        warmup_steps)
    state = init_sharded_gpt_state(cfg, tx, mesh, use_ema=use_ema,
                                   seed=seed, param_dtype=param_dtype)
    step_fn = make_train_step(cfg, tx, ema_decay if use_ema else None,
                              compute_dtype, remat)
    return state, step_fn


def shard_batch(batch: Batch, mesh: Mesh) -> Batch:
    """Split the batch across (dp, fsdp) — see parallel.mesh.put_batch
    (global batch single-process; per-host rows multi-host)."""
    from llamagen_tpu.parallel.mesh import put_batch

    return put_batch(batch, mesh)
