"""Text-conditional GPT training step.

Equivalent of `/root/reference/autoregressive/train/train_t2i.py`: trains on
images + precomputed T5 caption features, with ONLINE VQ tokenization of the
images inside the step (ref :154-158 — the c2i path uses offline codes, the
t2i path encodes on the fly), per-sample caption masks, and a `valid` mask
that zeroes the loss of corrupt samples (ref :164, gpt.py:375-378).

TPU-first: the frozen VQ encoder runs inside the same jit as the GPT
forward/backward — XLA overlaps the conv encode with the transformer.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from llamagen_tpu.config import GPTConfig, VQConfig
from llamagen_tpu.models import gpt, vq
from llamagen_tpu.train.train_state import TrainState, ema_update


class T2IBatch(NamedTuple):
    images: jnp.ndarray        # [B, H, W, 3] in [-1, 1]
    captions: jnp.ndarray      # [B, T, caption_dim] T5 features (left-padded)
    emb_masks: jnp.ndarray     # [B, T] 1=valid caption token
    valid: Optional[jnp.ndarray] = None  # [B] 1=good sample


def t2i_loss_fn(gpt_params, vq_params, gpt_cfg: GPTConfig, vq_cfg: VQConfig,
                batch: T2IBatch, rng, compute_dtype=jnp.bfloat16,
                remat=True):
    # online VQ tokenization (frozen tokenizer — stop_gradient)
    _, _, idx = vq.encode(jax.lax.stop_gradient(vq_params),
                          batch.images.astype(compute_dtype), vq_cfg)
    tokens = jax.lax.stop_gradient(idx.reshape(idx.shape[0], -1))

    # caption mask folds into the training attention mask via embedding
    # zeroing (the reference left-pads and zeroes embeddings upstream;
    # here the mask multiplies the caption features directly)
    captions = batch.captions * batch.emb_masks[..., None].astype(
        batch.captions.dtype)

    _, loss = gpt.forward_train(
        gpt_params, gpt_cfg, captions, tokens[:, :-1], targets=tokens,
        valid=batch.valid, rng=rng, train=True,
        compute_dtype=compute_dtype, remat=remat)
    return loss


def make_t2i_train_step(gpt_cfg: GPTConfig, vq_cfg: VQConfig,
                        tx: optax.GradientTransformation, vq_params,
                        ema_decay: Optional[float] = 0.9999,
                        compute_dtype=jnp.bfloat16, remat=True):
    """The frozen ~72M-param VQ tree travels as a runtime ARGUMENT of the
    jitted step (bound once in the returned wrapper), not a closure
    constant — captured arrays embed as HLO constants in the compile
    payload (train/vq.py passes its 4x-smaller LPIPS tree the same way
    for the same reason)."""

    def train_step(state: TrainState, batch: T2IBatch, rng, vq_p):
        from llamagen_tpu.train.train_state import as_dropout_key
        # rbg keys: hardware-RNG dropout masks (train_state.as_dropout_key)
        rng = jax.random.fold_in(as_dropout_key(rng), state.step)
        loss, grads = jax.value_and_grad(t2i_loss_fn)(
            state.params, vq_p, gpt_cfg, vq_cfg, batch, rng,
            compute_dtype, remat)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        ema = state.ema_params
        if ema is not None and ema_decay is not None:
            ema = ema_update(ema, params, ema_decay)
        return TrainState(step=state.step + 1, params=params,
                          opt_state=opt_state, ema_params=ema), {
            "loss": loss, "grad_norm": optax.global_norm(grads)}

    jfn = jax.jit(train_step, donate_argnums=(0,))
    vq_p = jax.tree.map(jnp.asarray, vq_params)

    def step(state, batch, rng):
        return jfn(state, batch, rng, vq_p)

    return step


def build_trainer(gpt_cfg: GPTConfig, vq_cfg: VQConfig, vq_params, mesh, *,
                  lr: float = 1e-4, weight_decay: float = 5e-2,
                  beta1: float = 0.9, beta2: float = 0.95,
                  max_grad_norm: float = 1.0, warmup_steps: int = 0,
                  use_ema: bool = True, ema_decay: float = 0.9999,
                  seed: int = 0, param_dtype=jnp.float32,
                  compute_dtype=jnp.bfloat16, remat=True):
    """Mesh-sharded t2i trainer (same DP/FSDP/TP semantics as train.c2i;
    the frozen VQ encoder is replicated). Ref driver:
    autoregressive/train/train_t2i.py:154-164."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from llamagen_tpu.train.c2i import init_sharded_gpt_state
    from llamagen_tpu.train.train_state import make_optimizer

    tx = make_optimizer(lr, weight_decay, beta1, beta2, max_grad_norm,
                        warmup_steps)
    vq_params = jax.device_put(
        vq_params, jax.tree.map(lambda _: NamedSharding(mesh, P()),
                                vq_params))
    state = init_sharded_gpt_state(gpt_cfg, tx, mesh, use_ema=use_ema,
                                   seed=seed, param_dtype=param_dtype)
    step_fn = make_t2i_train_step(gpt_cfg, vq_cfg, tx, vq_params,
                                  ema_decay if use_ema else None,
                                  compute_dtype, remat)
    return state, step_fn


def shard_batch(batch: T2IBatch, mesh) -> T2IBatch:
    """Split the batch across (dp, fsdp) — see parallel.mesh.put_batch."""
    from llamagen_tpu.parallel.mesh import put_batch

    return put_batch(batch, mesh)
