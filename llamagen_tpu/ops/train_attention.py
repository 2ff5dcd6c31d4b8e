"""Layout-native training attention kernel: [B, S, H, D] in, causal,
scores never touch HBM.

The training step's dominant cost is the einsum SDPA's [B, H, S, S]
score buffer (BENCH.md: 18.4 ms/layer fwd+bwd f32, 11.0 ms bf16 at
batch 256 / seq 257). A stock flash-attention pallas kernel measured
WORSE (40 ms/layer): it wants [B, H, S, D] operands, and transposing
three 300 MB activations per layer costs more than the score traffic it
saves. LlamaGen's training geometry is short-sequence/huge-batch
(S = 257 or 577 tokens, B up to 256) — so the TPU-native design is not
flash's running-softmax over K blocks but a simpler fact: ONE (batch,
head) pair's full score matrix is a [S, S] f32 tile (257² × 4 B =
264 KB) that fits in VMEM outright. The kernel grids over (B, H),
reads q/k/v blocks straight from the [B, S, H, D] layout (no transpose
— BlockSpec index maps do the gather), computes scores, causal mask,
softmax, and the output tile entirely in VMEM, and writes [S, D] back.
HBM traffic is exactly q+k+v+o. Softmax runs in f32 (the scores exist
only in VMEM, so there is no bf16-materialization tradeoff left — this
is strictly MORE precise than the einsum path's bf16 score buffer).

Backward is the same structure (recompute scores from q/k in VMEM,
then dv = pᵀ·do, dp = do·vᵀ, ds = p∘(dp − rowsum(dp∘p)), dq = ds·k,
dk = dsᵀ·q), wired through jax.custom_vjp.

Replaces `F.scaled_dot_product_attention`
(`/root/reference/autoregressive/models/gpt.py:232`) on the training
path; the decode path keeps its own streaming kernel (ops/attention.py).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e30  # python float: a jnp scalar would be a captured constant


def _causal(s: int):
    r = jax.lax.broadcasted_iota(jnp.int32, (s, s), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (s, s), 1)
    return r >= c


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float):
    # refs: [1, S, 1, D] blocks of the [B, S, H, D] operands
    q = q_ref[0, :, 0, :]
    k = k_ref[0, :, 0, :]
    v = v_ref[0, :, 0, :]
    s = q.shape[0]
    scores = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale  # [S, S]
    scores = jnp.where(_causal(s), scores, NEG)
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    p = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(q.dtype)
    o_ref[0, :, 0, :] = jnp.dot(p, v,
                                preferred_element_type=jnp.float32
                                ).astype(o_ref.dtype)


def _bwd_kernel(q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref, dv_ref,
                *, scale: float):
    q = q_ref[0, :, 0, :]
    k = k_ref[0, :, 0, :]
    v = v_ref[0, :, 0, :]
    do = do_ref[0, :, 0, :]
    s = q.shape[0]
    scores = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale
    scores = jnp.where(_causal(s), scores, NEG)
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    p32 = e / jnp.sum(e, axis=-1, keepdims=True)          # [S, S] f32
    p = p32.astype(q.dtype)
    # dv = pᵀ · do
    dv_ref[0, :, 0, :] = jax.lax.dot_general(
        p, do, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dv_ref.dtype)
    # dp = do · vᵀ ; softmax backward
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)               # [S, S] f32
    ds = (p32 * (dp - jnp.sum(dp * p32, axis=-1, keepdims=True))
          ).astype(q.dtype)
    dq_ref[0, :, 0, :] = (jnp.dot(
        ds, k, preferred_element_type=jnp.float32) * scale
    ).astype(dq_ref.dtype)
    dk_ref[0, :, 0, :] = (jax.lax.dot_general(
        ds, q, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) * scale).astype(dk_ref.dtype)


def _specs(b, s, h, d):
    blk = pl.BlockSpec((1, s, 1, d), lambda bi, hi: (bi, 0, hi, 0))
    return blk


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def causal_attention_bshd(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                          scale: float,
                          interpret: Optional[bool] = None) -> jnp.ndarray:
    """Causal SDPA on [B, S, H, D] (no transposes, VMEM-resident scores).

    Numerics: f32 scores + f32 softmax (more precise than the einsum
    path's bf16 score materialization; parity-tested against the f32
    einsum reference). MHA only (kv repeat happens before the call for
    GQA — no zoo model uses GQA)."""
    return _fwd(q, k, v, scale, interpret)[0]


def _resolve_interp(interpret):
    if interpret is None:
        return jax.default_backend() != "tpu"
    return interpret


def _fwd(q, k, v, scale, interpret):
    b, s, h, d = q.shape
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale),
        grid=(b, h),
        in_specs=[_specs(b, s, h, d)] * 3,
        out_specs=_specs(b, s, h, d),
        out_shape=jax.ShapeDtypeStruct((b, s, h, d), q.dtype),
        interpret=_resolve_interp(interpret),
    )(q, k, v)
    return out, (q, k, v)


def _bwd(scale, interpret, res, do):
    q, k, v = res
    b, s, h, d = q.shape
    blk = _specs(b, s, h, d)
    shp = jax.ShapeDtypeStruct((b, s, h, d), q.dtype)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_kernel, scale=scale),
        grid=(b, h),
        in_specs=[blk] * 4,
        out_specs=[blk] * 3,
        out_shape=[shp] * 3,
        interpret=_resolve_interp(interpret),
    )(q, k, v, do)
    return dq, dk, dv


causal_attention_bshd.defvjp(_fwd, _bwd)
