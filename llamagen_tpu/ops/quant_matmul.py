"""Pallas W8A16 dequant-matmul: int8 weights in HBM, bf16 MXU compute.

Decode-step weight matmuls are HBM-bandwidth-bound (BENCH.md: GPT-L reads
~670 MB of bf16 weights per token step at the ~490-530 GB/s chip floor; the
A100 baseline out-reads a single v5e at bf16). Storing weights int8 halves
the bytes; the dequant must happen in VMEM — a plain-XLA int8 cast was
measured unprofitable because XLA materializes the dequantized matrix in
HBM first.

This kernel streams [K, BN] int8 blocks (Pallas grid pipelining double-
buffers the DMA), converts to the activation dtype in VMEM, and runs the
MXU matmul; per-output-channel scales fold into the [B, BN] result tile
(O(B*N), not O(K*N)). Activations stay bf16 — weight rounding is the only
numerics change (unlike W8A8), which keeps greedy decode token-stable.

Replaces (TPU-native) the weight path a CUDA build would hand to a fused
dequant GEMM; reference keeps fp16 weights and relies on A100 bandwidth
(`/root/reference/autoregressive/serve/README.md:16`).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pick_bn(n: int) -> int:
    for bn in (512, 256, 128):
        if n % bn == 0:
            return bn
    raise ValueError(f"N={n} not 128-aligned")


def _kernel(x_ref, w_ref, s_ref, o_ref):
    x = x_ref[:]
    w = w_ref[:].astype(x.dtype)
    acc = jnp.dot(x, w, preferred_element_type=jnp.float32)
    o_ref[:] = (acc * s_ref[:]).astype(o_ref.dtype)


def int8_matmul(x: jnp.ndarray, w_q: jnp.ndarray, w_scale: jnp.ndarray,
                *, block_n: Optional[int] = None,
                interpret: Optional[bool] = None) -> jnp.ndarray:
    """x [B, K] (bf16/f32) @ dequant(w_q [K, N] int8, w_scale [N]) -> [B, N].

    w_scale is the per-output-channel symmetric scale (w ~ w_q * w_scale).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, k = x.shape
    k2, n = w_q.shape
    assert k == k2 and w_q.dtype == jnp.int8
    assert w_scale.shape == (n,)
    bn = block_n or _pick_bn(n)
    grid = (n // bn,)
    return pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((b, k), lambda i: (0, 0)),        # x: resident
            pl.BlockSpec((k, bn), lambda i: (0, i)),       # w: streamed
            pl.BlockSpec((1, bn), lambda i: (0, i)),       # scales
        ],
        out_specs=pl.BlockSpec((b, bn), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((b, n), x.dtype),
        interpret=interpret,
    )(x, w_q, w_scale.reshape(1, n).astype(jnp.float32))


def quantize_weight(w: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """[..., K, N] -> (int8 [..., K, N], per-channel scales [..., N])."""
    w32 = jnp.asarray(w, jnp.float32)
    scale = jnp.max(jnp.abs(w32), axis=-2) / 127.0 + 1e-12
    q = jnp.clip(jnp.round(w32 / scale[..., None, :]), -127, 127)
    return q.astype(jnp.int8), scale


_LAYER_MATMUL_KEYS = ("wqkv", "wo", "w1", "w2", "w3")


def _quantize_into(d: dict, key: str) -> None:
    q, s = quantize_weight(d[key])
    del d[key]
    d[key + "_q"] = q
    d[key + "_scale"] = s


def quantize_gpt_params(params, quantize_head: bool = False):
    """Quantize the weight matrices of a GPT param pytree (W8A16).

    Returns a new pytree where each matmul weight `w` is replaced by
    `w_q` (int8, per-layer-stacked like the originals) + `w_scale` (f32);
    norms, embeddings and conditioning keep their dtype. `models.gpt`
    dispatches on key presence (`matmul_any`).

    The output head stays bf16 by default: measured in the looped decode
    step, XLA fails to fuse the int8->bf16 convert of the single large
    [D, 16384] head operand and the step pays ~0.65 ms/step for it
    (GPT-L batch-16), while the per-layer weights fuse cleanly. Keeping
    the head bf16 costs only its extra 16.8 MB read (~30 us) and took the
    step 2.43 -> 1.88 ms in the ablation sweep (see BENCH.md).
    """
    out = dict(params)
    layers = dict(out["layers"])
    for key in _LAYER_MATMUL_KEYS:
        if key in layers:
            _quantize_into(layers, key)
    out["layers"] = layers
    if quantize_head and "output" in out:
        _quantize_into(out, "output")
    return out


def matmul_any(p, key: str, x: jnp.ndarray) -> jnp.ndarray:
    """x @ p[key], transparently dequantizing W8A16 weights when present.

    The dequant form is `(x @ w_q.astype(x.dtype)) * w_scale` — the
    per-output-channel scale commutes out of the contraction, so XLA fuses
    the int8->bf16 convert into the matmul read (never materializing a
    dequantized copy in HBM; measured 23% faster than bf16 weights on the
    looped decode shape). The Pallas int8_matmul kernel is kept for cases
    where a fused custom matmul is composed further, but XLA wins for the
    plain decode matmuls (its weight streams run ~2.8x the per-kernel DMA
    rate Mosaic achieves on this stack — see BENCH.md microbenchmarks).
    """
    if key + "_q" not in p:
        return x @ p[key].astype(x.dtype)
    w_q, w_scale = p[key + "_q"], p[key + "_scale"]
    out = x @ w_q.astype(x.dtype)
    return out * w_scale.astype(out.dtype)
