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


def _pick_group(k: int, requested: int) -> int:
    """Largest divisor of K that is <= the requested group size."""
    g = min(requested, k)
    while k % g:
        g -= 1
    return g


def quantize_weight_int4(w: jnp.ndarray, group_size: int = 128,
                         ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """[..., K, N] -> (packed int8 [..., K, N//2], group scales [..., G, N]).

    Symmetric round-to-nearest int4 with group-wise scales along the
    contraction axis (G = K / group_size): per-channel scales are too
    coarse at 4 bits. Two int4 values pack into one int8 byte along the
    minor axis — low nibble = even N index — matching what
    `lax.bitcast_convert_type(int8 -> int4)` unpacks (`unpack_int4`,
    verified bit-exact on TPU and CPU).

    STATUS: storage/experimental, NOT the serving configuration. Measured
    on the v5e (BENCH.md rejected experiments): XLA does not fuse the
    nibble unpack into the matmul weight stream the way it fuses the int8
    convert — the GPT-3B decode step regressed 9x — and group-128 RTN
    int4 compounds to large logits error over deep stacks. W8A16
    (`quantize_weight`) is the quantized serving path.
    """
    *lead, k, n = w.shape
    assert n % 2 == 0, f"N={n} must be even for int4 packing"
    g = _pick_group(k, group_size)
    w32 = jnp.asarray(w, jnp.float32).reshape(*lead, k // g, g, n)
    scale = jnp.max(jnp.abs(w32), axis=-2) / 7.0 + 1e-12  # [..., G, N]
    q = jnp.clip(jnp.round(w32 / scale[..., None, :]), -8, 7)
    q = q.astype(jnp.int8).reshape(*lead, k, n // 2, 2)
    packed = (q[..., 0] & 0x0F) | (q[..., 1] << 4)
    return packed, scale


def unpack_int4(packed: jnp.ndarray) -> jnp.ndarray:
    """[..., K, N//2] int8 nibble-pairs -> [..., K, N] int4 (bitcast view).

    The bitcast + minor-dim reshape are layout ops; the int4 tensor is
    jit-internal only (int4 arrays cannot cross the host boundary on the
    axon plugin). Note the convert that consumes this does NOT fuse into
    a following matmul's HBM read on the current TPU backend (measured —
    see quantize_weight_int4), unlike the int8 path's convert.
    """
    v = jax.lax.bitcast_convert_type(packed, jnp.int4)  # [..., N//2, 2]
    return v.reshape(*packed.shape[:-1], packed.shape[-1] * 2)


def int4_matmul(x: jnp.ndarray, packed: jnp.ndarray,
                gscale: jnp.ndarray) -> jnp.ndarray:
    """x [..., K] @ dequant-int4(packed [K, N//2], gscale [G, N]) -> [..., N].

    With one group (G=1) the scale commutes out of the contraction like
    the int8 path. With G groups the matmul splits into G K-segments
    ('...gk,gkn->...gn'), and the group scales fold into the small
    [..., G, N] partials before the sum over G — the dequantized weight
    matrix itself is never materialized.
    """
    k = x.shape[-1]
    n = packed.shape[-1] * 2
    groups = gscale.shape[-2]
    if groups == 1:
        out = x @ unpack_int4(packed).astype(x.dtype)
        return out * gscale[0].astype(out.dtype)
    # f32 segment matmuls: universally supported (the CPU backend has no
    # bf16xbf16->f32 batched dot) and precision-safe; W4A16 is a storage /
    # experimental mode, not the serving path (BENCH.md: XLA does not fuse
    # the nibble unpack into the weight stream, unlike the int8 convert),
    # so the extra convert cost is acceptable.
    wq = unpack_int4(packed).astype(jnp.float32)
    xg = x.reshape(*x.shape[:-1], groups, k // groups).astype(jnp.float32)
    part = jnp.einsum("...gk,gkn->...gn", xg,
                      wq.reshape(groups, k // groups, n))
    out = jnp.einsum("...gn,gn->...n", part, gscale.astype(jnp.float32))
    return out.astype(x.dtype)


_LAYER_MATMUL_KEYS = ("wqkv", "wo", "w1", "w2", "w3")


def _quantize_into(d: dict, key: str, bits: int = 8,
                   group_size: int = 128) -> None:
    if bits == 4:
        q, s = quantize_weight_int4(d[key], group_size=group_size)
        del d[key]
        d[key + "_q4"] = q
        d[key + "_gs"] = s
        return
    q, s = quantize_weight(d[key])
    del d[key]
    d[key + "_q"] = q
    d[key + "_scale"] = s


def quantize_gpt_params(params, quantize_head: bool = False, bits: int = 8,
                        group_size: int = 128):
    """Quantize the weight matrices of a GPT param pytree (W8A16/W4A16).

    Returns a new pytree where each matmul weight `w` is replaced by
    `w_q` (int8, per-layer-stacked like the originals) + `w_scale` (f32);
    norms, embeddings and conditioning keep their dtype. `models.gpt`
    dispatches on key presence (`matmul_any`).

    bits=4 stores nibble-packed int4 with group-`group_size` scales
    (`w_q4` + `w_gs`) — half the HBM bytes of W8A16 for the weights-bound
    large models, at a measured numerics cost (BENCH.md); W8A16 stays the
    default serving configuration.

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
            _quantize_into(layers, key, bits=bits, group_size=group_size)
    out["layers"] = layers
    if quantize_head and "output" in out:
        _quantize_into(out, "output", bits=bits, group_size=group_size)
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
    if key + "_w4b" in p:
        from llamagen_tpu.ops.w4_matmul import w4_dequant, w4_matmul
        blocks, scales = p[key + "_w4b"], p[key + "_w4s"]
        layer = p.get("_w4_layer", 0)
        if x.ndim == 2:
            return w4_matmul(x, blocks, scales, layer=layer).astype(x.dtype)
        # train/prefill: the weight read amortizes over S tokens — the
        # XLA dequant fallback is correct and not the bottleneck there
        if blocks.ndim == 4:
            blocks = blocks[layer]
        return x @ w4_dequant(blocks, scales).astype(x.dtype)
    if key + "_q4" in p:
        return int4_matmul(x, p[key + "_q4"], p[key + "_gs"])
    if key + "_q" not in p:
        return x @ p[key].astype(x.dtype)
    w_q, w_scale = p[key + "_q"], p[key + "_scale"]
    out = x @ w_q.astype(x.dtype)
    return out * w_scale.astype(out.dtype)
