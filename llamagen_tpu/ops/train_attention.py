"""Layout-native training attention kernel: [B, S, H, D] in, causal,
scores never touch HBM.

The training step's dominant cost is the einsum SDPA's [B, H, S, S]
score buffer (BENCH.md: 18.4 ms/layer fwd+bwd f32, 11.0 ms bf16 at
batch 256 / seq 257). A stock flash-attention pallas kernel measured
WORSE (40 ms/layer): it wants [B, H, S, D] operands, and transposing
three 300 MB activations per layer costs more than the score traffic it
saves. LlamaGen's training geometry is short-sequence/huge-batch
(S = 257 or 577 tokens, B up to 256) — so the TPU-native design is not
flash's running-softmax over K blocks but a simpler fact: ONE batch
row's q/k/v ([S, H*D] bf16 ≈ 0.4 MB for GPT-B) and one head's [S, S]
f32 score tile (257² × 4 B = 264 KB) fit in VMEM outright. The kernel
grids over B, views the operands as [B, S, H*D] (a free reshape of the
native layout — no transpose), statically lane-slices each head, and
computes scores → causal mask → softmax → out entirely in VMEM. HBM
traffic is exactly q+k+v+o. Softmax runs in f32 (the scores exist only
in VMEM, so there is no bf16-materialization tradeoff left — strictly
MORE precise than the einsum path's bf16 score buffer).

Backward is the same structure (recompute scores from q/k in VMEM, then
dv = pᵀ·do, dp = do·vᵀ, ds = p∘(dp − rowsum(dp∘p)), dq = ds·k,
dk = dsᵀ·q), wired through jax.custom_vjp.

Supported: ANY head_dim. Multiples of 8 run native (static lane
slices); others (GPT-3B's head_dim=100) go through the zero-padding
wrapper `causal_attention_padded` — q/k pad lanes contribute exactly 0
to every score and the padded v lanes of the output slice off, so the
math is bit-identical to the unpadded kernel at +(pad/d) q/k/v/o HBM
traffic (3B: 100->104, +4%; LLAMAGEN_TRAIN_ATTN_PAD=128 forces full
128-lane alignment if Mosaic rejects 104-lane slices). Replaces
`F.scaled_dot_product_attention`
(`/root/reference/autoregressive/models/gpt.py:232`) on the training
path; decode keeps its own streaming kernel (ops/attention.py).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e30  # python float: a jnp scalar would be a captured constant


def supported(n_head: int, head_dim: int, seq: Optional[int] = None) -> bool:
    """Kernel-PREFERRED check (the padding wrapper makes every geometry
    kernel-ELIGIBLE). When `seq` is given, returns False for geometries
    whose full [S, H*dp] row overflows scoped VMEM and would escalate to
    head-group gridding — measured SLOWER than the bf16-scores einsum
    SDPA there (3B b32 s577: grouped kernel 15.9 vs einsum 12.4
    ms/layer fwd+bwd, BENCH.md r5: the pad-to-128 traffic plus the
    per-group grid overhead exceeds the HBM score-buffer saving at
    short sequences). The einsum fallback is the right default for
    those; LLAMAGEN_TRAIN_ATTN_FORCE=1 overrides."""
    import os

    if os.environ.get("LLAMAGEN_TRAIN_ATTN_FORCE") == "1":
        return True
    if seq is None:
        return True
    align = int(os.environ.get("LLAMAGEN_TRAIN_ATTN_PAD", "8"))
    dp = -(-head_dim // align) * align
    return _plan_fits(seq, n_head, dp, n_ops=7)


def _causal(s: int):
    r = jax.lax.broadcasted_iota(jnp.int32, (s, s), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (s, s), 1)
    return r >= c


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, h: int, d: int):
    # refs: [1, S, H*D] one batch row; heads are static lane slices
    mask = None
    for hi in range(h):
        sl = slice(hi * d, (hi + 1) * d)
        q = q_ref[0, :, sl]
        k = k_ref[0, :, sl]
        v = v_ref[0, :, sl]
        s = q.shape[0]
        if mask is None:
            mask = _causal(s)
        scores = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale  # [S, S]
        scores = jnp.where(mask, scores, NEG)
        m = jnp.max(scores, axis=-1, keepdims=True)
        e = jnp.exp(scores - m)
        p = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(q.dtype)
        o_ref[0, :, sl] = jnp.dot(
            p, v, preferred_element_type=jnp.float32).astype(o_ref.dtype)


def _bwd_kernel(q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref, dv_ref,
                *, scale: float, h: int, d: int):
    mask = None
    for hi in range(h):
        sl = slice(hi * d, (hi + 1) * d)
        q = q_ref[0, :, sl]
        k = k_ref[0, :, sl]
        v = v_ref[0, :, sl]
        do = do_ref[0, :, sl]
        s = q.shape[0]
        if mask is None:
            mask = _causal(s)
        scores = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        scores = jnp.where(mask, scores, NEG)
        m = jnp.max(scores, axis=-1, keepdims=True)
        e = jnp.exp(scores - m)
        p32 = e / jnp.sum(e, axis=-1, keepdims=True)      # [S, S] f32
        p = p32.astype(q.dtype)
        # dv = pᵀ · do
        dv_ref[0, :, sl] = jax.lax.dot_general(
            p, do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(dv_ref.dtype)
        # dp = do · vᵀ ; softmax backward
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)           # [S, S] f32
        ds = (p32 * (dp - jnp.sum(dp * p32, axis=-1, keepdims=True))
              ).astype(q.dtype)
        dq_ref[0, :, sl] = (jnp.dot(
            ds, k, preferred_element_type=jnp.float32) * scale
        ).astype(dq_ref.dtype)
        dk_ref[0, :, sl] = (jax.lax.dot_general(
            ds, q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * scale).astype(dk_ref.dtype)


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


_VMEM_BUDGET = 14 << 20  # scoped limit is 16 MB; leave compiler headroom


def _pick_hg(s: int, h: int, dp: int, n_ops: int) -> int:
    """Heads per grid block. Full-row (hg=h) when the n_ops
    double-buffered [s, hg*dp] bf16 blocks + the f32 score temps fit
    scoped VMEM (the GPT-B/L/XL/XXL geometries). Otherwise grid over
    head groups — a PARTIAL block's lane minor must be a 128 multiple,
    so candidates are divisors g of h with (g*dp) % 128 == 0 (3B at
    dp=128: any g). Heads are independent in causal SDPA, so grouping
    changes scheduling only, not math."""
    temps = 3 * s * s * 4  # scores/p32/dp f32 value temps

    def fits(g):
        return n_ops * 2 * s * g * dp * 2 + temps <= _VMEM_BUDGET

    if fits(h):
        return h
    cands = [g for g in range(h - 1, 0, -1)
             if h % g == 0 and (g * dp) % 128 == 0]
    for g in cands:
        if fits(g):
            return g
    return cands[-1] if cands else h


def _plan_fits(s: int, h: int, dp: int, n_ops: int) -> bool:
    g = _pick_hg(s, h, dp, n_ops)
    return n_ops * 2 * s * g * dp * 2 + 3 * s * s * 4 <= _VMEM_BUDGET


def _blk_spec(s, w):
    return pl.BlockSpec((1, s, w), lambda b, g: (b, 0, g))


def _fwd(q, k, v, scale, interpret):
    b, s, h, d = q.shape
    hg = _pick_hg(s, h, d, n_ops=4)
    qf, kf, vf = (x.reshape(b, s, h * d) for x in (q, k, v))
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale, h=hg, d=d),
        grid=(b, h // hg),
        in_specs=[_blk_spec(s, hg * d)] * 3,
        out_specs=_blk_spec(s, hg * d),
        out_shape=jax.ShapeDtypeStruct((b, s, h * d), q.dtype),
        interpret=_resolve_interp(interpret),
    )(qf, kf, vf)
    return out.reshape(b, s, h, d), (q, k, v)


def _bwd(scale, interpret, res, do):
    q, k, v = res
    b, s, h, d = q.shape
    hg = _pick_hg(s, h, d, n_ops=7)
    blk = _blk_spec(s, hg * d)
    shp = jax.ShapeDtypeStruct((b, s, h * d), q.dtype)
    ops = [x.reshape(b, s, h * d) for x in (q, k, v, do)]
    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_kernel, scale=scale, h=hg, d=d),
        grid=(b, h // hg),
        in_specs=[blk] * 4,
        out_specs=[blk] * 3,
        out_shape=[shp] * 3,
        interpret=_resolve_interp(interpret),
    )(*ops)
    return tuple(x.reshape(b, s, h, d) for x in (dq, dk, dv))


causal_attention_bshd.defvjp(_fwd, _bwd)


def causal_attention_padded(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                            scale: float,
                            interpret: Optional[bool] = None) -> jnp.ndarray:
    """head_dim-agnostic entry: pads D to the kernel's lane-slice
    alignment (next multiple of 8; LLAMAGEN_TRAIN_ATTN_PAD=128 forces
    128) and slices the output back. Zero q/k pad lanes add exactly 0 to
    every score; padded v lanes produce output lanes that are sliced
    off — bit-identical math, +(pad/d) HBM traffic. Gradients flow
    through pad/slice transparently (both are linear).

    When the full [S, H*dp] row blows the VMEM budget AND dp is not a
    128 multiple (3B: S=577, 32 heads, dp=104 -> 30 MB of double-
    buffered fwd operands vs the 16 MB scoped limit), padding escalates
    to 128 lanes so the kernel can grid over head GROUPS with 128-
    aligned block minors (3B: fwd 8 heads/block, bwd 4) — +28% q/k/v/o
    bytes buys a kernel that compiles at all; still far cheaper than
    the einsum SDPA's [B,H,S,S] HBM score buffer."""
    import os

    b, s, h, d = q.shape
    align = int(os.environ.get("LLAMAGEN_TRAIN_ATTN_PAD", "8"))
    dp = -(-d // align) * align
    if not _plan_fits(s, h, dp, n_ops=7):
        # no fitting (aligned) head grouping at this pad width —
        # escalate to 128 lanes, where every divisor of h aligns
        dp = -(-d // 128) * 128
        if not _plan_fits(s, h, dp, n_ops=7):
            # even 1 head/block overflows (the f32 [S,S] score temps alone
            # can exceed the budget at long seq) — _pick_hg would hand the
            # kernel a non-fitting plan and Mosaic would fail opaquely.
            # Reachable only via LLAMAGEN_TRAIN_ATTN_FORCE=1 (supported()
            # returns False for these geometries and callers fall back).
            raise ValueError(
                f"train-attention kernel cannot fit scoped VMEM at "
                f"seq={s}, heads={h}, head_dim={d} (padded {dp}): even a "
                f"1-head grid block overflows the {_VMEM_BUDGET >> 20} MB "
                f"budget. Unset LLAMAGEN_TRAIN_ATTN_FORCE and use the "
                f"einsum SDPA fallback for this geometry.")
    if dp == d:
        return causal_attention_bshd(q, k, v, scale, interpret)
    padw = ((0, 0),) * (q.ndim - 1) + ((0, dp - d),)
    out = causal_attention_bshd(jnp.pad(q, padw), jnp.pad(k, padw),
                                jnp.pad(v, padw), scale, interpret)
    return out[..., :d]
