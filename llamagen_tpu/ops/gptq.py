"""GPTQ-style error-compensated int4 quantization for the W4 serving
kernel (`ops/w4_matmul.py`).

Raw round-to-nearest int4 is a real quality tradeoff (BENCH.md numerics:
GPT-B teacher-forced argmax agreement 39% group-128 / 24% per-channel on
random weights). GPTQ [Frantar et al. 2022] quantizes each input-channel
row in sequence and redistributes its rounding error onto the not-yet-
quantized rows, weighted by the Cholesky factor of the inverse input
Hessian H = X^T X from a short calibration pass — the standard offline
recipe for usable 4-bit serving weights. The output layout is EXACTLY the
serving kernel's (`pack_w4_levels`), so the runtime is untouched: GPTQ
only chooses better int levels + scales.

Orientation note: this codebase computes y = x @ W with W [K, N]
(input-major), so "columns" in the GPTQ paper (rows of their W [N, K])
are ROWS here; groups along K match the kernel's half-major segment
layout (half h covers original rows [h*K/2, (h+1)*K/2), segments of
`group_size` rows within each half, one ragged tail per half).

Calibration activations come from the model itself: a teacher-forced
forward over calibration tokens, capturing the residual stream before
each block and recomputing the five matmul inputs per layer (wqkv input,
pre-wo attention output, ffn input, w2 input) — no hooks, no module
state, just the functional model pieces (`models/gpt.py`).

The reference has no quantization at all (fp16 weights + A100 bandwidth,
`/root/reference/autoregressive/serve/README.md`); this is the TPU
build's lever for the weights-bound tail of the model zoo.
"""

from __future__ import annotations

import functools
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from llamagen_tpu.config import GPTConfig
from llamagen_tpu.models import gpt
from llamagen_tpu.ops.w4_matmul import (SEG_ROWS, _segments, pack_w4_levels,
                                        w4_dequant)

# ---------------------------------------------------------------------------
# Calibration: capture matmul inputs layer by layer
# ---------------------------------------------------------------------------


def _layer_matmul_inputs(p_l, h, freqs, mask, cfg: GPTConfig):
    """Recompute one block's matmul inputs from its residual-stream input.

    Returns (inputs dict, block output). Mirrors gpt._block / gpt._attention
    exactly (no dropout — calibration is eval-mode)."""
    attn_in = gpt.rms_norm(h, p_l["attention_norm"], cfg.norm_eps)
    q, k, v = gpt._split_qkv(p_l, attn_in, cfg)
    q = gpt.apply_rope(q, freqs)
    k = gpt.apply_rope(k, freqs)
    pre_wo = gpt._sdpa(q, k, v, mask, cfg, bf16_scores=h.dtype == jnp.bfloat16)
    from llamagen_tpu.ops.quant_matmul import matmul_any
    h2 = h + matmul_any(p_l, "wo", pre_wo)
    ffn_in = gpt.rms_norm(h2, p_l["ffn_norm"], cfg.norm_eps)
    w2_in = jax.nn.silu(matmul_any(p_l, "w1", ffn_in)) \
        * matmul_any(p_l, "w3", ffn_in)
    h3 = h2 + matmul_any(p_l, "w2", w2_in)
    inputs = {"wqkv": attn_in, "wo": pre_wo,
              "w1": ffn_in, "w3": ffn_in, "w2": w2_in}
    return inputs, h3


def _calib_stream(params, cfg: GPTConfig, cond, idx, compute_dtype):
    """Embedding + rope/mask setup for the teacher-forced calibration pass
    (mirrors gpt.forward_train eval mode)."""
    cond_emb = gpt.embed_condition(params, cfg, cond, train=False)
    tok_emb = params["tok_embeddings"][idx]
    h = jnp.concatenate([cond_emb, tok_emb], axis=1).astype(compute_dtype)
    s = h.shape[1]
    freqs = gpt.freqs_cis_2d(cfg)[:s]
    mask = jnp.tril(jnp.ones((s, s), bool))[None, None]
    return h, freqs, mask


def _hessian(x: jnp.ndarray) -> jnp.ndarray:
    """[B, S, K] activations -> H = X^T X / n, f32 [K, K]."""
    xf = x.reshape(-1, x.shape[-1]).astype(jnp.float32)
    return (xf.T @ xf) / xf.shape[0]


# ---------------------------------------------------------------------------
# Core GPTQ on one matrix
# ---------------------------------------------------------------------------


def _group_table(k: int, group_size: int, per_channel: bool):
    """Per-row group id + per-group (start, max_len) in kernel order."""
    if per_channel:
        return np.zeros((k,), np.int32), np.zeros((1,), np.int32), k
    k2 = k // 2
    group_size = min(group_size, k2)
    segs = _segments(k2, group_size)
    gid = np.zeros((k,), np.int32)
    starts = []
    g = 0
    for half in range(2):
        for (r0, rl) in segs:
            s0 = half * k2 + r0
            gid[s0:s0 + rl] = g
            starts.append(s0)
            g += 1
    return gid, np.asarray(starts, np.int32), group_size


@functools.partial(jax.jit, static_argnames=("group_size", "per_channel",
                                             "max_glen"))
def _gptq_core(w: jnp.ndarray, hinv_u: jnp.ndarray, gid: jnp.ndarray,
               gstart: jnp.ndarray, *, group_size: int, per_channel: bool,
               max_glen: int):
    """Sequential row quantization with error feedback.

    w: [K, N] f32 (will be consumed); hinv_u: [K, K] upper Cholesky of the
    damped inverse Hessian. Returns (levels [K, N] int8, scales [G, N]).
    Scales are computed when the row walk ENTERS a group, from the
    already-error-compensated rows of that group (GPTQ's dynamic-group
    behavior).
    """
    k, n = w.shape
    ngroups = gstart.shape[0]
    row_ids = jnp.arange(k)

    def body(i, carry):
        w, levels, scales = carry
        g = gid[i]

        def enter_group(scales):
            # dynamic_slice clamps the start when the window would cross
            # the array end (ragged tails) — mask rows by group id of the
            # CLAMPED positions so out-of-group rows never contribute
            cs = jnp.minimum(gstart[g], k - max_glen)
            rows = jax.lax.dynamic_slice(w, (cs, 0), (max_glen, n))
            valid = (gid[cs + jnp.arange(max_glen)] == g)[:, None]
            mx = jnp.max(jnp.abs(jnp.where(valid, rows, 0.0)), axis=0)
            return scales.at[g].set(mx / 7.0 + 1e-12)

        scales = jax.lax.cond(i == gstart[g], enter_group,
                              lambda s: s, scales)
        srow = scales[g]
        wi = w[i]
        q = jnp.clip(jnp.round(wi / srow), -8, 7)
        dq = q * srow
        err = (wi - dq) / hinv_u[i, i]
        # redistribute onto not-yet-visited rows (j > i)
        upd = hinv_u[i][:, None] * err[None, :]
        w = jnp.where((row_ids > i)[:, None], w - upd, w)
        levels = levels.at[i].set(q.astype(jnp.int8))
        return w, levels, scales

    levels = jnp.zeros((k, n), jnp.int8)
    if per_channel:
        # per-channel scales are global over K: fixed from the original W
        scales = (jnp.max(jnp.abs(w), axis=0, keepdims=True) / 7.0 + 1e-12)
        def body_pc(i, carry):
            w, levels, scales = carry
            wi = w[i]
            q = jnp.clip(jnp.round(wi / scales[0]), -8, 7)
            err = (wi - q * scales[0]) / hinv_u[i, i]
            upd = hinv_u[i][:, None] * err[None, :]
            w = jnp.where((row_ids > i)[:, None], w - upd, w)
            return w, levels.at[i].set(q.astype(jnp.int8)), scales
        _, levels, scales = jax.lax.fori_loop(0, k, body_pc,
                                              (w, levels, scales))
        return levels, scales

    scales = jnp.zeros((ngroups, n), jnp.float32)
    _, levels, scales = jax.lax.fori_loop(0, k, body, (w, levels, scales))
    return levels, scales


def gptq_quantize_matrix(w: jnp.ndarray, h: jnp.ndarray, *,
                         group_size: int = SEG_ROWS,
                         per_channel: bool = False,
                         damp: float = 0.01):
    """One matrix [K, N] + Hessian [K, K] -> (blocks, scales) in the
    serving-kernel layout (`w4_matmul` consumes them directly)."""
    k, n = w.shape
    w32 = jnp.asarray(w, jnp.float32)
    h32 = jnp.asarray(h, jnp.float32)
    mean_d = jnp.mean(jnp.diag(h32))
    h32 = h32 + jnp.eye(k) * (damp * mean_d + 1e-8)
    # upper Cholesky of H^-1 (the GPTQ update operator)
    hinv = jnp.linalg.inv(h32)
    # symmetrize for numerical stability before factorization
    hinv = (hinv + hinv.T) / 2
    lower = jnp.linalg.cholesky(hinv)
    hinv_u = lower.T

    gid, gstart, max_glen = _group_table(k, group_size, per_channel)
    levels, scales = _gptq_core(
        w32, hinv_u, jnp.asarray(gid), jnp.asarray(gstart),
        group_size=group_size, per_channel=per_channel, max_glen=max_glen)
    return pack_w4_levels(levels, scales)


# ---------------------------------------------------------------------------
# Whole-model driver
# ---------------------------------------------------------------------------


def gptq_quantize_gpt_params(params, cfg: GPTConfig, cond, tokens, *,
                             per_channel: bool = False,
                             group_size: int = SEG_ROWS,
                             int8_head: bool = False,
                             damp: float = 0.01,
                             compute_dtype=jnp.bfloat16,
                             verbose: bool = False):
    """Calibrated W4 quantization of a GPT param pytree -> kernel layout.

    cond: [B] class labels (c2i) or [B, T, caption_dim] captions (t2i);
    tokens: [B, S] calibration token ids (for released checkpoints, VQ
    codes of real images; random tokens are the honest fallback and what
    the numerics harness measures). Output pytree is identical in
    structure to `quantize_gpt_params_w4k`'s.

    Layer l+1's Hessians are computed from the DEQUANTIZED layer l outputs
    (error propagation aware, as in the GPTQ reference implementation).
    """
    from llamagen_tpu.ops.quant_matmul import _LAYER_MATMUL_KEYS

    idx = tokens[:, :-1]
    h, freqs, mask = _calib_stream(params, cfg, cond, idx, compute_dtype)

    layers = dict(params["layers"])
    qlayers: Dict[str, list] = {}
    capture = jax.jit(functools.partial(_layer_matmul_inputs, cfg=cfg))

    for l in range(cfg.n_layer):
        p_l = gpt.layer_params(params, l)
        inputs, _ = capture(p_l, h, freqs, mask)
        ql = dict(p_l)
        for key in _LAYER_MATMUL_KEYS:
            hess = _hessian(inputs[key])
            blocks, scales = gptq_quantize_matrix(
                p_l[key], hess, group_size=group_size,
                per_channel=per_channel, damp=damp)
            ql[key + "_w4b"] = blocks
            ql[key + "_w4s"] = scales
            del ql[key]
            qlayers.setdefault(key + "_w4b", []).append(blocks)
            qlayers.setdefault(key + "_w4s", []).append(scales)
        # propagate the QUANTIZED layer's output into the next layer's
        # calibration stream
        ql.pop("_w4_layer", None)
        _, h = capture(ql, h, freqs, mask)
        if verbose:
            print(f"gptq: layer {l + 1}/{cfg.n_layer} done", flush=True)

    out = dict(params)
    new_layers = {k: v for k, v in layers.items()
                  if k not in _LAYER_MATMUL_KEYS}
    for k, vs in qlayers.items():
        new_layers[k] = jnp.stack(vs)
    out["layers"] = new_layers
    if int8_head and "output" in out:
        from llamagen_tpu.ops.quant_matmul import quantize_weight
        q, s = quantize_weight(out.pop("output"))
        out["output_q"] = q
        out["output_scale"] = s
    return out
