"""TPU-native Llama-style autoregressive transformer over VQ code grids.

Re-implements the behavior of the reference Transformer
(`/root/reference/autoregressive/models/gpt.py`) as pure JAX functions:

  - fused wqkv projection, GQA via kv-head repeat       (gpt.py:188-241)
  - RMSNorm with f32 internals                          (gpt.py:137-148)
  - SwiGLU FFN, hidden = multiple_of-rounded 2/3*4d     (gpt.py:151-167)
  - 2D rotary embeddings, zero freqs on condition rows  (gpt.py:404-417)
  - class-label / caption conditioning with CFG dropout (gpt.py:56-115)
  - three forward modes: full (train), prefill, decode  (gpt.py:332-364)

TPU-first design choices (not in the reference):
  - per-layer weights stacked [L, ...] and executed with lax.scan
    (one compiled block body instead of L unrolled layers)
  - KV cache is an explicit pytree {'k','v': [L,B,Smax,Hkv,hd]} threaded
    through the scan — functional state instead of mutable buffers
  - everything static-shaped so prefill/decode jit once per geometry
"""

from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.ad_checkpoint import checkpoint_name

from llamagen_tpu.config import GPTConfig
from llamagen_tpu.ops.quant_matmul import matmul_any

Params = Dict[str, Any]


# ---------------------------------------------------------------------------
# Rotary embeddings
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=32)
def _freqs_cis_2d_np(grid_size: int, head_dim: int, base: float,
                     cls_token_num: int) -> np.ndarray:
    """2D RoPE table [cls_token_num + grid**2, head_dim//2, 2] (f32).

    Half the head dim rotates with the x coordinate, half with y; the
    condition positions get zero frequencies (ref: gpt.py:404-417).
    """
    half_dim = head_dim // 2
    freqs = 1.0 / (base ** (np.arange(0, half_dim, 2)[: half_dim // 2] / half_dim))
    t = np.arange(grid_size)
    freqs = np.outer(t, freqs)  # [grid, head_dim//4]
    fx = np.broadcast_to(freqs[:, None, :], (grid_size, grid_size, freqs.shape[1]))
    fy = np.broadcast_to(freqs[None, :, :], (grid_size, grid_size, freqs.shape[1]))
    grid = np.concatenate([fx, fy], axis=-1)  # [g, g, head_dim//2]
    cache = np.stack([np.cos(grid), np.sin(grid)], axis=-1)
    cache = cache.reshape(grid_size * grid_size, half_dim, 2)
    cond = np.zeros((cls_token_num, half_dim, 2), dtype=np.float32)
    return np.concatenate([cond, cache]).astype(np.float32)


def freqs_cis_2d(cfg: GPTConfig) -> jnp.ndarray:
    return jnp.asarray(_freqs_cis_2d_np(
        cfg.grid_size, cfg.head_dim, cfg.rope_base, cfg.cls_token_num))


def rope_heads(x: jnp.ndarray, freqs: jnp.ndarray) -> jnp.ndarray:
    """Interleaved-pair rotation in f32 (ref: gpt.py:420-430), unified
    over every decode/prefill layout.

    x: [..., H, D]; freqs: broadcastable to [..., D//2, 2] WITHOUT the
    head axis (one is inserted just before the half dim). Serves
    scalar-pos ([D//2, 2]), per-slot ([B, D//2, 2]), per-chunk
    ([B, C, D//2, 2]) and full-sequence ([S, D//2, 2]) callers.
    """
    xf = x.astype(jnp.float32).reshape(*x.shape[:-1], -1, 2)
    cos = freqs[..., None, :, 0]
    sin = freqs[..., None, :, 1]
    real = xf[..., 0] * cos - xf[..., 1] * sin
    imag = xf[..., 1] * cos + xf[..., 0] * sin
    out = jnp.stack([real, imag], axis=-1).reshape(x.shape)
    return out.astype(x.dtype)


def apply_rope(x: jnp.ndarray, freqs: jnp.ndarray) -> jnp.ndarray:
    """Full-sequence RoPE: x [B, S, H, D]; freqs [S, D//2, 2]."""
    return rope_heads(x, freqs)


# ---------------------------------------------------------------------------
# Core layers
# ---------------------------------------------------------------------------


def rms_norm(x: jnp.ndarray, weight: jnp.ndarray, eps: float) -> jnp.ndarray:
    """RMSNorm with f32 internals (ref: gpt.py:137-148)."""
    xf = x.astype(jnp.float32)
    normed = xf * jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + eps)
    return (normed.astype(x.dtype) * weight.astype(x.dtype))


class KVCache(NamedTuple):
    """Preallocated KV cache.

    kv is a tuple of per-layer [B, Smax, 2F] buffers with k in lanes
    [0, F) and v in [F, 2F) (F = kv_heads*head_dim) — merged so the Pallas
    decode kernel streams one DMA per block. kv_scale (int8 caches only)
    holds per-position dequant scales [B, Smax, 128] (k in lane 0, v in
    lane 64). Separate per-layer buffers keep the XLA fallback path free
    of per-step layer-slice materialization.
    """

    kv: tuple
    kv_scale: Optional[tuple] = None

    @property
    def max_seq_len(self) -> int:
        return self.kv[0].shape[1]

    @property
    def num_layers(self) -> int:
        return len(self.kv)

    @property
    def quantized(self) -> bool:
        return self.kv_scale is not None


def init_cache(cfg: GPTConfig, batch: int, max_seq_len: int,
               dtype=jnp.bfloat16) -> KVCache:
    f2 = 2 * cfg.kv_heads * cfg.head_dim
    if dtype == jnp.int8:
        return KVCache(
            kv=tuple(jnp.zeros((batch, max_seq_len, f2), jnp.int8)
                     for _ in range(cfg.n_layer)),
            kv_scale=tuple(jnp.ones((batch, max_seq_len, 128), jnp.bfloat16)
                           for _ in range(cfg.n_layer)))
    return KVCache(kv=tuple(jnp.zeros((batch, max_seq_len, f2), dtype)
                            for _ in range(cfg.n_layer)))


def init_recent(cfg: GPTConfig, batch: int, dtype=jnp.bfloat16,
                window: Optional[int] = None):
    """Per-layer [B, w, 2F] rolling windows for the Pallas decode kernel
    (w = 8 for bf16 caches, 32 for int8 — HBM tile alignment)."""
    from llamagen_tpu.ops.attention import RECENT

    shape = (batch, window or RECENT, 2 * cfg.kv_heads * cfg.head_dim)
    return tuple(jnp.zeros(shape, dtype) for _ in range(cfg.n_layer))


def quantize_cache(cache: KVCache, cfg: GPTConfig,
                   max_seq_len: int) -> KVCache:
    """bf16 cache (e.g. after prefill) -> int8 cache of length max_seq_len
    with per-position symmetric scales (matches the kernel's flush)."""
    f = cfg.kv_heads * cfg.head_dim
    batch = cache.kv[0].shape[0]
    src_len = cache.max_seq_len
    n_kv, n_sc = [], []
    for ckv in cache.kv:
        kf = ckv[:, :, :f].astype(jnp.float32)
        vf = ckv[:, :, f:].astype(jnp.float32)
        ks = jnp.max(jnp.abs(kf), axis=-1, keepdims=True) / 127.0 + 1e-8
        vs = jnp.max(jnp.abs(vf), axis=-1, keepdims=True) / 127.0 + 1e-8
        k8 = jnp.clip(jnp.round(kf / ks), -127, 127)
        v8 = jnp.clip(jnp.round(vf / vs), -127, 127)
        kv8 = jnp.concatenate([k8, v8], axis=-1).astype(jnp.int8)
        sc = jnp.concatenate(
            [jnp.broadcast_to(ks, (batch, src_len, 64)),
             jnp.broadcast_to(vs, (batch, src_len, 64))],
            axis=-1).astype(jnp.bfloat16)
        pad = max_seq_len - src_len
        n_kv.append(jnp.pad(kv8, ((0, 0), (0, pad), (0, 0))))
        n_sc.append(jnp.pad(sc, ((0, 0), (0, pad), (0, 0)),
                            constant_values=1.0))
    return KVCache(kv=tuple(n_kv), kv_scale=tuple(n_sc))


def layer_params(params: Params, l: int) -> Params:
    """Static per-layer view of the stacked [L, ...] layer weights.

    W4-kernel block arrays (`*_w4b`, ops/w4_matmul.py) stay UNSLICED with
    the layer index attached: an XLA slice feeding a pallas ANY operand
    materializes a full copy of the packed weights, defeating the kernel
    (the kernel indexes the layer inside its own DMA instead).
    """
    out = {k: (v if k.endswith("_w4b") else v[l])
           for k, v in params["layers"].items()}
    if any(k.endswith("_w4b") for k in out):
        out["_w4_layer"] = l
    return out


def _split_qkv(p: Params, x: jnp.ndarray, cfg: GPTConfig):
    b, s, _ = x.shape
    qkv = matmul_any(p, "wqkv", x)
    q_size = cfg.n_head * cfg.head_dim
    kv_size = cfg.kv_heads * cfg.head_dim
    q = qkv[..., :q_size].reshape(b, s, cfg.n_head, cfg.head_dim)
    k = qkv[..., q_size:q_size + kv_size].reshape(b, s, cfg.kv_heads, cfg.head_dim)
    v = qkv[..., q_size + kv_size:].reshape(b, s, cfg.kv_heads, cfg.head_dim)
    return q, k, v


def _use_train_kernel() -> bool:
    """Training-attention kernel gate (opt-out: LLAMAGEN_NO_TRAIN_KERNEL=1
    falls back to the einsum SDPA for A/B comparison)."""
    import os

    return not os.environ.get("LLAMAGEN_NO_TRAIN_KERNEL")


def _sdpa(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
          mask: Optional[jnp.ndarray], cfg: GPTConfig,
          bf16_scores: bool = False,
          dropout_rng=None) -> jnp.ndarray:
    """Masked multi-head attention. q: [B,Sq,H,D], k/v: [B,Sk,Hkv,D].

    bf16_scores (training full-seq path under bf16 compute): materialize
    the [B,H,S,S] score matrix in bf16 instead of f32 — the MXU still
    accumulates the dot in f32 and the softmax upcasts, so the only change
    is bf16 rounding of each score (already the compute precision). Halves
    the dominant S^2 HBM traffic: measured 18.4 -> 11.0 ms/layer fwd+bwd
    at batch 256/seq 257 on v5e. (A pallas flash-attention variant was
    measured at 40 ms/layer — the [B,S,H,D]->[B,H,S,D] transposes and
    seq padding cost more than the score traffic it saves; see BENCH.md.)
    """
    if cfg.kv_heads != cfg.n_head:
        rep = cfg.n_head // cfg.kv_heads
        k = jnp.repeat(k, rep, axis=2)
        v = jnp.repeat(v, rep, axis=2)
    scale = cfg.head_dim ** -0.5
    if bf16_scores and q.dtype == jnp.bfloat16:
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k) * jnp.bfloat16(scale)
        if mask is not None:
            scores = jnp.where(mask, scores, jnp.bfloat16(-3e38))
        probs = jax.nn.softmax(scores.astype(jnp.float32),
                               axis=-1).astype(q.dtype)
    else:
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                            preferred_element_type=jnp.float32) * scale
        if mask is not None:
            scores = jnp.where(mask, scores, jnp.float32(-1e30))
        probs = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
    if dropout_rng is not None and cfg.attn_dropout_p > 0:
        # attention-probability dropout, torch SDPA semantics (ref
        # gpt.py:232-236 passes attn_dropout_p during training)
        probs = _dropout(dropout_rng, probs, cfg.attn_dropout_p)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs, v)
    return out.reshape(*q.shape[:2], cfg.n_head * cfg.head_dim)


def _attention(p: Params, x: jnp.ndarray, freqs: jnp.ndarray,
               mask: Optional[jnp.ndarray], cfg: GPTConfig,
               cache_kv: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
               pos: Optional[jnp.ndarray] = None,
               attn_dropout_rng=None):
    """One attention layer. Returns (out, new_cache_kv or None).

    attn_dropout_rng: when set (training with attn_dropout_p > 0),
    attention-probability dropout runs in the einsum path — the Pallas
    training kernel never materializes probs, so it is gated off."""
    q, k, v = _split_qkv(p, x, cfg)
    q = apply_rope(q, freqs)
    k = apply_rope(k, freqs)

    new_cache = None
    if cache_kv is not None:
        ckv = cache_kv  # merged [B, Smax, 2F]
        b_, s_, hkv, d_ = k.shape
        f_ = hkv * d_
        kv_new = jnp.concatenate(
            [k.reshape(b_, s_, f_), v.reshape(b_, s_, f_)],
            axis=-1).astype(ckv.dtype)
        ckv = jax.lax.dynamic_update_slice(ckv, kv_new, (0, pos, 0))
        new_cache = ckv
        smax_ = ckv.shape[1]
        k = ckv[:, :, :f_].reshape(b_, smax_, hkv, d_).astype(q.dtype)
        v = ckv[:, :, f_:].reshape(b_, smax_, hkv, d_).astype(q.dtype)

    from llamagen_tpu.ops.train_attention import supported as _tk_supported

    if cache_kv is None and attn_dropout_rng is None \
            and _use_train_kernel() \
            and _tk_supported(cfg.n_head, cfg.head_dim, x.shape[1]):
        # training full-sequence attention: the layout-native Pallas
        # kernel keeps the [S, S] scores VMEM-resident per (batch, head)
        # (ops/train_attention.py) — no HBM score buffer at all, f32
        # softmax (MORE precise than the einsum path's bf16 scores).
        # forward_train's mask is always pure causal (t2i folds caption
        # validity into the embeddings, train/t2i.py:41-44), which the
        # kernel applies internally.
        from llamagen_tpu.ops.train_attention import causal_attention_padded

        kk, vv = k, v
        if cfg.kv_heads != cfg.n_head:
            rep = cfg.n_head // cfg.kv_heads
            kk = jnp.repeat(kk, rep, axis=2)
            vv = jnp.repeat(vv, rep, axis=2)
        out = causal_attention_padded(q, kk, vv, cfg.head_dim ** -0.5)
        out = out.reshape(*q.shape[:2], cfg.n_head * cfg.head_dim)
    else:
        # cache-less einsum fallback: under bf16 compute, keep the S^2
        # score buffer bf16 too
        out = _sdpa(q, k, v, mask, cfg, bf16_scores=cache_kv is None,
                    dropout_rng=attn_dropout_rng)
    if cache_kv is None:
        # selective-remat anchor: under remat="save_attn" this [B, S, F]
        # tensor is the ONLY saved residual per layer — the attention
        # kernel's fwd is then pruned from the backward recompute (its
        # own VJP residuals are q/k/v, rebuilt by the cheap wqkv matmul;
        # only wo's backward needed this output). See _run_layers.
        out = checkpoint_name(out, "attn_core")
    out = matmul_any(p, "wo", out)
    return out, new_cache


def _ffn(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    """SwiGLU (ref: gpt.py:151-167)."""
    h = jax.nn.silu(matmul_any(p, "w1", x)) * matmul_any(p, "w3", x)
    return matmul_any(p, "w2", h)


def _dropout(rng, x, p: float):
    keep = jax.random.bernoulli(rng, 1.0 - p, x.shape)
    return jnp.where(keep, x / (1.0 - p), 0.0).astype(x.dtype)


def _drop_path(rng, x, rate):
    """Per-sample stochastic depth (ref: utils/drop_path.py:24); `rate` may
    be a traced per-layer scalar (linspace over depth, ref gpt.py:280)."""
    keep = jax.random.bernoulli(rng, 1.0 - rate,
                                (x.shape[0],) + (1,) * (x.ndim - 1))
    return jnp.where(keep, x / (1.0 - rate), 0.0).astype(x.dtype)


def _block(p: Params, h: jnp.ndarray, freqs: jnp.ndarray,
           mask: Optional[jnp.ndarray], cfg: GPTConfig,
           cache_kv=None, pos=None, dropout_rng=None, drop_path_rate=None):
    attn_in = rms_norm(h, p["attention_norm"], cfg.norm_eps)
    # fold_in (not a wider split) keeps the r1-r4 streams identical to
    # attn_dropout_p == 0 runs
    attn_rng = (jax.random.fold_in(dropout_rng, 5)
                if dropout_rng is not None and cfg.attn_dropout_p > 0
                else None)
    attn_out, new_cache = _attention(p, attn_in, freqs, mask, cfg, cache_kv,
                                     pos, attn_dropout_rng=attn_rng)
    if dropout_rng is not None:
        r1, r2, r3, r4 = jax.random.split(dropout_rng, 4)
        if cfg.resid_dropout_p > 0:
            attn_out = _dropout(r1, attn_out, cfg.resid_dropout_p)
        if drop_path_rate is not None:
            attn_out = _drop_path(r3, attn_out, drop_path_rate)
    h = h + attn_out
    ffn_out = _ffn(p, rms_norm(h, p["ffn_norm"], cfg.norm_eps))
    if dropout_rng is not None:
        if cfg.ffn_dropout_p > 0:
            ffn_out = _dropout(r2, ffn_out, cfg.ffn_dropout_p)
        if drop_path_rate is not None:
            ffn_out = _drop_path(r4, ffn_out, drop_path_rate)
    return h + ffn_out, new_cache


def _run_layers(params: Params, h: jnp.ndarray, freqs: jnp.ndarray,
                mask: Optional[jnp.ndarray], cfg: GPTConfig,
                cache: Optional[KVCache] = None, pos=None,
                dropout_rng=None, remat=False):
    """Scan a single compiled block over the stacked layer weights."""
    layers = params["layers"]
    n_layer = cfg.n_layer

    if dropout_rng is not None:
        layer_rngs = jax.random.split(dropout_rng, n_layer)
    else:
        layer_rngs = None

    if cache is None:
        dpr = None
        if layer_rngs is not None and cfg.drop_path_rate > 0:
            # per-layer stochastic-depth rates (ref: gpt.py:280)
            dpr = jnp.linspace(0.0, cfg.drop_path_rate, n_layer)

        def scan_fn(carry, xs):
            if layer_rngs is not None:
                if dpr is not None:
                    p_l, rng_l, dpr_l = xs
                else:
                    (p_l, rng_l), dpr_l = xs, None
            else:
                p_l, rng_l, dpr_l = xs, None, None
            out, _ = _block(p_l, carry, freqs, mask, cfg, dropout_rng=rng_l,
                            drop_path_rate=dpr_l)
            return out, None

        if remat == "save_attn":
            # selective policy: save each layer's attention-core output
            # (the "attn_core" name above) and recompute everything else.
            # Trades +[B, S, F] bf16 HBM per layer for skipping the
            # attention kernel's fwd in the backward recompute — the
            # single most expensive op in the step anatomy (BENCH.md).
            scan_fn = jax.checkpoint(
                scan_fn,
                policy=jax.checkpoint_policies.save_only_these_names(
                    "attn_core"))
        elif remat:
            scan_fn = jax.checkpoint(scan_fn)
        if layer_rngs is not None:
            xs = ((layers, layer_rngs, dpr) if dpr is not None
                  else (layers, layer_rngs))
        else:
            xs = layers
        h, _ = jax.lax.scan(scan_fn, h, xs)
        return h, None

    # inference with cache: unrolled python loop over per-layer buffers so
    # updates alias in place (see KVCache docstring)
    new_kv = []
    for l in range(cfg.n_layer):
        h, ckv = _block(layer_params(params, l), h, freqs, mask, cfg,
                        cache_kv=cache.kv[l], pos=pos)
        new_kv.append(ckv)
    return h, KVCache(kv=tuple(new_kv))


# ---------------------------------------------------------------------------
# Conditioning
# ---------------------------------------------------------------------------


def embed_condition(params: Params, cfg: GPTConfig, cond: jnp.ndarray,
                    *, train: bool = False, rng=None) -> jnp.ndarray:
    """Class labels [B] (c2i) or caption features [B,T,caption_dim] (t2i)
    -> condition embeddings [B, cls_token_num, dim]. Ref: gpt.py:56-115."""
    p = params["cls_embedding"]
    if cfg.model_type == "c2i":
        labels = cond
        if train and cfg.class_dropout_prob > 0:
            drop = jax.random.uniform(rng, labels.shape) < cfg.class_dropout_prob
            labels = jnp.where(drop, cfg.num_classes, labels)
        emb = p["embedding_table"][labels]
        return emb[:, None, :]
    # t2i: MLP-project T5 features (GELU-tanh, ref: gpt.py:118-131)
    cap = cond
    if train and cfg.class_dropout_prob > 0:
        drop = jax.random.uniform(rng, (cap.shape[0],)) < cfg.class_dropout_prob
        cap = jnp.where(drop[:, None, None],
                        p["uncond_embedding"].astype(cap.dtype), cap)
    h = jax.nn.gelu(cap @ p["fc1"]["kernel"].astype(cap.dtype), approximate=True)
    h = h @ p["fc2"]["kernel"].astype(cap.dtype)
    return h[:, :cfg.cls_token_num]


# ---------------------------------------------------------------------------
# Forward modes
# ---------------------------------------------------------------------------


def _logits(params: Params, h: jnp.ndarray, cfg: GPTConfig) -> jnp.ndarray:
    h = rms_norm(h, params["norm"], cfg.norm_eps)
    return matmul_any(params, "output", h).astype(jnp.float32)


def forward_train(params: Params, cfg: GPTConfig, cond: jnp.ndarray,
                  idx: jnp.ndarray, targets: Optional[jnp.ndarray] = None,
                  valid: Optional[jnp.ndarray] = None,
                  rng=None, train: bool = True,
                  compute_dtype=jnp.float32, remat=False):
    """Full-sequence teacher-forced forward (ref: gpt.py:341-346,358-381).

    cond: [B] labels or [B,T,caption_dim]; idx: [B, block_size-?] token ids
    (callers pass z[:, :-1]); targets: [B, block_size] labels for CE loss.
    Returns (logits [B, 1+len(idx) - (cls_token_num-1), vocab], loss).
    """
    if rng is not None:
        r_cond, r_tok, r_layers = jax.random.split(rng, 3)
    else:
        r_cond = r_tok = r_layers = None

    cond_emb = embed_condition(params, cfg, cond, train=train, rng=r_cond)
    tok_emb = params["tok_embeddings"][idx]
    h = jnp.concatenate([cond_emb, tok_emb], axis=1).astype(compute_dtype)
    if train and cfg.token_dropout_p > 0 and r_tok is not None:
        h = _dropout(r_tok, h, cfg.token_dropout_p)

    seq_len = h.shape[1]
    freqs = freqs_cis_2d(cfg)[:seq_len]
    causal = jnp.tril(jnp.ones((seq_len, seq_len), bool))[None, None]
    h, _ = _run_layers(params, h, freqs, causal, cfg,
                       dropout_rng=r_layers if train else None, remat=remat)
    logits = _logits(params, h, cfg)
    # predictions for grid tokens start at the last condition position
    logits = logits[:, cfg.cls_token_num - 1:]

    loss = None
    if targets is not None:
        logp = jax.nn.log_softmax(logits, axis=-1)
        nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
        if valid is not None:
            w = jnp.broadcast_to(valid[:, None].astype(jnp.float32), nll.shape)
            loss = jnp.sum(nll * w) / jnp.maximum(jnp.sum(w), 1.0)
        else:
            loss = jnp.mean(nll)
    return logits, loss


def prefill(params: Params, cfg: GPTConfig, cond: jnp.ndarray,
            cache: KVCache, prefix_mask: Optional[jnp.ndarray] = None,
            compute_dtype=jnp.bfloat16):
    """Prefill the condition tokens (ref: gpt.py:348-354 prefill branch).

    cond: [B] labels (c2i) or [B,T,caption_dim] caption features (t2i).
    prefix_mask: optional [B, T] bool validity mask for t2i left-padding
    (folded into attention exactly like ref generate.py:154-163).
    Returns (logits at last position [B, vocab], updated cache).
    """
    t = cfg.cls_token_num
    h = embed_condition(params, cfg, cond, train=False).astype(compute_dtype)
    b = h.shape[0]
    freqs = freqs_cis_2d(cfg)[:t]

    causal = jnp.tril(jnp.ones((t, t), bool))[None, None]  # [1,1,T,T]
    if prefix_mask is not None:
        allow = prefix_mask[:, None, None, :]  # [B,1,1,T]
        eye = jnp.eye(t, dtype=bool)[None, None]
        mask = causal & (allow | eye)
    else:
        mask = jnp.broadcast_to(causal, (b, 1, t, t))

    # during prefill only the first T cache slots are populated; attend there
    smax = cache.max_seq_len
    full_mask = jnp.zeros((b, 1, t, smax), bool)
    full_mask = full_mask.at[:, :, :, :t].set(mask)

    h, cache = _run_layers(params, h, freqs, full_mask, cfg, cache=cache, pos=0)
    logits = _logits(params, h[:, -1:, :], cfg)[:, 0]
    return logits, cache


def _rope_single(x: jnp.ndarray, freqs: jnp.ndarray) -> jnp.ndarray:
    """RoPE for a single position. x: [B, H, D]; freqs: [D//2, 2]."""
    return rope_heads(x, freqs)


# ---------------------------------------------------------------------------
# Shared cached-decode layer stack
#
# Every decode-with-cache path in the framework — gpt.decode_step /
# decode_step_pallas, the serving engine's per-slot steps
# (serve/engine.py), the TP local steps (parallel/tp_decode.py,
# serve/tp_engine.py) and the speculative C-token verify
# (ops/speculative.py) — shares ONE definition of the per-layer body
# (rmsnorm -> wqkv -> attention -> wo -> rmsnorm -> SwiGLU) and the final
# norm + output head. The paths differ ONLY in how attention updates and
# reads the cache, which an `attend(l, p, qkv)` closure owns.
# ---------------------------------------------------------------------------


class CacheAccum:
    """Per-layer cache state collected by attend closures during a
    decode_stack pass: new kv buffers, int8 scales, recent windows."""

    __slots__ = ("kv", "sc", "recent")

    def __init__(self):
        self.kv, self.sc, self.recent = [], [], []

    def as_cache(self, quantized: bool) -> "KVCache":
        return KVCache(kv=tuple(self.kv),
                       kv_scale=tuple(self.sc) if quantized else None)


def split_heads(qkv: jnp.ndarray, h_q: int, h_kv: int, head_dim: int):
    """Fused projection [..., (h_q + 2*h_kv)*d] -> (q [..., h_q, d],
    k [..., h_kv, d], v [..., h_kv*d] — v stays lane-flat: it is only
    ever written to the cache or consumed flattened)."""
    lead = qkv.shape[:-1]
    qs, ks = h_q * head_dim, h_kv * head_dim
    q = qkv[..., :qs].reshape(*lead, h_q, head_dim)
    k = qkv[..., qs:qs + ks].reshape(*lead, h_kv, head_dim)
    v = qkv[..., qs + ks:]
    return q, k, v


def decode_stack(params: Params, cfg: GPTConfig, h: jnp.ndarray, attend,
                 tp_axis: Optional[str] = None) -> jnp.ndarray:
    """The shared decode layer loop + final norm + output head.

    h: [..., D] input embeddings, any leading shape ([B] single-token,
    [B, C] chunk). Matmuls flatten to rank-2 so the quantized-weight
    dispatch (`matmul_any`: bf16 / W8A16 / W4-kernel) applies on every
    path. attend(l, p, qkv) -> [..., H_local*head_dim] owns the
    split/rope/cache-update/attention specifics (see the attend factories
    below). tp_axis: shard_map axis name — wo/w2 partial sums psum over
    it and the vocab-parallel logits all-gather (Megatron-style decode
    TP, parallel/tp_decode.py docstring). Returns f32 logits [..., V].
    """
    lead = h.shape[:-1]

    def mm(p, key, x):
        out = matmul_any(p, key, x.reshape(-1, x.shape[-1]))
        return out.reshape(*lead, out.shape[-1])

    def red(x):
        return jax.lax.psum(x, tp_axis) if tp_axis is not None else x

    for l in range(cfg.n_layer):
        p = layer_params(params, l)
        x = rms_norm(h, p["attention_norm"], cfg.norm_eps)
        attn_out = attend(l, p, mm(p, "wqkv", x))
        h = h + red(mm(p, "wo", attn_out.astype(x.dtype))).astype(h.dtype)
        x = rms_norm(h, p["ffn_norm"], cfg.norm_eps)
        ffn = jax.nn.silu(mm(p, "w1", x)) * mm(p, "w3", x)
        h = h + red(mm(p, "w2", ffn)).astype(h.dtype)

    h = rms_norm(h, params["norm"], cfg.norm_eps)
    logits = mm(params, "output", h).astype(jnp.float32)
    if tp_axis is not None:
        logits = jax.lax.all_gather(logits, tp_axis,
                                    axis=logits.ndim - 1, tiled=True)
    return logits


def attend_cache_xla(cfg: GPTConfig, cache: KVCache, pos: jnp.ndarray,
                     mask: jnp.ndarray, freqs: jnp.ndarray,
                     accum: CacheAccum,
                     read_extent: Optional[int] = None):
    """Single-token einsum attention over the dense cache.

    Scalar `pos`: in-place dynamic_update_slice write + static
    `read_extent`-bounded read (gpt.decode_step's fast path; a
    read-before-write variant with a separate diagonal term measured
    ~1.75x slower on GPT-L — XLA fuses update-then-read better).
    Vector `pos` [B]: batched scatter write, full-extent read (the
    serving engine's per-slot step). mask: bool, broadcastable to the
    [B, H, extent] scores.
    """
    smax = cache.max_seq_len
    extent = smax if read_extent is None else min(read_extent, smax)
    scalar_pos = jnp.ndim(pos) == 0
    rep = cfg.n_head // cfg.kv_heads
    kv_size = cfg.kv_heads * cfg.head_dim
    scale = cfg.head_dim ** -0.5

    def attend(l, p, qkv):
        b = qkv.shape[0]
        q, k, v = split_heads(qkv, cfg.n_head, cfg.kv_heads, cfg.head_dim)
        q = rope_heads(q, freqs)
        k = rope_heads(k, freqs)
        kv_new = jnp.concatenate(
            [k.reshape(b, kv_size), v], axis=-1).astype(cache.kv[l].dtype)
        if scalar_pos:
            ckv = jax.lax.dynamic_update_slice(
                cache.kv[l], kv_new[:, None, :], (0, pos, 0))
        else:
            ckv = cache.kv[l].at[jnp.arange(b), pos].set(kv_new)
        accum.kv.append(ckv)
        keys = ckv[:, :extent, :kv_size].reshape(b, extent, cfg.kv_heads,
                                                 cfg.head_dim)
        vals = ckv[:, :extent, kv_size:].reshape(b, extent, cfg.kv_heads,
                                                 cfg.head_dim)
        if rep != 1:
            keys = jnp.repeat(keys, rep, axis=2)
            vals = jnp.repeat(vals, rep, axis=2)
        scores = jnp.einsum("bhd,bshd->bhs", q, keys.astype(q.dtype),
                            preferred_element_type=jnp.float32) * scale
        scores = jnp.where(mask, scores, jnp.float32(-1e30))
        probs = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
        attn = jnp.einsum("bhs,bshd->bhd", probs, vals.astype(q.dtype))
        return attn.reshape(b, cfg.n_head * cfg.head_dim)

    return attend


def attend_cache_pallas(cfg: GPTConfig, cache: KVCache, recent,
                        pos: jnp.ndarray, freqs: jnp.ndarray,
                        accum: CacheAccum, *,
                        prefix_pad: Optional[jnp.ndarray] = None,
                        n_local_heads: Optional[int] = None,
                        n_local_kv_heads: Optional[int] = None,
                        interpret: Optional[bool] = None):
    """Single-token Pallas decode-attention (ops/attention.py): in-place
    HBM cache (optionally int8 + scales), bf16 recent windows. Accepts
    scalar or per-slot [B] positions. n_local_heads / n_local_kv_heads:
    per-chip head counts under TP shard_map (r5: GQA supported — defaults
    keep the global q:kv ratio when only n_local_heads is given)."""
    from llamagen_tpu.ops import attention as attn_lib

    hn = n_local_heads if n_local_heads is not None else cfg.n_head
    d_local = hn * cfg.head_dim
    # GQA: the cache/kv rows carry kv_heads*head_dim lanes; the kernel
    # lane-expands them per query head
    if n_local_kv_heads is not None:
        kvh = n_local_kv_heads
    elif n_local_heads is None:
        kvh = cfg.kv_heads
    else:  # TP local: preserve the global ratio
        kvh = hn * cfg.kv_heads // cfg.n_head
    d_kv = kvh * cfg.head_dim

    def attend(l, p, qkv):
        b = qkv.shape[0]
        q, k, v = split_heads(qkv, hn, kvh, cfg.head_dim)
        q = rope_heads(q, freqs).reshape(b, d_local)
        k = rope_heads(k, freqs).reshape(b, d_kv)
        kv_new = jnp.concatenate([k, v], axis=-1)
        if cache.quantized:
            attn, ckv, csc, r = attn_lib.decode_attention(
                q, kv_new, recent[l], cache.kv[l], pos, hn,
                prefix_pad=prefix_pad, kv_scale=cache.kv_scale[l],
                interpret=interpret)
            accum.sc.append(csc)
        else:
            attn, ckv, r = attn_lib.decode_attention(
                q, kv_new, recent[l], cache.kv[l], pos, hn,
                prefix_pad=prefix_pad, interpret=interpret)
        accum.kv.append(ckv)
        accum.recent.append(r)
        return attn

    return attend


def decode_step(params: Params, cfg: GPTConfig, token: jnp.ndarray,
                pos: jnp.ndarray, cache: KVCache,
                prefix_allow: Optional[jnp.ndarray] = None,
                compute_dtype=jnp.bfloat16,
                read_extent: Optional[int] = None):
    """Single-token decode with KV cache (ref: gpt.py:350-356 decode branch).

    TPU-tuned:
      - 2D activations [B, D] (no degenerate seq dim), unrolled layer loop
        over per-layer cache buffers
      - `read_extent` (static) bounds how many cache slots the attention
        reads — the sampling loop passes a bucketed bound that grows with
        pos (128-step segments), trimming KV traffic.

    token: [B] int32; pos: scalar int32 absolute position.
    prefix_allow: optional [B, Smax] bool — columns always allowed outside
    the condition prefix, emb-mask inside it (t2i).
    Returns (logits [B, vocab], new cache).
    """
    smax = cache.max_seq_len
    extent = smax if read_extent is None else min(read_extent, smax)
    h = params["tok_embeddings"][token].astype(compute_dtype)  # [B, D]
    freqs = jax.lax.dynamic_slice_in_dim(
        freqs_cis_2d(cfg), pos, 1, axis=0)[0]  # [D//2, 2]
    mask = (jnp.arange(extent) <= pos)[None, None, :]  # [1, 1, E]
    if prefix_allow is not None:
        mask = mask & prefix_allow[:, None, :extent]  # [B, 1, E]

    acc = CacheAccum()
    attend = attend_cache_xla(cfg, cache, pos, mask, freqs, acc,
                              read_extent=read_extent)
    logits = decode_stack(params, cfg, h, attend)
    return logits, acc.as_cache(quantized=False)


def decode_step_pallas(params: Params, cfg: GPTConfig, token: jnp.ndarray,
                       pos: jnp.ndarray, cache: KVCache, recent,
                       prefix_pad: Optional[jnp.ndarray] = None,
                       compute_dtype=jnp.bfloat16, interpret: Optional[bool] = None):
    """decode_step with the Pallas decode-attention kernel.

    The per-layer HBM cache is updated in place by the kernel (aliased);
    the new k|v land in per-layer [B, w, 2F] recent windows
    (llamagen_tpu.ops.attention docstring) carried by the sampling scan.

    Requires a 128-aligned cache length; GQA (kv_heads < n_head) is
    supported — the kernel lane-expands cache rows per query head
    (ops/attention.expand_kv). Returns (logits, cache, recent).
    """
    assert cfg.n_head % cfg.kv_heads == 0
    h = params["tok_embeddings"][token].astype(compute_dtype)  # [B, D]
    freqs = jax.lax.dynamic_slice_in_dim(
        freqs_cis_2d(cfg), pos, 1, axis=0)[0]

    acc = CacheAccum()
    attend = attend_cache_pallas(cfg, cache, recent, pos, freqs, acc,
                                 prefix_pad=prefix_pad, interpret=interpret)
    logits = decode_stack(params, cfg, h, attend)
    return logits, acc.as_cache(cache.quantized), tuple(acc.recent)


# ---------------------------------------------------------------------------
# Initialization (ref: gpt.py:300-314 — normal(0.02), zeroed output head)
# ---------------------------------------------------------------------------


def init_params(key, cfg: GPTConfig, dtype=jnp.float32) -> Params:
    std = cfg.initializer_range
    keys = jax.random.split(key, 16)

    def normal(k, shape):
        return (jax.random.normal(k, shape) * std).astype(dtype)

    qkv_out = (cfg.n_head + 2 * cfg.kv_heads) * cfg.head_dim
    lk = jax.random.split(keys[0], 7)
    L, D, F = cfg.n_layer, cfg.dim, cfg.ffn_hidden_dim
    layers = {
        "attention_norm": jnp.ones((L, D), dtype),
        "ffn_norm": jnp.ones((L, D), dtype),
        "wqkv": normal(lk[0], (L, D, qkv_out)),
        "wo": normal(lk[1], (L, D, D)),
        "w1": normal(lk[2], (L, D, F)),
        "w2": normal(lk[3], (L, F, D)),
        "w3": normal(lk[4], (L, D, F)),
    }
    params: Params = {
        "tok_embeddings": normal(keys[1], (cfg.vocab_size, D)),
        "layers": layers,
        "norm": jnp.ones((D,), dtype),
        "output": jnp.zeros((D, cfg.vocab_size), dtype),
    }
    if cfg.model_type == "c2i":
        n_rows = cfg.num_classes + (1 if cfg.class_dropout_prob > 0 else 0)
        params["cls_embedding"] = {"embedding_table": normal(keys[2], (n_rows, D))}
    else:
        params["cls_embedding"] = {
            "fc1": {"kernel": normal(keys[3], (cfg.caption_dim, D))},
            "fc2": {"kernel": normal(keys[4], (D, D))},
            "uncond_embedding": (
                jax.random.normal(keys[5], (cfg.cls_token_num, cfg.caption_dim))
                / cfg.caption_dim ** 0.5).astype(dtype),
        }
    return params


def param_count(params: Params) -> int:
    return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
