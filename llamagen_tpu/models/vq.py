"""TPU-native VQ-VAE image tokenizer.

Re-implements the behavior of the reference VQModel
(`/root/reference/tokenizer/tokenizer_image/vq_model.py`) as pure JAX
functions over a params pytree, in NHWC layout (TPU conv-friendly).

Numerics intentionally match the reference so released checkpoints give
bit-identical token ids after weight conversion:
  - GroupNorm(32, eps=1e-6)                      (vq_model.py:359-362)
  - swish nonlinearity x*sigmoid(x)              (vq_model.py:354-356)
  - Downsample: asymmetric (0,1,0,1) pad + 3x3 stride-2 VALID conv
                                                 (vq_model.py:381-396)
  - Upsample: nearest x2 + 3x3 SAME conv         (vq_model.py:367-378)
  - single-head conv-1x1 attention at the lowest resolution with 1/sqrt(C)
    scaling                                      (vq_model.py:317-351)
  - L2-normalized codebook, argmin of ||z - e||^2 via the expanded
    z^2 + e^2 - 2 z.e form                        (vq_model.py:221-232)
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from llamagen_tpu.config import VQConfig

Params = Dict[str, Any]


# ---------------------------------------------------------------------------
# Primitive layers (NHWC)
# ---------------------------------------------------------------------------


def conv2d(params: Params, x: jnp.ndarray, *, stride: int = 1,
           padding="SAME") -> jnp.ndarray:
    """3x3/1x1 conv, NHWC x HWIO -> NHWC."""
    y = jax.lax.conv_general_dilated(
        x, params["kernel"].astype(x.dtype),
        window_strides=(stride, stride),
        padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y + params["bias"].astype(x.dtype)


def dense(params: Params, x: jnp.ndarray) -> jnp.ndarray:
    """Pointwise linear. kernel: [in, out]."""
    y = x @ params["kernel"].astype(x.dtype)
    if "bias" in params:
        y = y + params["bias"].astype(x.dtype)
    return y


def group_norm(params: Params, x: jnp.ndarray, *, num_groups: int = 32,
               eps: float = 1e-6) -> jnp.ndarray:
    """GroupNorm over channel groups, NHWC. Stats in f32."""
    b, h, w, c = x.shape
    xf = x.astype(jnp.float32).reshape(b, h, w, num_groups, c // num_groups)
    mean = xf.mean(axis=(1, 2, 4), keepdims=True)
    var = ((xf - mean) ** 2).mean(axis=(1, 2, 4), keepdims=True)
    xf = (xf - mean) * jax.lax.rsqrt(var + eps)
    xf = xf.reshape(b, h, w, c)
    out = xf * params["scale"].astype(jnp.float32) + params["bias"].astype(jnp.float32)
    return out.astype(x.dtype)


def swish(x: jnp.ndarray) -> jnp.ndarray:
    return x * jax.nn.sigmoid(x)


# ---------------------------------------------------------------------------
# Blocks
# ---------------------------------------------------------------------------


def resnet_block(params: Params, x: jnp.ndarray, dropout_p: float = 0.0,
                 rng=None) -> jnp.ndarray:
    """Pre-norm residual conv block (ref: vq_model.py:279-314).

    rng + dropout_p > 0 (training): dropout between the second swish and
    conv2, exactly the reference's placement (vq_model.py:306). The rng
    is a deterministic fold of the step rng, so a remat recompute
    regenerates the identical mask."""
    h = group_norm(params["norm1"], x)
    h = swish(h)
    h = conv2d(params["conv1"], h)
    h = group_norm(params["norm2"], h)
    h = swish(h)
    if rng is not None and dropout_p > 0:
        keep = jax.random.bernoulli(rng, 1.0 - dropout_p, h.shape)
        h = jnp.where(keep, h / (1.0 - dropout_p), 0.0).astype(h.dtype)
    h = conv2d(params["conv2"], h)
    if "nin_shortcut" in params:
        x = dense(params["nin_shortcut"], x)
    return x + h


def attn_block(params: Params, x: jnp.ndarray) -> jnp.ndarray:
    """Single-head self-attention over spatial positions (ref: vq_model.py:317-351).

    The reference uses 1x1 convs for q/k/v/proj; we store them as dense
    [C, C] kernels and run attention on [B, HW, C] — a plain MXU matmul chain.
    """
    b, h, w, c = x.shape
    hn = group_norm(params["norm"], x).reshape(b, h * w, c)
    q = dense(params["q"], hn)
    k = dense(params["k"], hn)
    v = dense(params["v"], hn)
    attn = jnp.einsum("bqc,bkc->bqk", q, k,
                      preferred_element_type=jnp.float32) * (c ** -0.5)
    attn = jax.nn.softmax(attn, axis=-1).astype(x.dtype)
    out = jnp.einsum("bqk,bkc->bqc", attn, v)
    out = dense(params["proj_out"], out).reshape(b, h, w, c)
    return x + out


def downsample(params: Params, x: jnp.ndarray) -> jnp.ndarray:
    """Asymmetric-pad stride-2 conv (ref: vq_model.py:381-396)."""
    x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
    return conv2d(params["conv"], x, stride=2, padding="VALID")


def upsample(params: Params, x: jnp.ndarray) -> jnp.ndarray:
    """Nearest x2 upsample + conv (ref: vq_model.py:367-378)."""
    x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
    return conv2d(params["conv"], x)


# ---------------------------------------------------------------------------
# Encoder / Decoder
# ---------------------------------------------------------------------------


def _res_runner(cfg: VQConfig, remat: bool, rng):
    """(res_f, attn_f) with per-call dropout-rng folding: call i of res_f
    derives fold_in(rng, i) so every block gets an independent,
    deterministic mask (remat replays the same operands -> same mask).
    dropout_p is bound STATICALLY (partial, not an operand) — a traced
    p would fail resnet_block's `> 0` gate under jax.checkpoint."""
    p_drop = cfg.dropout_p if rng is not None else 0.0
    block = partial(resnet_block, dropout_p=p_drop)
    res_0 = jax.checkpoint(block) if remat else block
    attn_f = jax.checkpoint(attn_block) if remat else attn_block
    counter = [0]

    def res_f(p, h):
        i = counter[0]
        counter[0] += 1
        r = None if rng is None else jax.random.fold_in(rng, i)
        return res_0(p, h, rng=r)

    return res_f, attn_f


def encoder_apply(params: Params, x: jnp.ndarray, cfg: VQConfig,
                  remat: bool = False, rng=None) -> jnp.ndarray:
    """Conv encoder NHWC [B,H,W,3] -> [B,h,w,z_channels] (ref: vq_model.py:64-124).

    remat=True checkpoints each resnet/attn block for training: only block
    INPUTS are saved for the backward pass instead of the ~6 internal
    full-resolution temps per block (the 256px f32 step OOMs 16 GB HBM at
    batch 32 without this). Recompute is deterministic — same HLO — so
    losses are bit-identical to the no-remat program.
    rng: training dropout key (cfg.dropout_p inside each res block).
    """
    res_f, attn_f = _res_runner(cfg, remat, rng)
    num_res = len(cfg.encoder_ch_mult)
    h = conv2d(params["conv_in"], x)
    for i_level in range(num_res):
        level = params["down"][i_level]
        for i_block in range(cfg.num_res_blocks):
            h = res_f(level["res"][i_block], h)
            if i_level == num_res - 1:
                h = attn_f(level["attn"][i_block], h)
        if i_level != num_res - 1:
            h = downsample(level["downsample"], h)
    h = res_f(params["mid"][0], h)
    h = attn_f(params["mid"][1], h)
    h = res_f(params["mid"][2], h)
    h = group_norm(params["norm_out"], h)
    h = swish(h)
    return conv2d(params["conv_out"], h)


def decoder_apply(params: Params, z: jnp.ndarray, cfg: VQConfig,
                  remat: bool = False, rng=None) -> jnp.ndarray:
    """Conv decoder NHWC [B,h,w,z_channels] -> [B,H,W,3] (ref: vq_model.py:128-194).

    remat: checkpoint each block; rng: training dropout (see encoder_apply)."""
    res_f, attn_f = _res_runner(cfg, remat, rng)
    num_res = len(cfg.decoder_ch_mult)
    h = conv2d(params["conv_in"], z)
    h = res_f(params["mid"][0], h)
    h = attn_f(params["mid"][1], h)
    h = res_f(params["mid"][2], h)
    # `up` is stored in application order (highest level first, ref iterates
    # reversed(range(num_resolutions)) at construction and then forward in order)
    for i_level in range(num_res):
        level = params["up"][i_level]
        for i_block in range(cfg.num_res_blocks + 1):
            h = res_f(level["res"][i_block], h)
            if i_level == 0:
                h = attn_f(level["attn"][i_block], h)
        if i_level != num_res - 1:
            h = upsample(level["upsample"], h)
    h = group_norm(params["norm_out"], h)
    h = swish(h)
    return conv2d(params["conv_out"], h)


# ---------------------------------------------------------------------------
# Vector quantizer
# ---------------------------------------------------------------------------


def _normalized_codebook(params: Params, cfg: VQConfig) -> jnp.ndarray:
    emb = params["codebook"].astype(jnp.float32)
    if cfg.codebook_l2_norm:
        emb = emb / jnp.linalg.norm(emb, axis=-1, keepdims=True)
    return emb


def quantize(params: Params, z: jnp.ndarray, cfg: VQConfig,
             train: bool = False):
    """Nearest-codebook quantization with straight-through estimator.

    z: [B, h, w, e_dim] (already projected by quant_conv). Returns
    (z_q [B,h,w,e_dim], losses dict, indices [B,h,w]).
    Ref: vq_model.py:215-259.
    """
    zf = z.astype(jnp.float32)
    if cfg.codebook_l2_norm:
        zf = zf / jnp.linalg.norm(zf, axis=-1, keepdims=True)
    emb = _normalized_codebook(params, cfg)

    flat = zf.reshape(-1, cfg.codebook_embed_dim)
    # ||z - e||^2 = z^2 + e^2 - 2 z.e  (expanded form, matches ref argmin ties)
    d = (jnp.sum(flat ** 2, axis=1, keepdims=True)
         + jnp.sum(emb ** 2, axis=1)
         - 2.0 * flat @ emb.T)
    idx = jnp.argmin(d, axis=1)
    z_q = emb[idx].reshape(zf.shape)

    losses = {}
    if train:
        vq_loss = jnp.mean((z_q - jax.lax.stop_gradient(zf)) ** 2)
        commit_loss = cfg.commit_loss_beta * jnp.mean(
            (jax.lax.stop_gradient(z_q) - zf) ** 2)
        entropy_loss = cfg.entropy_loss_ratio * compute_entropy_loss(-d)
        losses = {"vq": vq_loss, "commit": commit_loss, "entropy": entropy_loss}

    # straight-through estimator (ref: vq_model.py:254)
    z_q = zf + jax.lax.stop_gradient(z_q - zf)
    return z_q.astype(z.dtype), losses, idx.reshape(z.shape[:-1])


def compute_entropy_loss(affinity: jnp.ndarray, temperature: float = 0.01) -> jnp.ndarray:
    """Codebook-entropy regularizer (ref: vq_model.py:399-412)."""
    flat = affinity.reshape(-1, affinity.shape[-1]) / temperature
    probs = jax.nn.softmax(flat, axis=-1)
    log_probs = jax.nn.log_softmax(flat + 1e-5, axis=-1)
    avg_probs = jnp.mean(probs, axis=0)
    avg_entropy = -jnp.sum(avg_probs * jnp.log(avg_probs + 1e-5))
    sample_entropy = -jnp.mean(jnp.sum(probs * log_probs, axis=-1))
    return sample_entropy - avg_entropy


def codebook_lookup(params: Params, indices: jnp.ndarray, cfg: VQConfig) -> jnp.ndarray:
    """indices [...] -> embeddings [..., e_dim] from the (normalized) codebook.

    Ref: vq_model.py:261-276 (`get_codebook_entry`).
    """
    emb = _normalized_codebook(params, cfg)
    return emb[indices]


# ---------------------------------------------------------------------------
# Full model
# ---------------------------------------------------------------------------


def encode(params: Params, x: jnp.ndarray, cfg: VQConfig, train: bool = False,
           remat: bool = False, rng=None):
    """Image NHWC [B,H,W,3] in [-1,1] -> (z_q, losses, indices [B,h,w]).

    rng: training dropout key (used only when cfg.dropout_p > 0)."""
    h = encoder_apply(params["encoder"], x, cfg, remat=remat,
                      rng=rng if train and cfg.dropout_p > 0 else None)
    h = conv2d(params["quant_conv"], h)
    return quantize(params["quantize"], h, cfg, train=train)


def decode(params: Params, z_q: jnp.ndarray, cfg: VQConfig,
           remat: bool = False, rng=None) -> jnp.ndarray:
    """Quantized latents [B,h,w,e_dim] -> image NHWC [B,H,W,3].

    rng: training dropout key (training steps only; samplers omit it)."""
    h = conv2d(params["post_quant_conv"], z_q)
    return decoder_apply(params["decoder"], h, cfg, remat=remat,
                         rng=rng if cfg.dropout_p > 0 else None)


def decode_code(params: Params, indices: jnp.ndarray, cfg: VQConfig) -> jnp.ndarray:
    """Token ids [B,h,w] -> image NHWC. Ref: vq_model.py:52-55."""
    z_q = codebook_lookup(params["quantize"], indices, cfg)
    return decode(params, z_q.astype(params["post_quant_conv"]["kernel"].dtype), cfg)


def forward(params: Params, x: jnp.ndarray, cfg: VQConfig, train: bool = True):
    """Full autoencode pass -> (reconstruction, codebook losses, indices)."""
    z_q, losses, idx = encode(params, x, cfg, train=train)
    rec = decode(params, z_q, cfg)
    return rec, losses, idx


# jitted single-purpose entry points
tokenize = jax.jit(
    lambda params, x, cfg: encode(params, x, cfg, train=False)[2],
    static_argnames=("cfg",))
detokenize = jax.jit(decode_code, static_argnames=("cfg",))


# ---------------------------------------------------------------------------
# Initialization
# ---------------------------------------------------------------------------


def _conv_init(key, kh, kw, cin, cout, dtype=jnp.float32) -> Params:
    # Kaiming-uniform fan_in (torch Conv2d default), bias uniform 1/sqrt(fan_in)
    k1, k2 = jax.random.split(key)
    fan_in = kh * kw * cin
    bound = float(np.sqrt(1.0 / fan_in))
    kernel = jax.random.uniform(
        k1, (kh, kw, cin, cout), dtype, -np.sqrt(3.0) * bound, np.sqrt(3.0) * bound)
    bias = jax.random.uniform(k2, (cout,), dtype, -bound, bound)
    return {"kernel": kernel, "bias": bias}


def _dense_init(key, cin, cout, dtype=jnp.float32, bias=True) -> Params:
    k1, k2 = jax.random.split(key)
    bound = float(np.sqrt(1.0 / cin))
    p = {"kernel": jax.random.uniform(
        k1, (cin, cout), dtype, -np.sqrt(3.0) * bound, np.sqrt(3.0) * bound)}
    if bias:
        p["bias"] = jax.random.uniform(k2, (cout,), dtype, -bound, bound)
    return p


def _gn_init(c, dtype=jnp.float32) -> Params:
    return {"scale": jnp.ones((c,), dtype), "bias": jnp.zeros((c,), dtype)}


def _res_init(key, cin, cout, dtype=jnp.float32) -> Params:
    ks = jax.random.split(key, 3)
    p = {
        "norm1": _gn_init(cin, dtype),
        "conv1": _conv_init(ks[0], 3, 3, cin, cout, dtype),
        "norm2": _gn_init(cout, dtype),
        "conv2": _conv_init(ks[1], 3, 3, cout, cout, dtype),
    }
    if cin != cout:
        p["nin_shortcut"] = _dense_init(ks[2], cin, cout, dtype)
    return p


def _attn_init(key, c, dtype=jnp.float32) -> Params:
    ks = jax.random.split(key, 4)
    return {
        "norm": _gn_init(c, dtype),
        "q": _dense_init(ks[0], c, c, dtype),
        "k": _dense_init(ks[1], c, c, dtype),
        "v": _dense_init(ks[2], c, c, dtype),
        "proj_out": _dense_init(ks[3], c, c, dtype),
    }


def init_encoder(key, cfg: VQConfig, dtype=jnp.float32) -> Params:
    ch, num_res = cfg.ch, len(cfg.encoder_ch_mult)
    keys = iter(jax.random.split(key, 256))
    in_mult = (1,) + tuple(cfg.encoder_ch_mult)
    p: Params = {"conv_in": _conv_init(next(keys), 3, 3, 3, ch, dtype), "down": []}
    for i_level in range(num_res):
        block_in = ch * in_mult[i_level]
        block_out = ch * cfg.encoder_ch_mult[i_level]
        level: Params = {"res": [], "attn": []}
        for _ in range(cfg.num_res_blocks):
            level["res"].append(_res_init(next(keys), block_in, block_out, dtype))
            block_in = block_out
            if i_level == num_res - 1:
                level["attn"].append(_attn_init(next(keys), block_in, dtype))
        if i_level != num_res - 1:
            level["downsample"] = {"conv": _conv_init(next(keys), 3, 3, block_in, block_in, dtype)}
        p["down"].append(level)
    p["mid"] = [
        _res_init(next(keys), block_in, block_in, dtype),
        _attn_init(next(keys), block_in, dtype),
        _res_init(next(keys), block_in, block_in, dtype),
    ]
    p["norm_out"] = _gn_init(block_in, dtype)
    p["conv_out"] = _conv_init(next(keys), 3, 3, block_in, cfg.z_channels, dtype)
    return p


def init_decoder(key, cfg: VQConfig, dtype=jnp.float32) -> Params:
    ch, num_res = cfg.ch, len(cfg.decoder_ch_mult)
    keys = iter(jax.random.split(key, 256))
    block_in = ch * cfg.decoder_ch_mult[num_res - 1]
    p: Params = {"conv_in": _conv_init(next(keys), 3, 3, cfg.z_channels, block_in, dtype)}
    p["mid"] = [
        _res_init(next(keys), block_in, block_in, dtype),
        _attn_init(next(keys), block_in, dtype),
        _res_init(next(keys), block_in, block_in, dtype),
    ]
    p["up"] = []
    for i_level in reversed(range(num_res)):
        block_out = ch * cfg.decoder_ch_mult[i_level]
        level: Params = {"res": [], "attn": []}
        for _ in range(cfg.num_res_blocks + 1):
            level["res"].append(_res_init(next(keys), block_in, block_out, dtype))
            block_in = block_out
            if i_level == num_res - 1:
                level["attn"].append(_attn_init(next(keys), block_in, dtype))
        if i_level != 0:
            level["upsample"] = {"conv": _conv_init(next(keys), 3, 3, block_in, block_in, dtype)}
        p["up"].append(level)
    p["norm_out"] = _gn_init(block_in, dtype)
    p["conv_out"] = _conv_init(next(keys), 3, 3, block_in, 3, dtype)
    return p


def init_params(key, cfg: VQConfig, dtype=jnp.float32) -> Params:
    k_enc, k_dec, k_q, k_cb, k_pq = jax.random.split(key, 5)
    codebook = jax.random.uniform(
        k_cb, (cfg.codebook_size, cfg.codebook_embed_dim), jnp.float32,
        -1.0 / cfg.codebook_size, 1.0 / cfg.codebook_size)
    if cfg.codebook_l2_norm:
        codebook = codebook / jnp.linalg.norm(codebook, axis=-1, keepdims=True)
    return {
        "encoder": init_encoder(k_enc, cfg, dtype),
        "decoder": init_decoder(k_dec, cfg, dtype),
        "quant_conv": _conv_init(k_q, 1, 1, cfg.z_channels, cfg.codebook_embed_dim, dtype),
        "post_quant_conv": _conv_init(k_pq, 1, 1, cfg.codebook_embed_dim, cfg.z_channels, dtype),
        "quantize": {"codebook": codebook.astype(dtype)},
    }
