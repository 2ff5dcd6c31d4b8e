"""Consistency decoder (openai/consistency-decoder) — the second
baseline-tokenizer comparison model.

JAX implementation of the decoder the reference compares against through
diffusers (`/root/reference/tokenizer/consistencydecoder/
reconstruction_cd_ddp.py:97`, `cd_demo.py:16`): OpenAI's distilled
consistency model that replaces the SD-VAE conv decoder. Architecture
follows the published `ConvUNetVAE` of the openai/consistencydecoder
repository: a conv-only (attention-free) guided-diffusion U-Net —
learned 1024-entry timestep embedding + MLP, scale-shift time
conditioning in every ConvResblock, skip concatenations, channels
320·(1,1,2,3,4)-ish per stage (configurable) — driven by a 2-step
consistency sampler in the standard VP parameterization
(c_skip/c_out/c_in with sigma_data = 0.5, cosine alpha-bar schedule).

The ENCODER side of the comparison is the SD-VAE encoder
(models/klvae.py) exactly as diffusers' ConsistencyDecoderVAE composes
them. Weights-gated like CLIP/LPIPS: load a local checkpoint in the
openai `ConvUNetVAE` state-dict layout through
`utils.convert.convert_consistency_decoder`; conversion math is
oracle-tested against an in-repo torch mirror
(`tests/test_consistency_decoder.py`). End-to-end fidelity against the
released weights requires the weights themselves (absent here — zero
egress); the sampler's schedule constants are parameters so they can be
pinned to the released model's exact distillation grid when loaded.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, Any]


@dataclass(frozen=True)
class CDConfig:
    in_channels: int = 7          # 3 noisy image + 4 nearest-up latent
    base_ch: int = 320
    ch_mult: Tuple[int, ...] = (1, 1, 2, 3, 4)
    layers_per_block: int = 3
    time_embed_dim: int = 1280
    n_timesteps: int = 1024
    sigma_data: float = 0.5
    latent_scale: int = 8         # nearest-upsample factor of the latent


# ---------------------------------------------------------------------------
# U-Net apply
# ---------------------------------------------------------------------------


def _conv(p, x, stride=1):
    # torch Conv2d(padding=1) semantics: symmetric (1,1) pad even at
    # stride 2 (XLA "SAME" would pad (0,1) there)
    kh = p["kernel"].shape[0]
    pad = "SAME" if stride == 1 else [(kh // 2, kh // 2)] * 2
    return jax.lax.conv_general_dilated(
        x, p["kernel"].astype(x.dtype), (stride, stride), pad,
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + p["bias"].astype(x.dtype)


def _gn(p, x, eps=1e-5):
    b, h, w, c = x.shape
    g = 32
    xg = x.reshape(b, h, w, g, c // g).astype(jnp.float32)
    mean = xg.mean(axis=(1, 2, 4), keepdims=True)
    var = xg.var(axis=(1, 2, 4), keepdims=True)
    xg = (xg - mean) * jax.lax.rsqrt(var + eps)
    out = xg.reshape(b, h, w, c) * p["scale"] + p["bias"]
    return out.astype(x.dtype)


def _silu(x):
    return jax.nn.silu(x)


def _resblock(p: Params, x: jnp.ndarray, temb: jnp.ndarray) -> jnp.ndarray:
    """ConvResblock with scale-shift conditioning:
    h = conv1(silu(gn1(x))); h = gn2(h)·(1+t_s) + t_b; h = conv2(silu(h));
    out = h + skip(x)."""
    skip = x if "skip" not in p else _conv(p["skip"], x)
    t = _silu(temb) @ p["f_t"]["kernel"].astype(temb.dtype) \
        + p["f_t"]["bias"].astype(temb.dtype)
    t_scale, t_shift = jnp.split(t, 2, axis=-1)
    h = _conv(p["conv1"], _silu(_gn(p["gn1"], x)))
    h = _gn(p["gn2"], h) * (1.0 + t_scale[:, None, None, :]) \
        + t_shift[:, None, None, :]
    h = _conv(p["conv2"], _silu(h))
    return h + skip


def unet_apply(params: Params, x: jnp.ndarray, t: jnp.ndarray,
               cfg: CDConfig) -> jnp.ndarray:
    """x [B,H,W,in_channels] (noisy image ‖ upsampled latent), t [B] int
    timesteps -> eps/x0-parameterized output [B,H,W,3]."""
    temb = params["embed_time"]["table"][t]                    # [B, 320]
    temb = temb @ params["embed_time"]["f1"]["kernel"] \
        + params["embed_time"]["f1"]["bias"]
    temb = _silu(temb)
    temb = temb @ params["embed_time"]["f2"]["kernel"] \
        + params["embed_time"]["f2"]["bias"]                   # [B, 1280]
    temb = temb.astype(x.dtype)

    h = _conv(params["embed_image"], x)
    skips = [h]
    for i, level in enumerate(params["down"]):
        for blk in level["res"]:
            h = _resblock(blk, h, temb)
            skips.append(h)
        if "down" in level:
            h = _conv(level["down"], h, stride=2)
            skips.append(h)
    for blk in params["mid"]:
        h = _resblock(blk, h, temb)
    for i, level in enumerate(params["up"]):
        for blk in level["res"]:
            h = jnp.concatenate([h, skips.pop()], axis=-1)
            h = _resblock(blk, h, temb)
        if "up" in level:
            h = jnp.repeat(jnp.repeat(h, 2, axis=1), 2, axis=2)
            h = _conv(level["up"], h)
    assert not skips
    return _conv(params["output"]["f"],
                 _silu(_gn(params["output"]["gn"], h)))


# ---------------------------------------------------------------------------
# Consistency sampling (VP parameterization, Song et al. 2023)
# ---------------------------------------------------------------------------


def schedule_tables(cfg: CDConfig):
    """Cosine alpha-bar schedule + consistency c_skip/c_out/c_in tables."""
    n = cfg.n_timesteps
    ab = np.array([math.cos((i / n + 0.008) / 1.008 * math.pi / 2) ** 2
                   for i in range(n + 1)])
    betas = np.clip(1.0 - ab[1:] / ab[:-1], 0, 0.999)
    acum = np.cumprod(1.0 - betas)
    sqrt_acum = np.sqrt(acum)
    sqrt_1m = np.sqrt(1.0 - acum)
    sigmas = sqrt_1m / sqrt_acum
    sd = cfg.sigma_data
    c_skip = (1.0 / sqrt_acum) * sd ** 2 / (sigmas ** 2 + sd ** 2)
    c_out = sigmas * sd / np.sqrt(sigmas ** 2 + sd ** 2)
    c_in = (1.0 / sqrt_acum) / np.sqrt(sigmas ** 2 + sd ** 2)
    return {k: jnp.asarray(v, jnp.float32)
            for k, v in dict(sqrt_acum=sqrt_acum, sqrt_1m=sqrt_1m,
                             c_skip=c_skip, c_out=c_out, c_in=c_in).items()}


def decode_latent(params: Params, latent: jnp.ndarray, cfg: CDConfig,
                  rng: jax.Array,
                  timesteps: Sequence[int] = (1008, 512)) -> jnp.ndarray:
    """2-step consistency decode: latent [B,h,w,4] -> image [B,H,W,3] in
    [-1, 1]. `timesteps` defaults to the 64-step distillation grid's
    (1.0, 0.5) schedule points; pin to the released model's exact grid
    when loading real weights."""
    tabs = schedule_tables(cfg)
    b, h, w, _ = latent.shape
    hh, ww = h * cfg.latent_scale, w * cfg.latent_scale
    lat_up = jnp.repeat(jnp.repeat(latent, cfg.latent_scale, axis=1),
                        cfg.latent_scale, axis=2)

    rng, r0 = jax.random.split(rng)
    t0 = timesteps[0]
    x = jax.random.normal(r0, (b, hh, ww, 3), jnp.float32) \
        * tabs["sqrt_1m"][t0]
    for i, t in enumerate(timesteps):
        tt = jnp.full((b,), t, jnp.int32)
        inp = jnp.concatenate(
            [x * tabs["c_in"][t], lat_up.astype(x.dtype)], axis=-1)
        out = unet_apply(params, inp, tt, cfg).astype(jnp.float32)
        x0 = jnp.clip(tabs["c_out"][t] * out + tabs["c_skip"][t] * x,
                      -1.0, 1.0)
        if i + 1 < len(timesteps):
            t_next = timesteps[i + 1]
            rng, ri = jax.random.split(rng)
            x = x0 * tabs["sqrt_acum"][t_next] \
                + jax.random.normal(ri, x0.shape, x0.dtype) \
                * tabs["sqrt_1m"][t_next]
    return x0


def roundtrip(vae_params: Params, cd_params: Params, x: jnp.ndarray,
              vae_cfg, cd_cfg: CDConfig, rng: jax.Array) -> jnp.ndarray:
    """SD-VAE encode -> consistency decode (diffusers
    ConsistencyDecoderVAE composition; ref cd_demo.py:37-39)."""
    from llamagen_tpu.models import klvae

    mean, logvar = klvae.encode(vae_params, x, vae_cfg)
    rng, r = jax.random.split(rng)
    z = klvae.sample(r, mean, logvar)
    return decode_latent(cd_params, z, cd_cfg, rng)


# ---------------------------------------------------------------------------
# init (tests / random-weight rigs)
# ---------------------------------------------------------------------------


def init_params(key, cfg: CDConfig, dtype=jnp.float32) -> Params:
    kit = iter(jax.random.split(key, 512))

    def conv(cin, cout, k=3):
        kk = next(kit)
        fan = cin * k * k
        return {"kernel": (jax.random.normal(kk, (k, k, cin, cout))
                           / math.sqrt(fan)).astype(dtype),
                "bias": jnp.zeros((cout,), dtype)}

    def lin(cin, cout):
        kk = next(kit)
        return {"kernel": (jax.random.normal(kk, (cin, cout))
                           / math.sqrt(cin)).astype(dtype),
                "bias": jnp.zeros((cout,), dtype)}

    def gn(c):
        return {"scale": jnp.ones((c,), dtype), "bias": jnp.zeros((c,), dtype)}

    def res(cin, cout):
        p = {"f_t": lin(cfg.time_embed_dim, 2 * cout),
             "gn1": gn(cin), "conv1": conv(cin, cout),
             "gn2": gn(cout), "conv2": conv(cout, cout)}
        if cin != cout:
            p["skip"] = conv(cin, cout, k=1)
        return p

    chs = [cfg.base_ch * m for m in cfg.ch_mult]
    params: Params = {
        "embed_image": conv(cfg.in_channels, chs[0]),
        "embed_time": {
            "table": (jax.random.normal(next(kit),
                                        (cfg.n_timesteps, cfg.base_ch))
                      * 0.02).astype(dtype),
            "f1": lin(cfg.base_ch, cfg.time_embed_dim),
            "f2": lin(cfg.time_embed_dim, cfg.time_embed_dim),
        },
    }
    down = []
    cin = chs[0]
    for i, c in enumerate(chs):
        level = {"res": []}
        for _ in range(cfg.layers_per_block):
            level["res"].append(res(cin, c))
            cin = c
        if i != len(chs) - 1:
            level["down"] = conv(c, c)
        down.append(level)
    params["down"] = down
    params["mid"] = [res(cin, cin), res(cin, cin)]
    up = []
    for i, c in reversed(list(enumerate(chs))):
        level = {"res": []}
        for j in range(cfg.layers_per_block + 1):
            # skip channels: first `layers` pops are this stage's res
            # outputs (c_i); the last pop is the PREVIOUS stage's
            # downsample output (c_{i-1}), or embed_image's c_0 at the top
            if j == cfg.layers_per_block:
                skip_c = chs[i - 1] if i > 0 else chs[0]
            else:
                skip_c = c
            level["res"].append(res(cin + skip_c, c))
            cin = c
        if i != 0:
            level["up"] = conv(c, c)
        up.append(level)
    params["up"] = up
    params["output"] = {"gn": gn(chs[0]), "f": conv(chs[0], 3)}
    return params
