"""GAN discriminators for VQ-VAE training (functional JAX, NHWC).

PatchGAN (pix2pix N-layer) mirrors
`/root/reference/tokenizer/tokenizer_image/discriminator_patchgan.py:8-67`;
StyleGAN2-style residual discriminator mirrors
`/root/reference/tokenizer/tokenizer_image/discriminator_stylegan.py:13-93`.

BatchNorm is expressed with on-the-fly batch statistics: under pjit with a
batch-sharded input, jnp.mean over the batch axis is a global mean — i.e.
SyncBatchNorm semantics fall out of GSPMD for free.
"""

from __future__ import annotations

from typing import Any, Dict, List

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, Any]


def _conv(params, x, *, stride=1, padding=1):
    y = jax.lax.conv_general_dilated(
        x, params["kernel"].astype(x.dtype), (stride, stride),
        [(padding, padding), (padding, padding)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if "bias" in params:
        y = y + params["bias"].astype(x.dtype)
    return y


def _leaky(x, slope=0.2):
    return jnp.where(x >= 0, x, slope * x)


def _batch_norm(params, x, eps=1e-5):
    """Train-mode batch statistics over (N, H, W)."""
    xf = x.astype(jnp.float32)
    mean = xf.mean(axis=(0, 1, 2))
    var = xf.var(axis=(0, 1, 2))
    xf = (xf - mean) * jax.lax.rsqrt(var + eps)
    return (xf * params["scale"] + params["bias"]).astype(x.dtype)


# ---------------------------------------------------------------------------
# PatchGAN
# ---------------------------------------------------------------------------


def patchgan_apply(params: Params, x: jnp.ndarray) -> jnp.ndarray:
    """NHWC image -> patch logits map [B, h, w, 1]."""
    h = _leaky(_conv(params["convs"][0], x, stride=2))
    n_mid = len(params["convs"]) - 2
    for i in range(1, n_mid):
        h = _leaky(_batch_norm(params["norms"][i - 1],
                               _conv(params["convs"][i], h, stride=2)))
    # penultimate: stride 1 + BN + leaky
    h = _leaky(_batch_norm(params["norms"][n_mid - 1],
                           _conv(params["convs"][n_mid], h, stride=1)))
    return _conv(params["convs"][n_mid + 1], h, stride=1)


def init_patchgan(key, input_nc=3, ndf=64, n_layers=3,
                  dtype=jnp.float32) -> Params:
    """Init matching the reference (normal 0.02 convs, BN scale normal(1,.02))."""
    keys = iter(jax.random.split(key, 32))

    def conv_init(cin, cout, bias=True):
        p = {"kernel": (jax.random.normal(next(keys), (4, 4, cin, cout))
                        * 0.02).astype(dtype)}
        if bias:
            p["bias"] = jnp.zeros((cout,), dtype)
        return p

    def bn_init(c):
        return {"scale": (1.0 + jax.random.normal(next(keys), (c,)) * 0.02
                          ).astype(jnp.float32),
                "bias": jnp.zeros((c,), jnp.float32)}

    convs: List[Params] = [conv_init(input_nc, ndf)]
    norms: List[Params] = []
    nf_mult_prev, nf_mult = 1, 1
    for n in range(1, n_layers):
        nf_mult_prev, nf_mult = nf_mult, min(2 ** n, 8)
        convs.append(conv_init(ndf * nf_mult_prev, ndf * nf_mult, bias=False))
        norms.append(bn_init(ndf * nf_mult))
    nf_mult_prev, nf_mult = nf_mult, min(2 ** n_layers, 8)
    convs.append(conv_init(ndf * nf_mult_prev, ndf * nf_mult, bias=False))
    norms.append(bn_init(ndf * nf_mult))
    convs.append(conv_init(ndf * nf_mult, 1))
    return {"convs": convs, "norms": norms}


# ---------------------------------------------------------------------------
# StyleGAN2-style discriminator
# ---------------------------------------------------------------------------

_STYLEGAN_CHANNELS = {4: 512, 8: 512, 16: 512, 32: 512, 64: 256, 128: 128,
                      256: 64, 512: 32, 1024: 16}


def _blur(x):
    """3x3 binomial blur, reflect padding (kornia filter2d semantics)."""
    f = jnp.array([1.0, 2.0, 1.0])
    k = (f[:, None] * f[None, :]) / 16.0
    c = x.shape[-1]
    kernel = jnp.zeros((3, 3, 1, c), x.dtype).at[:, :, 0, :].set(
        k[:, :, None].astype(x.dtype))
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")
    return jax.lax.conv_general_dilated(
        xp, kernel, (1, 1), "VALID", feature_group_count=c,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def stylegan_apply(params: Params, x: jnp.ndarray) -> jnp.ndarray:
    """NHWC image -> logits [B, 1]."""
    h = _leaky(_conv(params["conv_in"], x))
    for blk in params["blocks"]:
        res = _conv(blk["conv_res"], h, stride=2, padding=0)
        y = _leaky(_conv(blk["conv1"], h))
        y = _leaky(_conv(blk["conv2"], y))
        y = _conv(blk["down"], _blur(y), stride=2)
        h = (y + res) * (1.0 / np.sqrt(2.0))
    h = _leaky(_conv(params["final_conv"], h))
    h = h.reshape(h.shape[0], -1)
    h = _leaky(h @ params["fc1"]["kernel"].astype(h.dtype)
               + params["fc1"]["bias"].astype(h.dtype))
    return h @ params["fc2"]["kernel"].astype(h.dtype) + \
        params["fc2"]["bias"].astype(h.dtype)


def init_stylegan(key, input_nc=3, image_size=256, channel_multiplier=1,
                  dtype=jnp.float32) -> Params:
    ch = {k: (v * channel_multiplier if k >= 64 else v)
          for k, v in _STYLEGAN_CHANNELS.items()}
    keys = iter(jax.random.split(key, 64))

    def conv_init(kh, kw, cin, cout):
        fan_in = kh * kw * cin
        bound = float(np.sqrt(1.0 / fan_in))
        return {
            "kernel": jax.random.uniform(
                next(keys), (kh, kw, cin, cout), dtype,
                -np.sqrt(3.0) * bound, np.sqrt(3.0) * bound),
            "bias": jax.random.uniform(next(keys), (cout,), dtype,
                                       -bound, bound),
        }

    def fc_init(cin, cout):
        bound = float(np.sqrt(1.0 / cin))
        return {
            "kernel": jax.random.uniform(
                next(keys), (cin, cout), dtype,
                -np.sqrt(3.0) * bound, np.sqrt(3.0) * bound),
            "bias": jax.random.uniform(next(keys), (cout,), dtype,
                                       -bound, bound),
        }

    log_size = int(np.log2(image_size))
    in_ch = ch[image_size]
    params: Params = {"conv_in": conv_init(3, 3, input_nc, in_ch), "blocks": []}
    for i in range(log_size, 2, -1):
        out_ch = ch[2 ** (i - 1)]
        params["blocks"].append({
            "conv_res": conv_init(1, 1, in_ch, out_ch),
            "conv1": conv_init(3, 3, in_ch, out_ch),
            "conv2": conv_init(3, 3, out_ch, out_ch),
            "down": conv_init(3, 3, out_ch, out_ch),
        })
        in_ch = out_ch
    params["final_conv"] = conv_init(3, 3, in_ch, ch[4])
    params["fc1"] = fc_init(ch[4] * 4 * 4, ch[4])
    params["fc2"] = fc_init(ch[4], 1)
    return params


DISC_APPLY = {"patchgan": patchgan_apply, "stylegan": stylegan_apply}


def init_discriminator(key, disc_type="patchgan", image_size=256,
                       ndf=64, n_layers=3, input_nc=3, dtype=jnp.float32):
    if disc_type == "patchgan":
        return init_patchgan(key, input_nc, ndf, n_layers, dtype)
    if disc_type == "stylegan":
        return init_stylegan(key, input_nc, image_size, dtype=dtype)
    raise ValueError(f"unknown discriminator type {disc_type!r}")
