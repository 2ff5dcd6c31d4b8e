"""LPIPS perceptual loss (frozen VGG16 features + learned 1x1 heads).

Functional JAX port of the behavior of
`/root/reference/tokenizer/tokenizer_image/lpips.py:53-164`: scaling layer,
five VGG16 relu-slice features, channel-normalized squared diffs, 1x1 linear
heads, spatial average, summed over slices.

Weights: the learned lin heads ship with the reference repo
(`tokenizer_image/cache/vgg.pth` — 5 tensors) and are converted by
`convert_lpips_lins`; the VGG16 ImageNet backbone must be supplied as a
torchvision state dict (`convert_vgg16_features`). `init_params` gives a
random backbone for architecture tests when no weights are available.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, List, Mapping

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, Any]

# VGG16 feature config: conv channel sizes, 'M' = 2x2 maxpool
_VGG16_CFG = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
              512, 512, 512, "M", 512, 512, 512]
# relu indices (in conv-counting space) after which a slice ends:
# relu1_2, relu2_2, relu3_3, relu4_3, relu5_3
_SLICE_ENDS = [2, 4, 7, 10, 13]
# the same five slices as [lo, hi) ranges over _VGG16_CFG items, plus the
# conv-index offset at each slice start (for per-slice remat)
_SLICE_SEGMENTS = [(0, 2, 0), (2, 5, 2), (5, 9, 4), (9, 13, 7), (13, 17, 10)]
LPIPS_CHANNELS = [64, 128, 256, 512, 512]

_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def _conv(p, x):
    y = jax.lax.conv_general_dilated(
        x, p["kernel"].astype(x.dtype), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + p["bias"].astype(x.dtype)


def _maxpool(x):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID")


def _vgg_segment(convs, h: jnp.ndarray, lo: int, hi: int,
                 conv_i: int) -> jnp.ndarray:
    """One relu slice: _VGG16_CFG items [lo, hi) starting at conv index conv_i."""
    for item in _VGG16_CFG[lo:hi]:
        if item == "M":
            h = _maxpool(h)
        else:
            h = jax.nn.relu(_conv(convs[conv_i], h))
            conv_i += 1
    return h


def vgg_features(params: Params, x: jnp.ndarray,
                 remat: bool = False) -> List[jnp.ndarray]:
    """NHWC input -> 5 relu-slice feature maps (ref: lpips.py:118-155).

    remat=True checkpoints each relu slice, so a backward pass holds one
    slice's conv/maxpool internals at a time instead of the whole VGG's
    (the dominant HBM peak of the VQ-GAN train step at large batch: the
    full-VGG backward region staged ~20 256MB temps at batch 64/256px).
    Saved slice boundaries are exactly the 5 feature maps the loss needs
    anyway; recompute is the same HLO, so values are bit-identical.
    """
    feats = []
    h = x
    for lo, hi, conv_i in _SLICE_SEGMENTS:
        seg = partial(_vgg_segment, lo=lo, hi=hi, conv_i=conv_i)
        h = (jax.checkpoint(seg) if remat else seg)(params["convs"], h)
        feats.append(h)
    return feats


def lpips(params: Params, x: jnp.ndarray, y: jnp.ndarray,
          remat: bool = False) -> jnp.ndarray:
    """Perceptual distance per sample [B, 1, 1, 1] (ref: lpips.py:83-96).

    x, y: NHWC images in [-1, 1]. remat: see vgg_features.
    """
    def scale_in(img):
        return (img - _SHIFT.astype(img.dtype)) / _SCALE.astype(img.dtype)

    fx = vgg_features(params["vgg"], scale_in(x), remat=remat)
    fy = vgg_features(params["vgg"], scale_in(y), remat=remat)
    total = 0.0
    for k in range(len(fx)):
        nx = fx[k] / (jnp.sqrt(jnp.sum(fx[k] ** 2, axis=-1, keepdims=True)) + 1e-10)
        ny = fy[k] / (jnp.sqrt(jnp.sum(fy[k] ** 2, axis=-1, keepdims=True)) + 1e-10)
        diff = (nx - ny) ** 2
        w = params["lins"][k]["kernel"].astype(diff.dtype)  # [C, 1]
        val = diff @ w  # 1x1 conv, no bias
        total = total + jnp.mean(val, axis=(1, 2), keepdims=True)
    return total


def lpips_mean(params: Params, x: jnp.ndarray, y: jnp.ndarray,
               remat: bool = False) -> jnp.ndarray:
    return jnp.mean(lpips(params, x, y, remat=remat))


# ---------------------------------------------------------------------------
# Weights
# ---------------------------------------------------------------------------


def convert_vgg16_features(sd: Mapping[str, np.ndarray]) -> Params:
    """torchvision vgg16 `features.*` state dict -> our conv list.

    Accepts either `features.{i}.weight` (torchvision) or `slice{k}.{i}.weight`
    (the reference's sliced wrapper) key styles.
    """
    convs = []
    # torchvision layer indices of the 13 convs in vgg16.features
    tv_idx = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
    for i in tv_idx:
        w = None
        for key in (f"features.{i}.weight", f"{i}.weight"):
            if key in sd:
                w = np.asarray(sd[key])
                b = np.asarray(sd[key.replace("weight", "bias")])
                break
        if w is None:
            # reference slice naming: slice{n}.{i}.weight with global torch idx
            for n in range(1, 6):
                key = f"slice{n}.{i}.weight"
                if key in sd:
                    w = np.asarray(sd[key])
                    b = np.asarray(sd[key.replace("weight", "bias")])
                    break
        assert w is not None, f"conv {i} not found in vgg state dict"
        convs.append({"kernel": np.transpose(w, (2, 3, 1, 0)), "bias": b})
    return {"convs": convs}


def convert_lpips_lins(sd: Mapping[str, np.ndarray]) -> List[Params]:
    """Reference cache/vgg.pth (lin heads) -> our lin list [5 x {kernel [C,1]}]."""
    lins = []
    for k in range(5):
        w = np.asarray(sd[f"lin{k}.model.1.weight"])  # [1, C, 1, 1]
        lins.append({"kernel": np.transpose(w[:, :, 0, 0], (1, 0))})
    return lins


def load_params(vgg_state_dict, lins_state_dict) -> Params:
    return {"vgg": convert_vgg16_features(vgg_state_dict),
            "lins": convert_lpips_lins(lins_state_dict)}


def init_params(key, dtype=jnp.float32) -> Params:
    """Random backbone + uniform-positive lin heads (tests / no-weights)."""
    keys = iter(jax.random.split(key, 32))
    convs = []
    cin = 3
    for item in _VGG16_CFG:
        if item == "M":
            continue
        fan_in = 9 * cin
        bound = float(np.sqrt(1.0 / fan_in))
        convs.append({
            "kernel": jax.random.uniform(
                next(keys), (3, 3, cin, item), dtype,
                -np.sqrt(3.0) * bound, np.sqrt(3.0) * bound),
            "bias": jnp.zeros((item,), dtype)})
        cin = item
    lins = [{"kernel": jnp.abs(jax.random.normal(next(keys), (c, 1))) * 0.1}
            for c in LPIPS_CHANNELS]
    return {"vgg": {"convs": convs}, "lins": lins}
