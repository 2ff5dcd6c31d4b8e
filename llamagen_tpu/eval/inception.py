"""InceptionV3 feature extractor for FID/IS, in functional JAX.

JAX port of the network behind the reference's evaluation suite
(`/root/reference/evaluations/c2i/evaluator.py` uses the TF1 frozen graph;
this implementation follows the pytorch-fid port of the same 2015 weights —
BasicConv2d = conv + BN(eps=1e-3), FID-variant average pools with
count_include_pad=False, 1008-way logits).

Weights: supply the pytorch-fid state dict
(`pt_inception-2015-12-05-6726825d.pth`) to `FeatureExtractor`; without
weights a random-init network is used (architecture/shape tests only —
metric values are then meaningless).

Comparability caveat: the reference's published FID table is computed with
the ADM suite's TF1 frozen graph (`evaluator.py:16-24`); the pytorch-fid
port followed here is the same 2015 weights but is known to yield slightly
different absolute FID values (resize kernels + pooling edge handling
differ at the ~0.01-0.05 FID level on ImageNet-scale sets). Numbers from
this harness are self-consistent and comparable to the large pytorch-fid
literature, but a direct digit-for-digit comparison against the
reference's README table carries that backend delta; quantify it with real
weights before publishing cross-framework tables (see PARITY.md).

Outputs per image batch:
  pool3   [N, 2048]  — FID features
  spatial [N, 7*17*17] — first 7 channels of Mixed_6e (sFID features,
                          mirroring the ADM suite's mixed_6/conv choice)
  logits  [N, 1008]   — for Inception Score
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, Any]


def _conv_bn(p: Params, x: jnp.ndarray, stride=1, padding="SAME") -> jnp.ndarray:
    y = jax.lax.conv_general_dilated(
        x, p["kernel"].astype(x.dtype), (stride, stride), padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    scale = (p["bn_scale"] * jax.lax.rsqrt(p["bn_var"] + 1e-3)).astype(x.dtype)
    bias = (p["bn_bias"] - p["bn_mean"] * scale).astype(x.dtype)
    return jax.nn.relu(y * scale + bias)


def _maxpool(x, k=3, s=2, padding="VALID"):
    return jax.lax.reduce_window(x, -jnp.inf, jax.lax.max,
                                 (1, k, k, 1), (1, s, s, 1), padding)


def _avgpool_cip_false(x, k=3):
    """3x3 stride-1 SAME avg pool, count_include_pad=False."""
    summed = jax.lax.reduce_window(x, 0.0, jax.lax.add, (1, k, k, 1),
                                   (1, 1, 1, 1), "SAME")
    ones = jnp.ones(x.shape[:3] + (1,), x.dtype)
    counts = jax.lax.reduce_window(ones, 0.0, jax.lax.add, (1, k, k, 1),
                                   (1, 1, 1, 1), "SAME")
    return summed / counts


def _inception_a(p, x):
    b1 = _conv_bn(p["branch1x1"], x)
    b5 = _conv_bn(p["branch5x5_2"], _conv_bn(p["branch5x5_1"], x))
    b3 = _conv_bn(p["branch3x3dbl_3"],
                  _conv_bn(p["branch3x3dbl_2"],
                           _conv_bn(p["branch3x3dbl_1"], x)))
    bp = _conv_bn(p["branch_pool"], _avgpool_cip_false(x))
    return jnp.concatenate([b1, b5, b3, bp], axis=-1)


def _inception_b(p, x):
    b3 = _conv_bn(p["branch3x3"], x, stride=2, padding="VALID")
    bd = _conv_bn(p["branch3x3dbl_3"],
                  _conv_bn(p["branch3x3dbl_2"],
                           _conv_bn(p["branch3x3dbl_1"], x)),
                  stride=2, padding="VALID")
    bp = _maxpool(x)
    return jnp.concatenate([b3, bd, bp], axis=-1)


def _inception_c(p, x):
    b1 = _conv_bn(p["branch1x1"], x)
    b7 = _conv_bn(p["branch7x7_3"],
                  _conv_bn(p["branch7x7_2"], _conv_bn(p["branch7x7_1"], x)))
    bd = x
    for name in ["branch7x7dbl_1", "branch7x7dbl_2", "branch7x7dbl_3",
                 "branch7x7dbl_4", "branch7x7dbl_5"]:
        bd = _conv_bn(p[name], bd)
    bp = _conv_bn(p["branch_pool"], _avgpool_cip_false(x))
    return jnp.concatenate([b1, b7, bd, bp], axis=-1)


def _inception_d(p, x):
    b3 = _conv_bn(p["branch3x3_2"], _conv_bn(p["branch3x3_1"], x),
                  stride=2, padding="VALID")
    b7 = _conv_bn(p["branch7x7x3_1"], x)
    b7 = _conv_bn(p["branch7x7x3_2"], b7)
    b7 = _conv_bn(p["branch7x7x3_3"], b7)
    b7 = _conv_bn(p["branch7x7x3_4"], b7, stride=2, padding="VALID")
    bp = _maxpool(x)
    return jnp.concatenate([b3, b7, bp], axis=-1)


def _inception_e(p, x, pool_kind: str):
    b1 = _conv_bn(p["branch1x1"], x)
    b3 = _conv_bn(p["branch3x3_1"], x)
    b3 = jnp.concatenate([_conv_bn(p["branch3x3_2a"], b3),
                          _conv_bn(p["branch3x3_2b"], b3)], axis=-1)
    bd = _conv_bn(p["branch3x3dbl_2"], _conv_bn(p["branch3x3dbl_1"], x))
    bd = jnp.concatenate([_conv_bn(p["branch3x3dbl_3a"], bd),
                          _conv_bn(p["branch3x3dbl_3b"], bd)], axis=-1)
    if pool_kind == "avg":
        pooled = _avgpool_cip_false(x)
    else:  # FIDInceptionE_2 uses max pool (pytorch-fid quirk)
        pooled = jax.lax.reduce_window(x, -jnp.inf, jax.lax.max,
                                       (1, 3, 3, 1), (1, 1, 1, 1), "SAME")
    bp = _conv_bn(p["branch_pool"], pooled)
    return jnp.concatenate([b1, b3, bd, bp], axis=-1)


def apply(params: Params, x: jnp.ndarray
          ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """x: [N, 299, 299, 3] in [-1, 1] -> (pool3, spatial, logits)."""
    h = _conv_bn(params["Conv2d_1a_3x3"], x, stride=2, padding="VALID")
    h = _conv_bn(params["Conv2d_2a_3x3"], h, padding="VALID")
    h = _conv_bn(params["Conv2d_2b_3x3"], h)
    h = _maxpool(h)
    h = _conv_bn(params["Conv2d_3b_1x1"], h)
    h = _conv_bn(params["Conv2d_4a_3x3"], h, padding="VALID")
    h = _maxpool(h)
    h = _inception_a(params["Mixed_5b"], h)
    h = _inception_a(params["Mixed_5c"], h)
    h = _inception_a(params["Mixed_5d"], h)
    h = _inception_b(params["Mixed_6a"], h)
    h = _inception_c(params["Mixed_6b"], h)
    h = _inception_c(params["Mixed_6c"], h)
    h = _inception_c(params["Mixed_6d"], h)
    h = _inception_c(params["Mixed_6e"], h)
    spatial = h[..., :7]  # [N, 17, 17, 7] — sFID features
    h = _inception_d(params["Mixed_7a"], h)
    h = _inception_e(params["Mixed_7b"], h, "avg")
    h = _inception_e(params["Mixed_7c"], h, "max")
    pool3 = jnp.mean(h, axis=(1, 2))  # [N, 2048]
    logits = pool3 @ params["fc"]["kernel"].astype(pool3.dtype) + \
        params["fc"]["bias"].astype(pool3.dtype)
    n = x.shape[0]
    return pool3, spatial.reshape(n, -1), logits


# ---------------------------------------------------------------------------
# Weights
# ---------------------------------------------------------------------------

_BLOCKS = {
    "Mixed_5b": ["branch1x1", "branch5x5_1", "branch5x5_2", "branch3x3dbl_1",
                 "branch3x3dbl_2", "branch3x3dbl_3", "branch_pool"],
    "Mixed_6a": ["branch3x3", "branch3x3dbl_1", "branch3x3dbl_2",
                 "branch3x3dbl_3"],
    "Mixed_6b": ["branch1x1", "branch7x7_1", "branch7x7_2", "branch7x7_3",
                 "branch7x7dbl_1", "branch7x7dbl_2", "branch7x7dbl_3",
                 "branch7x7dbl_4", "branch7x7dbl_5", "branch_pool"],
    "Mixed_7a": ["branch3x3_1", "branch3x3_2", "branch7x7x3_1",
                 "branch7x7x3_2", "branch7x7x3_3", "branch7x7x3_4"],
    "Mixed_7b": ["branch1x1", "branch3x3_1", "branch3x3_2a", "branch3x3_2b",
                 "branch3x3dbl_1", "branch3x3dbl_2", "branch3x3dbl_3a",
                 "branch3x3dbl_3b", "branch_pool"],
}
_BLOCKS["Mixed_5c"] = _BLOCKS["Mixed_5d"] = _BLOCKS["Mixed_5b"]
_BLOCKS["Mixed_6c"] = _BLOCKS["Mixed_6d"] = _BLOCKS["Mixed_6e"] = _BLOCKS["Mixed_6b"]
_BLOCKS["Mixed_7c"] = _BLOCKS["Mixed_7b"]

_STEM = ["Conv2d_1a_3x3", "Conv2d_2a_3x3", "Conv2d_2b_3x3", "Conv2d_3b_1x1",
         "Conv2d_4a_3x3"]


def convert_inception(sd) -> Params:
    """pytorch-fid / torchvision inception_v3 state dict -> our params."""
    sd = {k: np.asarray(v) for k, v in sd.items()}

    def conv_bn(prefix):
        return {
            "kernel": np.transpose(sd[f"{prefix}.conv.weight"], (2, 3, 1, 0)),
            "bn_scale": sd[f"{prefix}.bn.weight"],
            "bn_bias": sd[f"{prefix}.bn.bias"],
            "bn_mean": sd[f"{prefix}.bn.running_mean"],
            "bn_var": sd[f"{prefix}.bn.running_var"],
        }

    params: Params = {name: conv_bn(name) for name in _STEM}
    for block, branches in _BLOCKS.items():
        params[block] = {br: conv_bn(f"{block}.{br}") for br in branches}
    params["fc"] = {"kernel": np.transpose(sd["fc.weight"], (1, 0)),
                    "bias": sd["fc.bias"]}
    return params


def _rand_conv_bn(key, kh, kw, cin, cout):
    return {
        "kernel": (jax.random.normal(key, (kh, kw, cin, cout)) *
                   np.sqrt(2.0 / (kh * kw * cin))).astype(np.float32),
        "bn_scale": np.ones((cout,), np.float32),
        "bn_bias": np.zeros((cout,), np.float32),
        "bn_mean": np.zeros((cout,), np.float32),
        "bn_var": np.ones((cout,), np.float32),
    }


# (kernel_h, kernel_w, out_channels) per conv, keyed by in-channels flow;
# generated lazily in init_params by tracing shapes through apply().
_SPECS = {
    "Conv2d_1a_3x3": (3, 3, 3, 32), "Conv2d_2a_3x3": (3, 3, 32, 32),
    "Conv2d_2b_3x3": (3, 3, 32, 64), "Conv2d_3b_1x1": (1, 1, 64, 80),
    "Conv2d_4a_3x3": (3, 3, 80, 192),
}


def _a_spec(cin, pool_features):
    return {"branch1x1": (1, 1, cin, 64), "branch5x5_1": (1, 1, cin, 48),
            "branch5x5_2": (5, 5, 48, 64), "branch3x3dbl_1": (1, 1, cin, 64),
            "branch3x3dbl_2": (3, 3, 64, 96), "branch3x3dbl_3": (3, 3, 96, 96),
            "branch_pool": (1, 1, cin, pool_features)}


def _c_spec(cin, c7):
    return {"branch1x1": (1, 1, cin, 192), "branch7x7_1": (1, 1, cin, c7),
            "branch7x7_2": (1, 7, c7, c7), "branch7x7_3": (7, 1, c7, 192),
            "branch7x7dbl_1": (1, 1, cin, c7), "branch7x7dbl_2": (7, 1, c7, c7),
            "branch7x7dbl_3": (1, 7, c7, c7), "branch7x7dbl_4": (7, 1, c7, c7),
            "branch7x7dbl_5": (1, 7, c7, 192),
            "branch_pool": (1, 1, cin, 192)}


def _e_spec(cin):
    return {"branch1x1": (1, 1, cin, 320), "branch3x3_1": (1, 1, cin, 384),
            "branch3x3_2a": (1, 3, 384, 384), "branch3x3_2b": (3, 1, 384, 384),
            "branch3x3dbl_1": (1, 1, cin, 448),
            "branch3x3dbl_2": (3, 3, 448, 384),
            "branch3x3dbl_3a": (1, 3, 384, 384),
            "branch3x3dbl_3b": (3, 1, 384, 384),
            "branch_pool": (1, 1, cin, 192)}


_BLOCK_SPECS = {
    "Mixed_5b": _a_spec(192, 32), "Mixed_5c": _a_spec(256, 64),
    "Mixed_5d": _a_spec(288, 64),
    "Mixed_6a": {"branch3x3": (3, 3, 288, 384),
                 "branch3x3dbl_1": (1, 1, 288, 64),
                 "branch3x3dbl_2": (3, 3, 64, 96),
                 "branch3x3dbl_3": (3, 3, 96, 96)},
    "Mixed_6b": _c_spec(768, 128), "Mixed_6c": _c_spec(768, 160),
    "Mixed_6d": _c_spec(768, 160), "Mixed_6e": _c_spec(768, 192),
    "Mixed_7a": {"branch3x3_1": (1, 1, 768, 192),
                 "branch3x3_2": (3, 3, 192, 320),
                 "branch7x7x3_1": (1, 1, 768, 192),
                 "branch7x7x3_2": (1, 7, 192, 192),
                 "branch7x7x3_3": (7, 1, 192, 192),
                 "branch7x7x3_4": (3, 3, 192, 192)},
    "Mixed_7b": _e_spec(1280), "Mixed_7c": _e_spec(2048),
}


def init_params(key, num_logits: int = 1008) -> Params:
    """Random-weight network (shape/architecture tests only)."""
    keys = iter(jax.random.split(key, 128))
    params: Params = {}
    for name, (kh, kw, cin, cout) in _SPECS.items():
        params[name] = _rand_conv_bn(next(keys), kh, kw, cin, cout)
    for block, spec in _BLOCK_SPECS.items():
        params[block] = {br: _rand_conv_bn(next(keys), *s)
                         for br, s in spec.items()}
    params["fc"] = {
        "kernel": (jax.random.normal(next(keys), (2048, num_logits))
                   * 0.01).astype(np.float32),
        "bias": np.zeros((num_logits,), np.float32)}
    return params


class FeatureExtractor:
    """Batched pool3/spatial/logits extraction from uint8 image arrays."""

    def __init__(self, weights_path: Optional[str] = None,
                 batch_size: int = 64):
        if weights_path:
            import torch
            sd = torch.load(weights_path, map_location="cpu")
            if hasattr(sd, "state_dict"):
                sd = sd.state_dict()
            self.params = convert_inception(
                {k: v.numpy() for k, v in sd.items()})
        else:
            print("WARNING: no inception weights — random network, "
                  "metric values are meaningless")
            self.params = init_params(jax.random.PRNGKey(0))
        self.batch_size = batch_size
        self._apply = jax.jit(lambda p, x: apply(p, x))

    def features(self, images_uint8: np.ndarray
                 ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """images [N, H, W, 3] uint8 -> (pool3, spatial, logits) numpy."""
        n = len(images_uint8)
        return self.features_from_batches(
            images_uint8[i:i + self.batch_size]
            for i in range(0, n, self.batch_size))

    def features_from_batches(self, batches
                              ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Streaming variant: consumes an iterator of uint8 [b, H, W, 3]
        batches so only the (N x 2048/2023/1008) features are ever resident
        — never the 50k decoded images."""
        pools, spatials, logits = [], [], []
        for batch in batches:
            x = self._preprocess(np.ascontiguousarray(batch))
            p, s, lg = self._apply(self.params, x)
            pools.append(np.asarray(p))
            spatials.append(np.asarray(s))
            logits.append(np.asarray(lg))
        return (np.concatenate(pools), np.concatenate(spatials),
                np.concatenate(logits))

    @staticmethod
    def _preprocess(batch: np.ndarray) -> jnp.ndarray:
        """uint8 [N,H,W,3] -> bilinear 299x299 in [-1, 1] (pytorch-fid)."""
        x = jnp.asarray(batch, jnp.float32) / 255.0
        if x.shape[1] != 299 or x.shape[2] != 299:
            x = jax.image.resize(x, (x.shape[0], 299, 299, 3), "bilinear")
        return x * 2.0 - 1.0
