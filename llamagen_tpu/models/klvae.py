"""KL-regularized autoencoder (SD-VAE / AutoencoderKL) — the baseline
tokenizer comparison model.

JAX implementation of the Stable Diffusion VAE the reference compares
against through diffusers (`/root/reference/tokenizer/vae/
reconstruction_vae_ddp.py:19,88-96`, `sd_vae_demo.py:16,37-39`): the
LDM conv backbone (same ResNet/attn blocks as the VQ tokenizer —
reused from `models.vq`) with a diagonal-Gaussian latent instead of a
codebook. Weights-gated like CLIP/LPIPS: load a local diffusers
AutoencoderKL (or LDM-layout) checkpoint through
`utils.convert.convert_sd_vae`.

Architectural differences vs `models.vq` (LlamaGen VQ):
  - double_z: encoder emits 2*z_channels (mean ‖ logvar)
  - attention ONLY in the mid blocks (SD's attn_resolutions = [])
  - quant_conv: [2z -> 2*embed]; post_quant_conv: [embed -> z]
  - latents scaled by `scaling_factor` (0.18215) in user code
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from llamagen_tpu.models.vq import (attn_block, conv2d, group_norm,
                                    resnet_block, swish, downsample,
                                    upsample)

Params = Dict[str, Any]


@dataclass(frozen=True)
class KLVAEConfig:
    """SD-VAE geometry (stabilityai/sd-vae-ft-*: f8, 4-ch latent)."""
    ch: int = 128
    ch_mult: Tuple[int, ...] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    z_channels: int = 4
    embed_dim: int = 4
    scaling_factor: float = 0.18215

    @property
    def downsample_factor(self) -> int:
        return 2 ** (len(self.ch_mult) - 1)


def encoder_apply(params: Params, x: jnp.ndarray,
                  cfg: KLVAEConfig) -> jnp.ndarray:
    """[B,H,W,3] -> [B,h,w,2z] moments (per-level attention optional —
    absent for SD's attn_resolutions=[])."""
    num_res = len(cfg.ch_mult)
    h = conv2d(params["conv_in"], x)
    for i_level in range(num_res):
        level = params["down"][i_level]
        for i_block in range(cfg.num_res_blocks):
            h = resnet_block(level["res"][i_block], h)
            if level["attn"]:
                h = attn_block(level["attn"][i_block], h)
        if i_level != num_res - 1:
            h = downsample(level["downsample"], h)
    h = resnet_block(params["mid"][0], h)
    h = attn_block(params["mid"][1], h)
    h = resnet_block(params["mid"][2], h)
    h = group_norm(params["norm_out"], h)
    return conv2d(params["conv_out"], swish(h))


def decoder_apply(params: Params, z: jnp.ndarray,
                  cfg: KLVAEConfig) -> jnp.ndarray:
    num_res = len(cfg.ch_mult)
    h = conv2d(params["conv_in"], z)
    h = resnet_block(params["mid"][0], h)
    h = attn_block(params["mid"][1], h)
    h = resnet_block(params["mid"][2], h)
    for i_level in range(num_res):  # application order (lowest res first)
        level = params["up"][i_level]
        for i_block in range(cfg.num_res_blocks + 1):
            h = resnet_block(level["res"][i_block], h)
            if level["attn"]:
                h = attn_block(level["attn"][i_block], h)
        if i_level != num_res - 1:
            h = upsample(level["upsample"], h)
    h = group_norm(params["norm_out"], h)
    return conv2d(params["conv_out"], swish(h))


def encode(params: Params, x: jnp.ndarray, cfg: KLVAEConfig
           ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """-> (mean, logvar), each [B, h, w, embed_dim]. logvar clamped to
    [-30, 20] (diffusers DiagonalGaussianDistribution semantics)."""
    moments = conv2d(params["quant_conv"], encoder_apply(params["encoder"],
                                                         x, cfg))
    mean, logvar = jnp.split(moments, 2, axis=-1)
    return mean, jnp.clip(logvar, -30.0, 20.0)


def sample(rng: jax.Array, mean: jnp.ndarray,
           logvar: jnp.ndarray) -> jnp.ndarray:
    return mean + jnp.exp(0.5 * logvar) * jax.random.normal(
        rng, mean.shape, mean.dtype)


def decode(params: Params, z: jnp.ndarray, cfg: KLVAEConfig) -> jnp.ndarray:
    return decoder_apply(params["decoder"],
                         conv2d(params["post_quant_conv"], z), cfg)


def roundtrip(params: Params, x: jnp.ndarray, cfg: KLVAEConfig,
              rng: Optional[jax.Array] = None) -> jnp.ndarray:
    """encode -> (sample | mean) -> decode, the comparison-rig forward
    (ref sd_vae_demo.py:37-39 samples; rng=None uses the mean — the
    deterministic variant for metric stability)."""
    mean, logvar = encode(params, x, cfg)
    z = mean if rng is None else sample(rng, mean, logvar)
    # the 0.18215 scaling cancels in a roundtrip (encode .mul_, decode
    # .div_ in the reference) — kept for API parity with latent consumers
    return decode(params, z, cfg)
