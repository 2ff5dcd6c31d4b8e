"""Shared CLI helpers: checkpoint loading, image saving."""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from llamagen_tpu.config import GPTConfig, VQConfig, gpt_config, vq_config


def load_vq(vq_ckpt: Optional[str], vq_model: str = "VQ-16",
            codebook_size: int = 16384, codebook_embed_dim: int = 8,
            dtype=jnp.bfloat16):
    """Load VQ params from a torch .pt (converted) or orbax dir; random if None."""
    cfg = vq_config(vq_model, codebook_size=codebook_size,
                    codebook_embed_dim=codebook_embed_dim)
    from llamagen_tpu.models import vq as vq_lib

    if vq_ckpt is None:
        params = vq_lib.init_params(jax.random.PRNGKey(0), cfg, dtype)
    elif vq_ckpt.endswith(".pt") or vq_ckpt.endswith(".pth"):
        from llamagen_tpu.utils.convert import convert_vq_file
        params = jax.tree.map(lambda x: jnp.asarray(x, dtype),
                              convert_vq_file(vq_ckpt, cfg))
    else:
        from llamagen_tpu.utils import checkpoint
        params = checkpoint.restore(vq_ckpt, None)
    return params, cfg


def load_gpt(gpt_ckpt: Optional[str], gpt_model: str = "GPT-B",
             image_size: int = 256, downsample_size: int = 16,
             model_type: str = "c2i", cls_token_num: Optional[int] = None,
             dtype=jnp.bfloat16):
    latent = image_size // downsample_size
    if cls_token_num is None:
        cls_token_num = 1 if model_type == "c2i" else 120
    cfg = gpt_config(gpt_model, block_size=latent * latent,
                     cls_token_num=cls_token_num, model_type=model_type)
    from llamagen_tpu.models import gpt as gpt_lib

    if gpt_ckpt is None:
        params = gpt_lib.init_params(jax.random.PRNGKey(0), cfg, dtype)
    elif gpt_ckpt.endswith(".pt") or gpt_ckpt.endswith(".pth"):
        from llamagen_tpu.utils.convert import convert_gpt_file
        params = jax.tree.map(lambda x: jnp.asarray(x, dtype),
                              convert_gpt_file(gpt_ckpt, cfg))
    else:
        from llamagen_tpu.utils import checkpoint
        params = checkpoint.restore(gpt_ckpt, None)
    return params, cfg


def save_image_grid(images: np.ndarray, path: str, nrow: int = 4,
                    padding: int = 2) -> None:
    """images: [N, H, W, 3] in [-1, 1] -> grid png (torchvision-style)."""
    from PIL import Image

    imgs = np.clip((np.asarray(images, np.float32) + 1) * 127.5, 0, 255
                   ).astype(np.uint8)
    n, h, w, c = imgs.shape
    ncol = nrow
    nrows = (n + ncol - 1) // ncol
    grid = np.full(((h + padding) * nrows - padding,
                    (w + padding) * ncol - padding, c), 255, np.uint8)
    for i, img in enumerate(imgs):
        r, cc = divmod(i, ncol)
        grid[r * (h + padding):r * (h + padding) + h,
             cc * (w + padding):cc * (w + padding) + w] = img
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    Image.fromarray(grid).save(path)
