"""Single-image VQ reconstruction demo.

Equivalent of `/root/reference/tokenizer/tokenizer_image/vq_demo.py`:
encode one image to codes, decode back, save the reconstruction.

  python -m llamagen_tpu.cli.vq_demo --image cat.png --vq-ckpt vq.pt
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np

from llamagen_tpu.cli.common import load_vq
from llamagen_tpu.cli.extract_codes import center_crop
from llamagen_tpu.models import vq as vq_lib


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--image", required=True)
    p.add_argument("--vq-model", default="VQ-16")
    p.add_argument("--vq-ckpt", default=None)
    p.add_argument("--codebook-size", type=int, default=16384)
    p.add_argument("--codebook-embed-dim", type=int, default=8)
    p.add_argument("--image-size", type=int, default=256)
    p.add_argument("--suffix", default="_rec")
    args = p.parse_args(argv)

    from PIL import Image

    vq_params, vq_cfg = load_vq(args.vq_ckpt, args.vq_model,
                                args.codebook_size, args.codebook_embed_dim)
    img = Image.open(args.image).convert("RGB")
    arr = center_crop(img, args.image_size).astype(np.float32) / 127.5 - 1.0

    z_q, _, idx = vq_lib.encode(vq_params, jnp.asarray(arr)[None], vq_cfg)
    rec = vq_lib.decode(vq_params, z_q, vq_cfg)
    rec = np.clip((np.asarray(rec.astype(jnp.float32))[0] + 1) * 127.5,
                  0, 255).astype(np.uint8)

    out = args.image.rsplit(".", 1)[0] + args.suffix + ".png"
    Image.fromarray(rec).save(out)
    grid = idx.shape[1]
    print(f"codes: {grid}x{grid}, unique: {len(np.unique(np.asarray(idx)))}")
    print(f"saved {out}")


if __name__ == "__main__":
    main()
