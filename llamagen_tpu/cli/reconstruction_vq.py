"""VQ tokenizer reconstruction evaluation (PSNR / SSIM / codebook usage,
plus an npz dump for rFID).

Equivalent of
`/root/reference/tokenizer/tokenizer_image/reconstruction_vq_ddp.py`:
encode->decode roundtrip over a validation folder, per-image PSNR/SSIM,
50k-image npz for the ADM FID evaluator.

  python -m llamagen_tpu.cli.reconstruction_vq --data-path /data/val \
      --vq-ckpt vq_ds16_c2i.pt --image-size 256
"""

from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np

from llamagen_tpu.cli.common import load_vq
from llamagen_tpu.cli.extract_codes import center_crop, iter_image_folder
from llamagen_tpu.eval.metrics import images_to_unit_range, psnr, ssim
from llamagen_tpu.models import vq as vq_lib


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--data-path", required=True)
    p.add_argument("--vq-model", default="VQ-16")
    p.add_argument("--vq-ckpt", default=None)
    p.add_argument("--codebook-size", type=int, default=16384)
    p.add_argument("--codebook-embed-dim", type=int, default=8)
    p.add_argument("--image-size", type=int, default=256)
    p.add_argument("--batch-size", type=int, default=32)
    p.add_argument("--max-images", type=int, default=50000)
    p.add_argument("--npz-out", default=None,
                   help="write reconstructed images npz for rFID")
    args = p.parse_args(argv)

    from PIL import Image

    vq_params, vq_cfg = load_vq(args.vq_ckpt, args.vq_model,
                                args.codebook_size, args.codebook_embed_dim)

    @jax.jit
    def roundtrip(x):
        zq, _, idx = vq_lib.encode(vq_params, x, vq_cfg)
        return vq_lib.decode(vq_params, zq, vq_cfg), idx

    psnrs, ssims = [], []
    used = np.zeros((vq_cfg.codebook_size,), bool)
    recon_dump = []
    batch = []
    count = 0

    def run(batch_arr):
        nonlocal count
        x = jnp.asarray(np.stack(batch_arr).astype(np.float32) / 127.5 - 1.0)
        rec, idx = roundtrip(x)
        rec = np.asarray(rec.astype(jnp.float32))
        used[np.unique(np.asarray(idx))] = True
        for orig, r in zip(batch_arr, rec):
            a = orig.astype(np.float32) / 255.0
            b = images_to_unit_range(r)
            psnrs.append(psnr(a, b))
            ssims.append(ssim(a, b))
            if args.npz_out:
                recon_dump.append((b * 255).astype(np.uint8))
            count += 1

    for path, _ in iter_image_folder(args.data_path):
        if count >= args.max_images:
            break
        try:
            img = Image.open(path).convert("RGB")
        except OSError:
            continue
        batch.append(center_crop(img, args.image_size))
        if len(batch) == args.batch_size:
            run(batch)
            batch = []
    if batch and count < args.max_images:
        run(batch)

    print(f"images: {count}")
    print(f"PSNR: {np.mean(psnrs):.4f}")
    print(f"SSIM: {np.mean(ssims):.4f}")
    print(f"codebook usage: {used.mean():.4f}")
    if args.npz_out:
        np.savez(args.npz_out, arr_0=np.stack(recon_dump))
        print(f"wrote {args.npz_out} for rFID evaluation")


if __name__ == "__main__":
    main()
