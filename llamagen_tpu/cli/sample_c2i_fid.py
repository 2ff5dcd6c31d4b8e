"""50k-sample generation for FID evaluation.

Equivalent of `/root/reference/autoregressive/sample/sample_c2i_ddp.py`:
random labels, CFG sampling, bicubic resize to eval resolution, npz output
for the ADM evaluator (`llamagen_tpu.cli.evaluate`).

  python -m llamagen_tpu.cli.sample_c2i_fid --gpt-ckpt c2i_L_384.pt \
      --vq-ckpt vq_ds16_c2i.pt --gpt-model GPT-L --image-size 384 \
      --image-size-eval 256 --cfg-scale 2.0 --num-samples 50000
"""

from __future__ import annotations

import argparse
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from llamagen_tpu.cli.common import load_gpt, load_vq
from llamagen_tpu.models import vq as vq_lib
from llamagen_tpu.ops.generate import generate


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--gpt-model", default="GPT-B")
    p.add_argument("--gpt-ckpt", default=None)
    p.add_argument("--vq-model", default="VQ-16")
    p.add_argument("--vq-ckpt", default=None)
    p.add_argument("--codebook-size", type=int, default=16384)
    p.add_argument("--codebook-embed-dim", type=int, default=8)
    p.add_argument("--image-size", type=int, default=384)
    p.add_argument("--image-size-eval", type=int, default=256)
    p.add_argument("--downsample-size", type=int, default=16)
    p.add_argument("--num-classes", type=int, default=1000)
    p.add_argument("--cfg-scale", type=float, default=1.5)
    p.add_argument("--cfg-interval", type=int, default=-1)
    p.add_argument("--top-k", type=int, default=0)
    p.add_argument("--top-p", type=float, default=1.0)
    p.add_argument("--temperature", type=float, default=1.0)
    p.add_argument("--per-proc-batch-size", type=int, default=32)
    p.add_argument("--num-samples", type=int, default=50000)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--sample-dir", default="samples")
    args = p.parse_args(argv)

    from PIL import Image

    dtype = jnp.bfloat16
    gpt_params, gpt_cfg = load_gpt(args.gpt_ckpt, args.gpt_model,
                                   args.image_size, args.downsample_size,
                                   dtype=dtype)
    vq_params, vq_cfg = load_vq(args.vq_ckpt, args.vq_model,
                                args.codebook_size, args.codebook_embed_dim,
                                dtype=dtype)
    latent = args.image_size // args.downsample_size
    bs = args.per_proc_batch_size
    iterations = (args.num_samples + bs - 1) // bs

    rng = jax.random.PRNGKey(args.seed)
    label_rng = np.random.RandomState(args.seed)
    all_images = []
    t0 = time.time()
    for it in range(iterations):
        labels = jnp.asarray(
            label_rng.randint(0, args.num_classes, size=(bs,)), jnp.int32)
        rng, step = jax.random.split(rng)
        seq = generate(gpt_params, step, labels, cfg=gpt_cfg,
                       max_new_tokens=latent * latent,
                       cfg_scale=args.cfg_scale,
                       cfg_interval=args.cfg_interval,
                       temperature=args.temperature, top_k=args.top_k,
                       top_p=args.top_p, compute_dtype=dtype,
                       cache_dtype=dtype)
        imgs = vq_lib.decode_code(
            vq_params, seq.reshape(bs, latent, latent), vq_cfg)
        imgs = np.asarray(imgs.astype(jnp.float32))
        imgs = np.clip((imgs + 1) * 127.5, 0, 255).astype(np.uint8)
        for img in imgs:
            if args.image_size_eval != args.image_size:
                img = np.array(Image.fromarray(img).resize(
                    (args.image_size_eval, args.image_size_eval),
                    Image.BICUBIC))
            all_images.append(img)
        if it % 10 == 0:
            done = (it + 1) * bs
            rate = done / (time.time() - t0)
            print(f"{done}/{args.num_samples} ({rate:.2f} img/s)", flush=True)

    arr = np.stack(all_images[:args.num_samples])
    os.makedirs(args.sample_dir, exist_ok=True)
    name = (f"{args.gpt_model}-{args.image_size}-size-{args.image_size_eval}"
            f"-cfg-{args.cfg_scale}-seed-{args.seed}")
    npz_path = os.path.join(args.sample_dir, f"{name}.npz")
    np.savez(npz_path, arr_0=arr)
    print(f"saved {arr.shape} to {npz_path} "
          f"({arr.shape[0] / (time.time() - t0):.2f} img/s overall)")


if __name__ == "__main__":
    main()
