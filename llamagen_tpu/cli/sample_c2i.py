"""Class-conditional sampling CLI.

Equivalent of `/root/reference/autoregressive/sample/sample_c2i.py`:
loads VQ + GPT checkpoints, samples the 8 canonical demo classes (or user
classes) with CFG, decodes to images, writes a grid png.

  python -m llamagen_tpu.cli.sample_c2i --gpt-ckpt c2i_B_256.pt \
      --vq-ckpt vq_ds16_c2i.pt --gpt-model GPT-B --image-size 256
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

from llamagen_tpu.cli.common import load_gpt, load_vq, save_image_grid
from llamagen_tpu.models import vq as vq_lib
from llamagen_tpu.ops.generate import generate

# the reference's demo classes (sample_c2i.py:77)
DEMO_CLASSES = [207, 360, 387, 974, 88, 979, 417, 279]


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--gpt-model", default="GPT-B")
    p.add_argument("--gpt-ckpt", default=None)
    p.add_argument("--vq-model", default="VQ-16")
    p.add_argument("--vq-ckpt", default=None)
    p.add_argument("--codebook-size", type=int, default=16384)
    p.add_argument("--codebook-embed-dim", type=int, default=8)
    p.add_argument("--image-size", type=int, default=256, choices=[256, 384, 512])
    p.add_argument("--downsample-size", type=int, default=16, choices=[8, 16])
    p.add_argument("--classes", type=int, nargs="*", default=DEMO_CLASSES)
    p.add_argument("--cfg-scale", type=float, default=4.0)
    p.add_argument("--cfg-interval", type=int, default=-1)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--top-k", type=int, default=0)
    p.add_argument("--top-p", type=float, default=1.0)
    p.add_argument("--temperature", type=float, default=1.0)
    p.add_argument("--precision", default="bf16", choices=["bf16", "f32"])
    p.add_argument("--out", default="sample_c2i.png")
    # speculative decoding: a cheap draft model proposes, the target
    # verifies k+1 tokens per forward (exact target distribution;
    # ops/speculative.py) — big-model speedup when the draft agrees often
    p.add_argument("--draft-gpt-model", default=None,
                   help="enable speculative decoding with this draft size")
    p.add_argument("--draft-gpt-ckpt", default=None)
    p.add_argument("--spec-k", type=int, default=4,
                   help="draft proposals per verify round")
    args = p.parse_args(argv)

    dtype = jnp.bfloat16 if args.precision == "bf16" else jnp.float32
    gpt_params, gpt_cfg = load_gpt(args.gpt_ckpt, args.gpt_model,
                                   args.image_size, args.downsample_size,
                                   dtype=dtype)
    vq_params, vq_cfg = load_vq(args.vq_ckpt, args.vq_model,
                                args.codebook_size, args.codebook_embed_dim,
                                dtype=dtype)
    latent = args.image_size // args.downsample_size
    labels = jnp.asarray(np.array(args.classes, np.int32))

    t0 = time.time()
    if args.draft_gpt_model:
        from llamagen_tpu.ops.speculative import generate_speculative

        draft_params, draft_cfg = load_gpt(
            args.draft_gpt_ckpt, args.draft_gpt_model, args.image_size,
            args.downsample_size, dtype=dtype)
        assert args.cfg_interval == -1, \
            "speculative decoding does not support cfg_interval"
        seq, rounds = generate_speculative(
            gpt_params, draft_params, jax.random.PRNGKey(args.seed),
            labels, cfg=gpt_cfg, draft_cfg=draft_cfg,
            max_new_tokens=latent * latent, k=args.spec_k,
            cfg_scale=args.cfg_scale, temperature=args.temperature,
            top_k=args.top_k, top_p=args.top_p, compute_dtype=dtype)
        seq = np.asarray(seq)
        print(f"speculative: {int(rounds)} verify rounds for "
              f"{latent * latent} tokens "
              f"({latent * latent / max(int(rounds), 1):.2f} tokens/round)")
    else:
        seq = generate(gpt_params, jax.random.PRNGKey(args.seed), labels,
                       cfg=gpt_cfg, max_new_tokens=latent * latent,
                       cfg_scale=args.cfg_scale,
                       cfg_interval=args.cfg_interval,
                       temperature=args.temperature, top_k=args.top_k,
                       top_p=args.top_p, compute_dtype=dtype,
                       cache_dtype=dtype)
        seq = np.asarray(seq)
    print(f"gpt sampling takes {time.time() - t0:.2f}s "
          f"({len(labels)} images, {latent}x{latent} tokens)")

    t0 = time.time()
    imgs = vq_lib.decode_code(vq_params,
                              jnp.asarray(seq).reshape(-1, latent, latent),
                              vq_cfg)
    imgs = np.asarray(imgs.astype(jnp.float32))
    print(f"vq decoding takes {time.time() - t0:.2f}s")

    save_image_grid(imgs, args.out, nrow=4)
    print(f"saved {args.out}")


if __name__ == "__main__":
    main()
