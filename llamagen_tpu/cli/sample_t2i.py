"""Text-conditional sampling CLI.

Equivalent of `/root/reference/autoregressive/sample/sample_t2i.py`:
T5-encode prompts, left-pad, sample with CFG, decode, save grid.

  python -m llamagen_tpu.cli.sample_t2i --gpt-ckpt t2i_XL_stage1_256.pt \
      --vq-ckpt vq_ds16_t2i.pt --t5-path /path/to/flan-t5-xl
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

DEMO_PROMPTS = [
    "A portrait photo of a kangaroo wearing an orange hoodie and blue "
    "sunglasses standing on the grass in front of the Sydney Opera House "
    "holding a sign on the chest that says Welcome Friends!",
    "A blue Porsche 356 parked in front of a yellow brick wall.",
    "A photo of an astronaut riding a horse in the forest. There is a "
    "river in front of them with water lilies.",
    "A map of the United States made out of sushi. It is on a table next "
    "to a glass of red wine.",
]


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--gpt-model", default="GPT-XL")
    p.add_argument("--gpt-ckpt", default=None)
    p.add_argument("--vq-model", default="VQ-16")
    p.add_argument("--vq-ckpt", default=None)
    p.add_argument("--codebook-size", type=int, default=16384)
    p.add_argument("--codebook-embed-dim", type=int, default=8)
    p.add_argument("--image-size", type=int, default=256, choices=[256, 384, 512])
    p.add_argument("--downsample-size", type=int, default=16, choices=[8, 16])
    p.add_argument("--prompts", nargs="*", default=DEMO_PROMPTS)
    p.add_argument("--t5-path", required=False, default=None,
                   help="local flan-t5-xl checkpoint dir")
    p.add_argument("--cls-token-num", type=int, default=120)
    p.add_argument("--cfg-scale", type=float, default=7.5)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--top-k", type=int, default=1000)
    p.add_argument("--top-p", type=float, default=1.0)
    p.add_argument("--temperature", type=float, default=1.0)
    p.add_argument("--precision", default="bf16", choices=["bf16", "f32"])
    p.add_argument("--out", default="sample_t2i.png")
    p.add_argument("--draft-gpt-model", default=None,
                   help="enable speculative decoding with this draft size")
    p.add_argument("--draft-gpt-ckpt", default=None)
    p.add_argument("--spec-k", type=int, default=4)
    args = p.parse_args(argv)

    dtype = jnp.bfloat16 if args.precision == "bf16" else jnp.float32
    gpt_params, gpt_cfg = load_gpt(
        args.gpt_ckpt, args.gpt_model, args.image_size, args.downsample_size,
        model_type="t2i", cls_token_num=args.cls_token_num, dtype=dtype)
    vq_params, vq_cfg = load_vq(args.vq_ckpt, args.vq_model,
                                args.codebook_size, args.codebook_embed_dim,
                                dtype=dtype)
    latent = args.image_size // args.downsample_size

    if args.t5_path:
        from llamagen_tpu.text.t5 import T5TextEncoder, left_pad_embeddings
        t5 = T5TextEncoder(args.t5_path, model_max_length=args.cls_token_num)
        emb, mask = t5.get_text_embeddings(args.prompts)
        emb, mask = left_pad_embeddings(np.asarray(emb, np.float32),
                                        np.asarray(mask))
    else:
        print("WARNING: no --t5-path; using random caption embeddings")
        rng = np.random.RandomState(args.seed)
        emb = rng.randn(len(args.prompts), args.cls_token_num,
                        gpt_cfg.caption_dim).astype(np.float32)
        mask = np.ones((len(args.prompts), args.cls_token_num), np.int32)

    t0 = time.time()
    if args.draft_gpt_model:
        from llamagen_tpu.ops.speculative import generate_speculative

        draft_params, draft_cfg = load_gpt(
            args.draft_gpt_ckpt, args.draft_gpt_model, args.image_size,
            args.downsample_size, model_type="t2i",
            cls_token_num=args.cls_token_num, dtype=dtype)
        seq, rounds = generate_speculative(
            gpt_params, draft_params, jax.random.PRNGKey(args.seed),
            jnp.asarray(emb, dtype), cfg=gpt_cfg, draft_cfg=draft_cfg,
            max_new_tokens=latent * latent, k=args.spec_k,
            emb_masks=jnp.asarray(mask), cfg_scale=args.cfg_scale,
            temperature=args.temperature, top_k=args.top_k,
            top_p=args.top_p, compute_dtype=dtype)
        seq = np.asarray(seq)
        print(f"speculative: {int(rounds)} verify rounds "
              f"({latent * latent / max(int(rounds), 1):.2f} tokens/round)")
    else:
        seq = generate(gpt_params, jax.random.PRNGKey(args.seed),
                       jnp.asarray(emb, dtype), cfg=gpt_cfg,
                       max_new_tokens=latent * latent,
                       emb_masks=jnp.asarray(mask),
                       cfg_scale=args.cfg_scale,
                       temperature=args.temperature,
                       top_k=args.top_k, top_p=args.top_p,
                       compute_dtype=dtype, cache_dtype=dtype)
        seq = np.asarray(seq)
    print(f"gpt sampling takes {time.time() - t0:.2f}s")

    imgs = vq_lib.decode_code(vq_params,
                              jnp.asarray(seq).reshape(-1, latent, latent),
                              vq_cfg)
    save_image_grid(np.asarray(imgs.astype(jnp.float32)), args.out, nrow=2)
    print(f"saved {args.out}")


if __name__ == "__main__":
    main()
