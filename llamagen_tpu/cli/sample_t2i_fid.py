"""Batch t2i sampling over a prompt file for FID/CLIP evaluation.

Equivalent of `/root/reference/autoregressive/sample/sample_t2i_ddp.py`:
reads PartiPrompts.tsv / coco_captions.csv / jsonl prompts, samples with
CFG, writes images + result.jsonl.

  python -m llamagen_tpu.cli.sample_t2i_fid --prompt-file coco_captions.csv \
      --gpt-ckpt t2i_XL.pt --vq-ckpt vq_ds16_t2i.pt --t5-path /t5
"""

from __future__ import annotations

import argparse
import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from llamagen_tpu.cli.common import load_gpt, load_vq
from llamagen_tpu.cli.extract_t5_features import read_captions
from llamagen_tpu.models import vq as vq_lib
from llamagen_tpu.ops.generate import generate


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--prompt-file", required=True,
                   help="tsv (PartiPrompts) / csv (coco) / jsonl / txt")
    p.add_argument("--gpt-model", default="GPT-XL")
    p.add_argument("--gpt-ckpt", default=None)
    p.add_argument("--vq-model", default="VQ-16")
    p.add_argument("--vq-ckpt", default=None)
    p.add_argument("--codebook-size", type=int, default=16384)
    p.add_argument("--codebook-embed-dim", type=int, default=8)
    p.add_argument("--image-size", type=int, default=256)
    p.add_argument("--downsample-size", type=int, default=16)
    p.add_argument("--t5-path", default=None)
    p.add_argument("--random-t5", action="store_true",
                   help="deterministic random caption embeddings instead "
                        "of a T5 checkpoint (offline smoke/e2e runs)")
    p.add_argument("--cls-token-num", type=int, default=120)
    p.add_argument("--cfg-scale", type=float, default=7.5)
    p.add_argument("--top-k", type=int, default=1000)
    p.add_argument("--top-p", type=float, default=1.0)
    p.add_argument("--temperature", type=float, default=1.0)
    p.add_argument("--per-proc-batch-size", type=int, default=16)
    p.add_argument("--max-prompts", type=int, default=-1)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--sample-dir", default="samples_t2i")
    args = p.parse_args(argv)

    from PIL import Image

    prompts = read_captions(args.prompt_file)
    if args.max_prompts > 0:
        prompts = prompts[:args.max_prompts]

    dtype = jnp.bfloat16
    gpt_params, gpt_cfg = load_gpt(
        args.gpt_ckpt, args.gpt_model, args.image_size, args.downsample_size,
        model_type="t2i", cls_token_num=args.cls_token_num, dtype=dtype)
    vq_params, vq_cfg = load_vq(args.vq_ckpt, args.vq_model,
                                args.codebook_size, args.codebook_embed_dim,
                                dtype=dtype)
    latent = args.image_size // args.downsample_size

    from llamagen_tpu.text.t5 import left_pad_embeddings
    if args.random_t5:
        cap_dim = gpt_cfg.caption_dim

        class _RandomT5:
            """Prompt-hash-seeded embeddings: deterministic, T5-free."""

            def get_text_embeddings(self, texts):
                t = args.cls_token_num
                emb = np.zeros((len(texts), t, cap_dim), np.float32)
                mask = np.zeros((len(texts), t), np.int32)
                import zlib
                for i, s in enumerate(texts):
                    # crc32, NOT hash(): str hashing is salted per process
                    # (PYTHONHASHSEED), which would break the documented
                    # run-to-run determinism
                    r = np.random.RandomState(zlib.crc32(s.encode()))
                    n = max(1, min(len(s.split()) + 2, t))
                    emb[i, :n] = r.randn(n, cap_dim)
                    mask[i, :n] = 1
                return emb, mask

        t5 = _RandomT5()
    else:
        assert args.t5_path, ("--t5-path required (local flan-t5-xl "
                              "checkpoint), or use --random-t5")
        from llamagen_tpu.text.t5 import T5TextEncoder
        t5 = T5TextEncoder(args.t5_path,
                           model_max_length=args.cls_token_num)

    os.makedirs(args.sample_dir, exist_ok=True)
    results = []
    rng = jax.random.PRNGKey(args.seed)
    bs = args.per_proc_batch_size
    for start in range(0, len(prompts), bs):
        batch_prompts = prompts[start:start + bs]
        pad = bs - len(batch_prompts)
        emb, mask = t5.get_text_embeddings(batch_prompts + [""] * pad)
        emb, mask = left_pad_embeddings(np.asarray(emb, np.float32),
                                        np.asarray(mask))
        rng, step = jax.random.split(rng)
        seq = generate(gpt_params, step, jnp.asarray(emb, dtype),
                       cfg=gpt_cfg, max_new_tokens=latent * latent,
                       emb_masks=jnp.asarray(mask),
                       cfg_scale=args.cfg_scale,
                       temperature=args.temperature, top_k=args.top_k,
                       top_p=args.top_p, compute_dtype=dtype,
                       cache_dtype=dtype)
        imgs = vq_lib.decode_code(
            vq_params, seq.reshape(bs, latent, latent), vq_cfg)
        imgs = np.clip((np.asarray(imgs.astype(jnp.float32)) + 1) * 127.5,
                       0, 255).astype(np.uint8)
        for j, prompt in enumerate(batch_prompts):
            idx = start + j
            path = os.path.join(args.sample_dir, f"{idx:06d}.png")
            Image.fromarray(imgs[j]).save(path)
            results.append({"id": idx, "prompt": prompt, "image": path})
        print(f"{start + len(batch_prompts)}/{len(prompts)}", flush=True)

    with open(os.path.join(args.sample_dir, "result.jsonl"), "w") as f:
        for row in results:
            f.write(json.dumps(row) + "\n")
    print(f"done: {len(results)} images in {args.sample_dir}")


if __name__ == "__main__":
    main()
