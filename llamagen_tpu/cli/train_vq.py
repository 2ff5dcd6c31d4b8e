"""VQ-VAE GAN training CLI.

Equivalent of `/root/reference/tokenizer/tokenizer_image/vq_train.py`:
alternating generator/discriminator optimization with LPIPS + adversarial
losses, EMA, checkpointing. Data: an ImageFolder directory (random-crop +
hflip, ref vq_train.py:114-119) or synthetic smoke mode.

  python -m llamagen_tpu.cli.train_vq --data-path /data/imagenet/train \
      --image-size 256 --vq-model VQ-16
"""

from __future__ import annotations

import argparse
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from llamagen_tpu.config import vq_config
from llamagen_tpu.parallel.mesh import make_mesh
from llamagen_tpu.train import vq as vq_train
from llamagen_tpu.utils import checkpoint
from llamagen_tpu.utils.logger import create_logger


def image_batches(root, image_size, batch_size, seed=0):
    """Random-crop(1.25x resize) + hflip ImageFolder stream."""
    from PIL import Image

    paths = []
    for dirpath, _, files in os.walk(root):
        for f in files:
            if f.lower().endswith((".jpg", ".jpeg", ".png", ".webp")):
                paths.append(os.path.join(dirpath, f))
    rng = np.random.RandomState(seed)
    while True:
        sel = rng.choice(len(paths), size=batch_size)
        imgs = []
        for i in sel:
            try:
                img = Image.open(paths[i]).convert("RGB")
            except OSError:
                continue
            # short-side resize to 1.25x, aspect PRESERVED (torchvision
            # Resize(int) semantics, ref vq_train.py:114-119) — a square
            # squash would geometrically distort every non-square image
            r = int(image_size * 1.25)
            w0, h0 = img.size
            if w0 <= h0:
                w1, h1 = r, max(r, round(r * h0 / w0))
            else:
                w1, h1 = max(r, round(r * w0 / h0)), r
            img = img.resize((w1, h1), Image.BICUBIC)
            y = rng.randint(0, h1 - image_size + 1)
            x = rng.randint(0, w1 - image_size + 1)
            arr = np.array(img)[y:y + image_size, x:x + image_size]
            if rng.rand() < 0.5:
                arr = arr[:, ::-1]
            imgs.append(arr)
        if len(imgs) == batch_size:
            yield np.stack(imgs).astype(np.float32) / 127.5 - 1.0


def synthetic_batches(image_size, batch_size, seed=0):
    rng = np.random.RandomState(seed)
    while True:
        yield rng.uniform(-1, 1, (batch_size, image_size, image_size, 3)
                          ).astype(np.float32)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--data-path", default=None)
    p.add_argument("--synthetic-steps", type=int, default=0)
    p.add_argument("--vq-model", default="VQ-16")
    p.add_argument("--codebook-size", type=int, default=16384)
    p.add_argument("--codebook-embed-dim", type=int, default=8)
    p.add_argument("--image-size", type=int, default=256)
    p.add_argument("--global-batch-size", type=int, default=128)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--max-steps", type=int, default=-1)
    p.add_argument("--disc-start", type=int, default=20000)
    p.add_argument("--disc-weight", type=float, default=0.5)
    p.add_argument("--disc-adaptive-weight", action="store_true",
                   help="grad-norm-ratio adaptive GAN weight "
                        "(ref vq_loss.py:109-115)")
    p.add_argument("--disc-type", default="patchgan",
                   choices=["patchgan", "stylegan"])
    p.add_argument("--disc-loss", default="hinge",
                   choices=["hinge", "vanilla", "non-saturating"])
    p.add_argument("--gen-loss", default="hinge",
                   choices=["hinge", "non-saturating"])
    p.add_argument("--rec-loss", default="l2", choices=["l1", "l2"])
    p.add_argument("--dropout-p", type=float, default=0.0,
                   help="res-block dropout (ref vq_train.py --dropout-p)")
    p.add_argument("--perceptual-weight", type=float, default=1.0)
    p.add_argument("--vgg-weights", default=None,
                   help="torchvision vgg16 state dict (.pt) for LPIPS")
    p.add_argument("--lpips-lins", default=
                   "/root/reference/tokenizer/tokenizer_image/cache/vgg.pth")
    p.add_argument("--ema", action="store_true")
    p.add_argument("--mixed-precision", default="bf16",
                   choices=["none", "bf16"],
                   help="autocast compute dtype (ref vq_train.py:314 "
                        "default bf16); params/optimizer stay f32")
    p.add_argument("--no-remat", action="store_true",
                   help="disable per-block activation checkpointing "
                        "(remat is required for 256px batches >=32/chip)")
    p.add_argument("--dp", type=int, default=-1,
                   help="data-parallel mesh size (-1 = all devices; the "
                        "reference's DDP over the cluster, vq_train.py:169)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--log-every", type=int, default=100)
    p.add_argument("--ckpt-every", type=int, default=5000)
    p.add_argument("--results-dir", default="results_vq")
    args = p.parse_args(argv)

    cfg = vq_config(args.vq_model, codebook_size=args.codebook_size,
                    codebook_embed_dim=args.codebook_embed_dim,
                    dropout_p=args.dropout_p)
    loss_cfg = vq_train.VQLossConfig(
        disc_start=args.disc_start, disc_weight=args.disc_weight,
        disc_type=args.disc_type, disc_loss=args.disc_loss,
        gen_adv_loss=args.gen_loss, reconstruction_loss=args.rec_loss,
        perceptual_weight=args.perceptual_weight if args.vgg_weights else 0.0,
        disc_adaptive_weight=args.disc_adaptive_weight,
        image_size=args.image_size)

    lpips_params = None
    if args.vgg_weights:
        import torch
        from llamagen_tpu.models import lpips as lpips_lib
        vgg_sd = {k: v.numpy() for k, v in
                  torch.load(args.vgg_weights, map_location="cpu").items()}
        lin_sd = {k: v.numpy() for k, v in
                  torch.load(args.lpips_lins, map_location="cpu").items()}
        lpips_params = lpips_lib.load_params(vgg_sd, lin_sd)

    logger = create_logger(args.results_dir)
    dp = args.dp if args.dp > 0 else len(jax.devices())
    if args.global_batch_size % dp:
        # the reference hard-asserts batch % world_size == 0
        # (vq_train.py:44); we clamp to the largest dividing dp so smoke
        # runs with tiny batches still work on big meshes
        dp = max(d for d in range(1, dp + 1)
                 if args.global_batch_size % d == 0)
    mesh = make_mesh(dp=dp, devices=jax.devices()[:dp])
    logger.info(f"mesh: dp={mesh.shape['dp']} over {len(jax.devices())} "
                f"device(s)")
    state, step_fn = vq_train.build_trainer(
        cfg, loss_cfg, mesh, lr=args.lr, use_ema=args.ema,
        ema_decay=0.999, seed=args.seed, lpips_params=lpips_params,
        compute_dtype=(jnp.bfloat16 if args.mixed_precision == "bf16"
                       else jnp.float32),
        remat=not args.no_remat)

    if args.synthetic_steps > 0:
        batches = synthetic_batches(args.image_size, args.global_batch_size,
                                    args.seed)
        max_steps = args.synthetic_steps
    elif args.data_path:
        batches = image_batches(args.data_path, args.image_size,
                                args.global_batch_size, args.seed)
        max_steps = args.max_steps
    else:
        raise SystemExit("need --data-path or --synthetic-steps")

    t0, last = time.time(), 0
    for step, imgs in enumerate(batches, 1):
        if max_steps > 0 and step > max_steps:
            break
        state, metrics = step_fn(state, vq_train.shard_vq_batch(imgs, mesh))
        if step % args.log_every == 0:
            sps = (step - last) / (time.time() - t0)
            logger.info(
                f"step {step}: rec {float(metrics['rec_loss']):.4f} "
                f"perc {float(metrics['perceptual_loss']):.4f} "
                f"vq {float(metrics['vq_loss']):.4f} "
                f"commit {float(metrics['commit_loss']):.4f} "
                f"usage {float(metrics['codebook_usage']):.3f} "
                f"d {float(metrics['disc_loss']):.4f} ({sps:.2f} steps/s)")
            t0, last = time.time(), step
        if step % args.ckpt_every == 0:
            path = checkpoint.save_step(
                os.path.join(args.results_dir, "checkpoints"), step, state)
            logger.info(f"saved {path}")

    checkpoint.save_step(os.path.join(args.results_dir, "checkpoints"),
                         step, state)
    logger.info(f"done at step {step}")


if __name__ == "__main__":
    main()
