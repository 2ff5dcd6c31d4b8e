"""Baseline-tokenizer reconstruction comparison rig (SD-VAE, consistency
decoder, taming VQGAN).

Equivalent of the reference comparison rigs
`/root/reference/tokenizer/vae/reconstruction_vae_ddp.py` (diffusers
AutoencoderKL), `tokenizer/consistencydecoder/reconstruction_cd_ddp.py`
(ConsistencyDecoderVAE) and `tokenizer/vqgan/reconstruction_vqgan_ddp.py`
(taming checkpoints): roundtrip a validation folder through a baseline
autoencoder and report PSNR/SSIM (+ npz for rFID) on the same protocol as
`cli.reconstruction_vq`, so tokenizers are comparable apples-to-apples.

Backends:
  taming        — CompVis taming-transformers VQGAN checkpoint, run on our
                  VQ implementation via utils.convert.convert_taming_vq
                  (fully offline)
  sd-vae        — AutoencoderKL run on OUR JAX implementation
                  (models/klvae.py; weights-gated like CLIP/LPIPS: point
                  --ckpt at a local diffusers or LDM-layout checkpoint,
                  utils.convert.convert_sd_vae handles both)
  cd            — OpenAI consistency decoder on OUR JAX implementation
                  (models/consistency_decoder.py: conv U-Net + 2-step
                  consistency sampler; SD-VAE encoder side from
                  models/klvae.py). Weights-gated: --ckpt is the
                  ConvUNetVAE-layout decoder checkpoint, --vae-ckpt the
                  SD-VAE encoder
  consistency   — diffusers ConsistencyDecoderVAE (gated: needs the
                  diffusers package + local weights; torch-side
                  comparison fallback)

  python -m llamagen_tpu.cli.reconstruction_baseline --backend taming \
      --ckpt vqgan_imagenet_f16_16384.ckpt --data-path /data/val
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from llamagen_tpu.cli.extract_codes import center_crop, iter_image_folder
from llamagen_tpu.eval.metrics import psnr, ssim


def _taming_roundtrip(ckpt, taming_name, cfg_overrides=None):
    import jax
    import jax.numpy as jnp
    import torch

    from llamagen_tpu.models import vq as vq_lib
    from llamagen_tpu.utils.convert import convert_taming_vq, taming_vq_config

    cfg = taming_vq_config(taming_name)
    if cfg_overrides:
        import dataclasses
        cfg = dataclasses.replace(cfg, **cfg_overrides)
    sd = torch.load(ckpt, map_location="cpu")
    sd = sd.get("state_dict", sd)
    params = jax.tree.map(jnp.asarray, convert_taming_vq(
        {k: np.asarray(v) for k, v in sd.items()}, cfg))

    @jax.jit
    def fn(x):
        zq, _, _ = vq_lib.encode(params, x, cfg, train=False)
        return vq_lib.decode(params, zq, cfg)

    return lambda batch: np.asarray(fn(jnp.asarray(batch)), np.float32)


def _sd_vae_roundtrip(ckpt, vae_config=None):
    """JAX SD-VAE roundtrip (models/klvae.py): local diffusers- or
    LDM-layout weights via utils.convert.convert_sd_vae. Deterministic
    mean latent (metric stability; pass rng for sampled latents)."""
    import jax
    import jax.numpy as jnp

    from llamagen_tpu.models import klvae
    from llamagen_tpu.utils.convert import convert_sd_vae

    cfg = klvae.KLVAEConfig(**(vae_config or {}))
    if ckpt.endswith(".safetensors"):
        from safetensors.numpy import load_file
        sd = load_file(ckpt)
    else:
        import torch
        sd = torch.load(ckpt, map_location="cpu", weights_only=False)
        sd = sd.get("state_dict", sd)
        sd = {k: np.asarray(v) for k, v in sd.items()}
    params = jax.tree.map(jnp.asarray, convert_sd_vae(sd, cfg))

    @jax.jit
    def fn(x):
        return klvae.roundtrip(params, x, cfg)

    return lambda batch: np.asarray(fn(jnp.asarray(batch)), np.float32)


def _cd_roundtrip(ckpt, vae_ckpt, vae_config=None, cd_config=None, seed=0):
    """JAX consistency-decoder roundtrip: SD-VAE encode (models/klvae) ->
    2-step consistency decode (models/consistency_decoder)."""
    import jax
    import jax.numpy as jnp

    from llamagen_tpu.models import consistency_decoder as cd_lib
    from llamagen_tpu.models import klvae
    from llamagen_tpu.utils.convert import (convert_consistency_decoder,
                                            convert_sd_vae)

    vae_cfg = klvae.KLVAEConfig(**(vae_config or {}))
    cd_cfg = cd_lib.CDConfig(**(cd_config or {}))

    def load_sd(path):
        if path.endswith(".safetensors"):
            from safetensors.numpy import load_file
            return dict(load_file(path))
        import torch
        sd = torch.load(path, map_location="cpu", weights_only=False)
        sd = sd.get("state_dict", sd)
        return {k: np.asarray(v) for k, v in sd.items()}

    import jax
    vae_params = jax.tree.map(jnp.asarray,
                              convert_sd_vae(load_sd(vae_ckpt), vae_cfg))
    cd_params = jax.tree.map(
        jnp.asarray, convert_consistency_decoder(load_sd(ckpt), cd_cfg))
    key = jax.random.PRNGKey(seed)

    @jax.jit
    def fn(x, key):
        return cd_lib.roundtrip(vae_params, cd_params, x, vae_cfg, cd_cfg,
                                key)

    state = {"key": key}

    def run(batch):
        state["key"], k = jax.random.split(state["key"])
        return np.asarray(fn(jnp.asarray(batch), k), np.float32)

    return run


def _diffusers_roundtrip(kind, ckpt):
    try:
        import torch
        from diffusers import ConsistencyDecoderVAE
        model = ConsistencyDecoderVAE.from_pretrained(
            ckpt, local_files_only=True)
    except ImportError as e:
        raise SystemExit(
            f"backend '{kind}' needs the diffusers package and local "
            f"weights ({e}); this environment has no egress — "
            f"use --backend taming or sd-vae, or supply weights offline")
    model.eval()

    def fn(batch):
        with torch.no_grad():
            x = torch.from_numpy(batch).permute(0, 3, 1, 2)
            lat = model.encode(x).latent_dist.sample()
            out = model.decode(lat).sample
        return out.permute(0, 2, 3, 1).numpy()

    return fn


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--backend", required=True,
                   choices=["taming", "sd-vae", "cd"])
    p.add_argument("--ckpt", required=True)
    p.add_argument("--taming-config", default="vqgan_imagenet_f16_16384")
    p.add_argument("--taming-overrides", default=None,
                   help="json dict of VQConfig overrides (tests)")
    p.add_argument("--vae-config", default=None,
                   help="json dict of KLVAEConfig overrides (sd-vae/cd)")
    p.add_argument("--vae-ckpt", default=None,
                   help="cd backend: SD-VAE encoder checkpoint")
    p.add_argument("--cd-config", default=None,
                   help="json dict of CDConfig overrides (cd)")
    p.add_argument("--data-path", required=True)
    p.add_argument("--image-size", type=int, default=256)
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--max-images", type=int, default=50000)
    p.add_argument("--npz-out", default=None)
    args = p.parse_args(argv)

    from PIL import Image

    if args.backend == "taming":
        import json
        overrides = (json.loads(args.taming_overrides)
                     if args.taming_overrides else None)
        if overrides:
            for k in ("encoder_ch_mult", "decoder_ch_mult"):
                if k in overrides:
                    overrides[k] = tuple(overrides[k])
        roundtrip = _taming_roundtrip(args.ckpt, args.taming_config,
                                      overrides)
    elif args.backend == "sd-vae":
        import json
        vc = json.loads(args.vae_config) if args.vae_config else None
        if vc and "ch_mult" in vc:
            vc["ch_mult"] = tuple(vc["ch_mult"])
        roundtrip = _sd_vae_roundtrip(args.ckpt, vc)
    elif args.backend == "cd":
        import json
        vc = json.loads(args.vae_config) if args.vae_config else None
        if vc and "ch_mult" in vc:
            vc["ch_mult"] = tuple(vc["ch_mult"])
        cc = json.loads(args.cd_config) if args.cd_config else None
        if cc and "ch_mult" in cc:
            cc["ch_mult"] = tuple(cc["ch_mult"])
        assert args.vae_ckpt, "--backend cd needs --vae-ckpt (encoder)"
        roundtrip = _cd_roundtrip(args.ckpt, args.vae_ckpt, vc, cc)
    else:
        roundtrip = _diffusers_roundtrip(args.backend, args.ckpt)

    psnrs, ssims, recon_images = [], [], []
    batch, n = [], 0
    want_npz = args.npz_out is not None

    def run_batch():
        nonlocal n
        if not batch:
            return
        x = np.stack(batch).astype(np.float32) / 127.5 - 1.0
        recon = np.clip(roundtrip(x), -1, 1)
        for orig, rec in zip(x, recon):
            o = (orig + 1) / 2
            r = (rec + 1) / 2
            psnrs.append(psnr(o, r))
            ssims.append(ssim(o, r))
            if want_npz:
                recon_images.append((r * 255).astype(np.uint8))
        n += len(batch)
        batch.clear()
        print(f"{n} images: PSNR {np.mean(psnrs):.3f} "
              f"SSIM {np.mean(ssims):.4f}", flush=True)

    for path, _ in iter_image_folder(args.data_path):
        if n + len(batch) >= args.max_images:
            break
        try:
            img = Image.open(path).convert("RGB")
        except OSError:
            continue
        batch.append(center_crop(img, args.image_size))
        if len(batch) >= args.batch_size:
            run_batch()
    run_batch()

    print(f"FINAL ({args.backend}): PSNR {np.mean(psnrs):.4f}, "
          f"SSIM {np.mean(ssims):.5f} over {n} images")
    if want_npz:
        np.savez(args.npz_out, arr_0=np.stack(recon_images))
        print(f"wrote {args.npz_out} for rFID")


if __name__ == "__main__":
    main()
