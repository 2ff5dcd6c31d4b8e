"""50k-sample generation for FID evaluation (multi-chip, streaming writes).

Equivalent of `/root/reference/autoregressive/sample/sample_c2i_ddp.py`
(rank-strided DDP over 8 GPUs, :141-155) redesigned TPU-first:

  - the batch is sharded over all local devices with `shard_map`; each
    device shard samples an independent BLOCK whose rng key derives from
    the block's GLOBAL index — so the token streams are identical no
    matter how many devices/hosts participate (tested on the virtual mesh)
  - samples are written incrementally into a disk-backed `.npy` memmap
    (np.lib.format.open_memmap) — the 50k x 256 x 256 x 3 array never
    lives in host RAM (the reference accumulates per-rank pngs instead)
  - multi-host: each host takes a stride of the block groups and writes
    its own rows of the shared-layout output file

  python -m llamagen_tpu.cli.sample_c2i_fid --gpt-ckpt c2i_L_384.pt \
      --vq-ckpt vq_ds16_c2i.pt --gpt-model GPT-L --image-size 384 \
      --image-size-eval 256 --cfg-scale 2.0 --num-samples 50000
"""

from __future__ import annotations

import argparse
import functools
import os
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from llamagen_tpu.cli.common import load_gpt, load_vq
from llamagen_tpu.models import vq as vq_lib
from llamagen_tpu.ops.generate import generate


def block_key(seed: int, block: int):
    """The rng key of global sample-block `block` — device-placement
    independent by construction."""
    return jax.random.fold_in(jax.random.PRNGKey(seed), block)


def block_labels(seed: int, block: int, bs: int, num_classes: int):
    return np.random.RandomState(seed * 100003 + block).randint(
        0, num_classes, size=(bs,)).astype(np.int32)


def make_sharded_sampler(gpt_params, gpt_cfg, vq_params, vq_cfg, mesh,
                         bs: int, latent: int, gen_kw: dict,
                         compute_dtype=jnp.bfloat16):
    """One jitted program sampling n_devices blocks at once: labels/keys
    sharded over the `dp` axis, each shard running its own block."""
    from jax import shard_map  # jax >= 0.8 top-level API

    def one_block(params, vqp, key_data, labels):
        key = jax.random.wrap_key_data(key_data[0])
        seq = generate(params, key, labels, cfg=gpt_cfg,
                       max_new_tokens=latent * latent,
                       compute_dtype=compute_dtype, **gen_kw)
        imgs = vq_lib.decode_code(
            vqp, seq.reshape(labels.shape[0], latent, latent), vq_cfg)
        return seq, imgs.astype(jnp.float32)

    mapped = shard_map(
        one_block, mesh=mesh,
        in_specs=(P(), P(), P("dp"), P("dp")),
        out_specs=(P("dp"), P("dp")), check_vma=False)

    @jax.jit
    def run(key_data, labels):
        return mapped(gpt_params, vq_params, key_data, labels)

    return run


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
    p.add_argument("--per-device-batch-size", "--per-proc-batch-size",
                   dest="per_device_batch_size", type=int, default=32)
    p.add_argument("--num-samples", type=int, default=50000)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--sample-dir", default="samples")
    p.add_argument("--npz", action="store_true",
                   help="also zip the memmap into an ADM-style .npz")
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
    bs = args.per_device_batch_size
    devices = jax.local_devices()
    ndev = len(devices)
    mesh = Mesh(np.array(devices), ("dp",))
    gen_kw = dict(cfg_scale=args.cfg_scale, cfg_interval=args.cfg_interval,
                  temperature=args.temperature, top_k=args.top_k,
                  top_p=args.top_p, cache_dtype=dtype)
    sampler = make_sharded_sampler(gpt_params, gpt_cfg, vq_params, vq_cfg,
                                   mesh, bs, latent, gen_kw, dtype)

    num_blocks = (args.num_samples + bs - 1) // bs
    num_groups = (num_blocks + ndev - 1) // ndev
    host_id, num_hosts = jax.process_index(), jax.process_count()

    os.makedirs(args.sample_dir, exist_ok=True)
    name = (f"{args.gpt_model}-{args.image_size}-size-{args.image_size_eval}"
            f"-cfg-{args.cfg_scale}-seed-{args.seed}")
    suffix = f"-h{host_id:03d}" if num_hosts > 1 else ""
    npy_path = os.path.join(args.sample_dir, f"{name}{suffix}.npy")
    out = np.lib.format.open_memmap(
        npy_path, mode="w+", dtype=np.uint8,
        shape=(args.num_samples, args.image_size_eval,
               args.image_size_eval, 3))

    t0 = time.time()
    written = 0
    for g in range(host_id, num_groups, num_hosts):
        blocks = [min(g * ndev + d, num_blocks - 1) for d in range(ndev)]
        keys = np.stack([np.asarray(jax.random.key_data(
            block_key(args.seed, b))) for b in blocks])
        labels = np.concatenate([
            block_labels(args.seed, b, bs, args.num_classes)
            for b in blocks])
        _, imgs = sampler(jnp.asarray(keys), jnp.asarray(labels))
        imgs = np.clip((np.asarray(imgs) + 1) * 127.5, 0, 255
                       ).astype(np.uint8)
        for d, b in enumerate(blocks):
            start = b * bs
            stop = min(start + bs, args.num_samples)
            if stop <= start or (d > 0 and blocks[d] == blocks[d - 1]):
                continue
            chunk = imgs[d * bs:d * bs + (stop - start)]
            if args.image_size_eval != args.image_size:
                chunk = np.stack([
                    np.array(Image.fromarray(im).resize(
                        (args.image_size_eval, args.image_size_eval),
                        Image.BICUBIC)) for im in chunk])
            out[start:stop] = chunk
            written += stop - start
        if g % 10 == 0:
            rate = max(written, 1) / (time.time() - t0)
            print(f"{written}/{args.num_samples} ({rate:.2f} img/s)",
                  flush=True)
    out.flush()
    print(f"wrote {written} samples to {npy_path} "
          f"({written / max(time.time() - t0, 1e-9):.2f} img/s overall)")

    if args.npz and num_hosts == 1:
        npz_path = npy_path[:-4] + ".npz"
        np.savez(npz_path, arr_0=out)
        print(f"zipped to {npz_path}")


if __name__ == "__main__":
    main()
