"""VQ-GAN stage-1 training throughput bench (not pytest): real chip.

The reference's stage-1 trainer is torchrun DDP
(`/root/reference/tokenizer/tokenizer_image/vq_train.py`, global batch
128+ over the cluster); it publishes no throughput. This measures OUR
per-chip number for the sharded trainer (train/vq.py::build_trainer,
dp=1 mesh on the single chip — the dp>1 math is parity-tested on the
virtual mesh) plus a step anatomy via knockouts.

Usage: python tests/bench_train_vq.py [batch] [image_size]
         [--knockouts]  (adds no-LPIPS / no-disc / recon-only passes)
"""

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np


def run_config(batch, image_size, lpips_params, label, use_disc=True):
    from llamagen_tpu.config import vq_config
    from llamagen_tpu.parallel.mesh import make_mesh
    from llamagen_tpu.train import vq as vq_train

    cfg = vq_config("VQ-16")
    loss_cfg = vq_train.VQLossConfig(disc_start=0, image_size=image_size)
    mesh = make_mesh(-1, 1, 1)
    # bf16 autocast + block remat: the reference's default precision
    # (vq_train.py:314) and the only way a 256px batch fits 16 GB
    state, step_fn = vq_train.build_trainer(
        cfg, loss_cfg, mesh, use_ema=True, lpips_params=lpips_params,
        use_disc=use_disc, compute_dtype=jnp.bfloat16, remat=True)

    rng = np.random.RandomState(0)
    imgs = rng.uniform(-1, 1, (batch, image_size, image_size, 3)) \
              .astype(np.float32)
    batch_dev = vq_train.shard_vq_batch(imgs, mesh)

    state, m = step_fn(state, batch_dev)   # compile
    _ = float(m["gen_loss"])
    n_steps = 10
    t0 = time.time()
    for _ in range(n_steps):
        state, m = step_fn(state, batch_dev)
    _ = float(m["gen_loss"])               # host sync
    dt = (time.time() - t0) / n_steps
    print(json.dumps({
        "config": label, "batch": batch, "image_size": image_size,
        "sec_per_step": round(dt, 4),
        "img_per_sec": round(batch / dt, 2),
    }))
    return dt


def main(batch=64, image_size=256, knockouts=False):
    from llamagen_tpu.models import lpips as lpips_lib

    # random-init LPIPS: the vgg16 backbone is weights-gated in this
    # environment, and throughput only needs the FLOPs, not the values
    lpips_params = lpips_lib.init_params(jax.random.PRNGKey(9))

    full = run_config(batch, image_size, lpips_params, "full")
    if knockouts:
        # static knockouts (use_lpips / use_disc compile the op away);
        # shares are directional (XLA refuses to hold fusion constant)
        nolp = run_config(batch, image_size, None, "no-LPIPS")
        nod = run_config(batch, image_size, lpips_params, "no-disc",
                         use_disc=False)
        rec = run_config(batch, image_size, None, "recon-only",
                         use_disc=False)
        print(json.dumps({
            "anatomy_s": {
                "full": round(full, 4),
                "lpips_share": round(full - nolp, 4),
                "disc_share": round(full - nod, 4),
                "recon_core": round(rec, 4),
            }}))


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    main(*(int(a) for a in args[:2]), knockouts="--knockouts" in sys.argv)
