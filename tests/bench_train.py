"""Training-step throughput bench (not pytest): GPT c2i on the real chip.

The reference publishes no training throughput, so this line documents
our own: tokens/sec and model-FLOPs-utilization for the pjit'd training
step (`train/c2i.py` — fused forward+backward+adamw+ema, bf16 compute).

Usage: python tests/bench_train.py [GPT-B] [batch] [latent=16] [--save-attn]
  latent: token grid side (16 = 256px training, 24 = 384px / S=577 —
  the geometry the serve-table models are trained at; exercises the
  head-group-gridded training-attention kernel on GPT-L+)
  --save-attn: selective remat (save each layer's attention-core output,
  recompute only the rest — skips the attention kernel fwd in the
  backward recompute at +[B,S,F] bf16 HBM per layer)
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

V5E_BF16_FLOPS = 197e12  # peak per chip


def main(model="GPT-B", batch=256, latent=16, remat=True):
    from llamagen_tpu.config import gpt_config
    from llamagen_tpu.parallel.mesh import make_mesh
    from llamagen_tpu.train import c2i

    cfg = gpt_config(model, block_size=latent * latent, cls_token_num=1)
    mesh = make_mesh(1, 1, 1)
    state, step_fn = c2i.build_trainer(cfg, mesh, remat=remat)

    rng = np.random.RandomState(0)
    batch_data = c2i.shard_batch(c2i.Batch(
        labels=jnp.asarray(rng.randint(0, 1000, size=(batch,))),
        tokens=jnp.asarray(rng.randint(0, cfg.vocab_size,
                                       size=(batch, cfg.block_size)))), mesh)
    key = jax.random.PRNGKey(0)

    state, metrics = step_fn(state, batch_data, key)  # compile
    _ = float(metrics["loss"])
    n_steps = 10
    t0 = time.time()
    for _ in range(n_steps):
        state, metrics = step_fn(state, batch_data, key)
    _ = float(metrics["loss"])  # host sync
    dt = (time.time() - t0) / n_steps

    n_params = sum(x.size for x in jax.tree.leaves(state.params))
    tokens = batch * cfg.block_size
    flops = 6 * n_params * tokens  # fwd+bwd matmul FLOPs
    print(json.dumps({
        "model": model, "batch": batch, "seq": cfg.block_size + 1,
        "remat": remat if isinstance(remat, str) else "full",
        "sec_per_step": round(dt, 4),
        "tokens_per_sec": round(tokens / dt),
        "samples_per_sec": round(batch / dt, 1),
        "mfu": round(flops / dt / V5E_BF16_FLOPS, 3),
    }))


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    remat = "save_attn" if "--save-attn" in sys.argv else True
    main(*(args[0:1] or ["GPT-B"]), *(int(a) for a in args[1:3]),
         remat=remat)
