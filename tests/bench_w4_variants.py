"""W4 kernel grouped-mode variant microbench (not pytest).

Times a single w4_matmul on 3B/XXL-class matrices for per-channel vs
grouped scales, isolating the grouped-mode overhead (the full-model
bench says grouped trails per-channel by ~0.5 img/s on GPT-3B).

Usage: python tests/bench_w4_variants.py [--ch N] (tune chunk size via env)
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np


def bench_one(name, k, n, b=16, group=128, per_channel=False, reps=200):
    from llamagen_tpu.ops.w4_matmul import pack_w4, w4_matmul

    rng = np.random.RandomState(0)
    w = jnp.asarray(rng.randn(k, n).astype(np.float32) * 0.02)
    kw = {"per_channel": True} if per_channel else {"group_size": group}
    blocks, scales = jax.jit(
        lambda w: pack_w4(w, **kw))(w)
    x = jnp.asarray(rng.randn(b, k).astype(np.float32), jnp.bfloat16)

    @jax.jit
    def many(x):
        def step(acc, _):
            y = w4_matmul(x + acc * 0, blocks, scales)
            return jnp.sum(y) * 1e-20, None
        acc, _ = jax.lax.scan(step, jnp.bfloat16(0), None, length=reps)
        return acc

    many(x).block_until_ready()
    t0 = time.time()
    r = many(x)
    np.asarray(r)
    dt = (time.time() - t0) / reps
    gbs = k / 2 * n / dt / 1e9
    mode = "pc" if per_channel else f"g{group}"
    print(f"{name} [{k}x{n}] {mode}: {dt * 1e6:.1f} us/call "
          f"({gbs:.0f} GB/s packed)", flush=True)


if __name__ == "__main__":
    for (name, k, n) in [("3B-w2", 8704, 3200), ("3B-w1", 3200, 8704),
                         ("XXL-w2", 4096, 1536)]:
        for mode in ("pc", "g128", "g64"):
            bench_one(name, k, n,
                      per_channel=mode == "pc",
                      group=64 if mode == "g64" else 128)
