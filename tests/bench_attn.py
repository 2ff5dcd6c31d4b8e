"""Attention-kernel microbench on the real TPU (not a pytest file).

24 sequential GPT-L-geometry decode-attention calls (one per layer) at
pos~300, int8 cache — mirrors the BENCH.md attention-only row.
"""

import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from llamagen_tpu.ops.attention import decode_attention, recent_window

B, H, D = 16, 16, 64
F = H * D
S = 640
LAYERS = 24
POS = 300


def main():
    rng = np.random.RandomState(0)
    w = recent_window(jnp.int8)
    q = jnp.asarray(rng.randn(B, F), jnp.bfloat16)
    recent = jnp.asarray(rng.randn(B, w, 2 * F), jnp.bfloat16)
    kv_new = jnp.asarray(rng.randn(B, 2 * F), jnp.bfloat16)
    caches = [jnp.asarray(rng.randint(-127, 128, size=(B, S, 2 * F)), jnp.int8)
              for _ in range(LAYERS)]
    scales = [jnp.asarray(rng.rand(B, S, 128), jnp.float32)
              for _ in range(LAYERS)]
    pos = jnp.full((B,), POS, jnp.int32)

    @functools.partial(jax.jit, donate_argnums=(2, 3))
    def step(q, recent, caches, scales, pos):
        outs = []
        new_c, new_s = [], []
        for i in range(LAYERS):
            o, c, s, _ = decode_attention(q, kv_new, recent, caches[i],
                                          pos, H, kv_scale=scales[i])
            outs.append(o)
            new_c.append(c)
            new_s.append(s)
        return sum(outs), new_c, new_s

    o, caches, scales = step(q, recent, caches, scales, pos)
    np.asarray(o)  # warm 1 (compile)
    o, caches, scales = step(q, recent, caches, scales, pos)
    np.asarray(o)  # warm 2
    times = []
    for _ in range(10):
        t0 = time.time()
        o, caches, scales = step(q, recent, caches, scales, pos)
        np.asarray(o)
        times.append(time.time() - t0)
    ms = min(times) * 1e3
    print(f"attention-only {LAYERS} layers, B={B}, pos={POS}, int8: "
          f"{ms:.3f} ms  ({ms / LAYERS * 1e3:.1f} us/layer)")


if __name__ == "__main__":
    main()
