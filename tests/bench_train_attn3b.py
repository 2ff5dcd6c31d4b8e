"""Isolated training-attention cost at GPT-3B geometry (not pytest).

head_dim=100 (the one zoo model off 8-lane alignment) now runs the
training kernel through the zero-padding wrapper
(ops/train_attention.py::causal_attention_padded). This measures the
per-layer fwd+bwd cost on the real chip at 3B's 384px training geometry
([B, 577, 32, 100] bf16) for: the padded kernel at 104- and 128-lane
alignment, and the einsum SDPA fallback it replaces.

Timing: one jitted lax.scan chains ITERS grad steps with a carry
dependence (q' = q + 1e-6*dq) so the tunnel's dispatch latency
amortizes and XLA cannot hoist the body (BENCH.md methodology).

Usage: python tests/bench_train_attn3b.py [batch] [seq]
"""

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

ITERS = 10


def bench(label, fn, q, k, v, scale):
    def loss(q, k, v):
        return jnp.sum(fn(q, k, v, scale).astype(jnp.float32) ** 2)

    grad_q = jax.grad(loss)

    @jax.jit
    def chained(q, k, v):
        def body(c, _):
            dq = grad_q(c, k, v)
            return c + jnp.bfloat16(1e-6) * dq.astype(c.dtype), None
        return jax.lax.scan(body, q, None, length=ITERS)[0]

    r = chained(q, k, v)           # compile
    _ = np.asarray(r[0, 0, 0, :1])
    t0 = time.time()
    r = chained(q, k, v)
    _ = np.asarray(r[0, 0, 0, :1])  # host sync (block_until_ready unreliable)
    dt = (time.time() - t0) / ITERS
    print(json.dumps({"config": label, "ms_per_layer_fwd_bwd":
                      round(dt * 1e3, 2)}))
    return dt


def main(batch=32, seq=577):
    from llamagen_tpu.ops.train_attention import causal_attention_padded

    h, d = 32, 100
    rng = np.random.RandomState(0)
    q, k, v = (jnp.asarray(rng.randn(batch, seq, h, d), jnp.bfloat16)
               for _ in range(3))
    scale = d ** -0.5

    def einsum_sdpa(q, k, v, scale):
        # the fallback this replaces (gpt._sdpa bf16_scores path)
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k) * jnp.bfloat16(scale)
        s = q.shape[1]
        mask = jnp.tril(jnp.ones((s, s), bool))[None, None]
        scores = jnp.where(mask, scores, jnp.bfloat16(-3e38))
        p = jax.nn.softmax(scores.astype(jnp.float32), -1).astype(q.dtype)
        return jnp.einsum("bhqk,bkhd->bqhd", p, v)

    bench(f"einsum-sdpa b{batch} s{seq}", einsum_sdpa, q, k, v, scale)
    # align=8 plans pad104 first, finds no VMEM-fitting 128-aligned head
    # group at that width, and auto-escalates to pad128 with head-group
    # gridding (fwd 8 heads/block, bwd 4)
    os.environ["LLAMAGEN_TRAIN_ATTN_PAD"] = "8"
    bench(f"kernel-auto(104->128,grouped) b{batch} s{seq}",
          causal_attention_padded, q, k, v, scale)


if __name__ == "__main__":
    main(*(int(a) for a in sys.argv[1:3]))
