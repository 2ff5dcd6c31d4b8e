"""GPT-L 384 batch-8 CFG bench with int8 weights (not a pytest file).

Measures images/sec and greedy-token agreement vs bf16 weights on the
real TPU. Mirrors bench.py's operating point.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from llamagen_tpu.config import gpt_config
    from llamagen_tpu.models import gpt
    from llamagen_tpu.ops.generate import generate
    from llamagen_tpu.ops.quant_matmul import quantize_gpt_params

    cfg = gpt_config("GPT-L", block_size=576, cls_token_num=1)
    params = gpt.init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
    # non-degenerate output head (init zeroes it; greedy would be trivial)
    params = dict(params)
    params["output"] = (jax.random.normal(
        jax.random.PRNGKey(7), params["output"].shape) * 0.02
    ).astype(jnp.bfloat16)
    qparams = quantize_gpt_params(params)

    batch = 8
    labels = jnp.asarray(np.arange(batch) * 100 % 1000)

    def run(p, seed, greedy=False):
        seq = generate(p, jax.random.PRNGKey(seed), labels, cfg=cfg,
                       max_new_tokens=cfg.block_size, cfg_scale=2.0,
                       temperature=0.0 if greedy else 1.0, top_k=0,
                       top_p=1.0, cache_dtype=jnp.int8)
        return np.asarray(seq)

    # teacher-forced evidence: identical forced context, per-position
    # argmax agreement + logits error (rollout agreement is chain-
    # sensitive: one marginal flip diverges the rest of the stream and
    # says nothing about per-step fidelity)
    rng2 = np.random.RandomState(1)
    tokens = jnp.asarray(rng2.randint(0, cfg.vocab_size,
                                      size=(batch, cfg.block_size)))

    @jax.jit
    def tf_compare(p1, p2):
        l1, _ = gpt.forward_train(p1, cfg, labels, tokens[:, :-1],
                                  train=False, compute_dtype=jnp.bfloat16)
        l2, _ = gpt.forward_train(p2, cfg, labels, tokens[:, :-1],
                                  train=False, compute_dtype=jnp.bfloat16)
        agree = jnp.mean(jnp.argmax(l1, -1) == jnp.argmax(l2, -1))
        err = jnp.abs(l2 - l1)
        return agree, err.max(), err.mean(), jnp.abs(l1).mean()

    agree, emax, emean, scale = [float(np.asarray(x))
                                 for x in tf_compare(params, qparams)]
    print(f"teacher-forced argmax agreement int8-w vs bf16-w: {agree:.4f}")
    print(f"logits err: max {emax:.4f}, mean {emean:.4f}, "
          f"logit scale {scale:.4f}")

    run(qparams, 0)
    run(qparams, 0)
    times = []
    for i in range(3):
        t0 = time.time()
        run(qparams, i + 1)
        times.append(time.time() - t0)
    best = min(times)
    ips = batch / best
    print(f"int8-weights batch-8: {ips:.3f} img/s "
          f"({best / cfg.block_size * 1e3:.3f} ms/step, "
          f"vs_baseline {ips / (8.0 / 3.48):.3f})")


if __name__ == "__main__":
    main()
