"""W4A16 bench: throughput + teacher-forced numerics vs bf16 weights.

Usage: python tests/bench_int4w.py [GPT-3B] [--group 128] [--head]

int4 halves the weight bytes of W8A16 again — aimed at the weights-bound
tail of the zoo (GPT-XXL/3B, BENCH.md serve table) where the decode step
streams multi-GB weight matrices per token. Numerics are lossier than
W8A16 (group-wise RTN int4); this harness prints the measured logits
error so BENCH.md can document the tradeoff honestly.

Baselines: A100+vLLM serve table (`serve/README.md:12-16`).
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_S = {"GPT-B": 2.39, "GPT-L": 3.48, "GPT-XL": 4.84,
              "GPT-XXL": 6.36, "GPT-3B": 6.26}


def main(name="GPT-3B", group=128, quantize_head=False):
    from llamagen_tpu.config import gpt_config
    from llamagen_tpu.models import gpt
    from llamagen_tpu.ops.generate import generate
    from llamagen_tpu.ops.quant_matmul import quantize_gpt_params

    cfg = gpt_config(name, block_size=576, cls_token_num=1)
    params = gpt.init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
    params = dict(params)
    params["output"] = (jax.random.normal(
        jax.random.PRNGKey(7), params["output"].shape) * 0.02
    ).astype(jnp.bfloat16)
    qparams = jax.jit(
        lambda p: quantize_gpt_params(p, bits=4, group_size=group,
                                      quantize_head=quantize_head)
    )(params)

    batch = 8
    labels = jnp.asarray(np.arange(batch) * 100 % 1000)

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
    print(f"{name} teacher-forced argmax agreement int4-w vs bf16-w: "
          f"{agree:.4f}", flush=True)
    print(f"logits err: max {emax:.4f}, mean {emean:.4f}, "
          f"logit scale {scale:.4f}", flush=True)
    del params

    def run(p, seed):
        seq = generate(p, jax.random.PRNGKey(seed), labels, cfg=cfg,
                       max_new_tokens=cfg.block_size, cfg_scale=2.0,
                       temperature=1.0, top_k=0, top_p=1.0,
                       cache_dtype=jnp.int8)
        return np.asarray(seq)

    run(qparams, 0)
    run(qparams, 0)
    times = []
    for i in range(3):
        t0 = time.time()
        run(qparams, i + 1)
        times.append(time.time() - t0)
    best = min(times)
    ips = batch / best
    base = 8.0 / BASELINE_S[name]
    print(f"{name} int4-weights (group {group}"
          f"{', int4 head' if quantize_head else ''}) batch-8: "
          f"{ips:.3f} img/s ({best / cfg.block_size * 1e3:.3f} ms/step, "
          f"vs_baseline {ips / base:.3f})", flush=True)


if __name__ == "__main__":
    args = [a for a in sys.argv[1:]]
    name = next((a for a in args if a.startswith("GPT-")), "GPT-3B")
    group = int(args[args.index("--group") + 1]) if "--group" in args else 128
    main(name, group, quantize_head="--head" in args)
