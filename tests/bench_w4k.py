"""W4A16 Pallas-kernel bench: throughput + teacher-forced numerics.

Usage: python tests/bench_w4k.py [GPT-3B] [--per-channel] [--skip-tf]
       [--group 64] [--gptq] [--awq] [--calib-batches N]

--gptq runs the calibrated GPTQ quantizer (ops/gptq.py) instead of RTN:
same kernel layout, better levels; calibration tokens are random (the
honest random-weight bound this harness measures). --awq applies the
activation-aware equalization pre-pass (ops/awq.py) before either
quantizer; composable with --gptq.

The kernel streams nibble-packed weights at ~700 GB/s of packed bytes
(half of W8A16's traffic); grouped scales cost extra MXU issue latency,
per-channel runs DMA-bound (ops/w4_matmul.py). Baselines: A100+vLLM
serve table (`serve/README.md:12-16`).
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_S = {"GPT-B": 2.39, "GPT-L": 3.48, "GPT-XL": 4.84,
              "GPT-XXL": 6.36, "GPT-3B": 6.26}


def main(name="GPT-3B", per_channel=False, skip_tf=False, group=128,
         gptq=False, calib_batches=4, awq=False):
    from llamagen_tpu.config import gpt_config
    from llamagen_tpu.models import gpt
    from llamagen_tpu.ops.generate import generate
    from llamagen_tpu.ops.w4_matmul import quantize_gpt_params_w4k

    cfg = gpt_config(name, block_size=576, cls_token_num=1)
    params = gpt.init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
    params = dict(params)
    params["output"] = (jax.random.normal(
        jax.random.PRNGKey(7), params["output"].shape) * 0.02
    ).astype(jnp.bfloat16)
    bf16_params = params
    if awq:
        from llamagen_tpu.ops.awq import awq_equalize_gpt_params
        crng = np.random.RandomState(5)
        alabels = jnp.asarray(crng.randint(0, 1000, size=(8 * calib_batches,)))
        atokens = jnp.asarray(crng.randint(
            0, cfg.vocab_size, size=(8 * calib_batches, cfg.block_size)))
        t0 = time.time()
        params = awq_equalize_gpt_params(
            params, cfg, alabels, atokens, per_channel=per_channel,
            group_size=group, verbose=True)
        print(f"awq equalization took {time.time() - t0:.1f}s", flush=True)
    if gptq:
        from llamagen_tpu.ops.gptq import gptq_quantize_gpt_params
        crng = np.random.RandomState(3)
        clabels = jnp.asarray(crng.randint(0, 1000, size=(8 * calib_batches,)))
        ctokens = jnp.asarray(crng.randint(
            0, cfg.vocab_size, size=(8 * calib_batches, cfg.block_size)))
        t0 = time.time()
        qparams = gptq_quantize_gpt_params(
            params, cfg, clabels, ctokens, per_channel=per_channel,
            group_size=group, verbose=True)
        print(f"gptq quantization took {time.time() - t0:.1f}s", flush=True)
    else:
        qparams = jax.jit(
            lambda p: quantize_gpt_params_w4k(p, per_channel=per_channel,
                                              group_size=group)
        )(params)

    batch = 8
    labels = jnp.asarray(np.arange(batch) * 100 % 1000)

    if not skip_tf:
        rng2 = np.random.RandomState(1)
        tokens = jnp.asarray(rng2.randint(0, cfg.vocab_size,
                                          size=(batch, cfg.block_size)))

        @jax.jit
        def tf_compare(p1, p2):
            l1, _ = gpt.forward_train(p1, cfg, labels, tokens[:, :-1],
                                      train=False,
                                      compute_dtype=jnp.bfloat16)
            l2, _ = gpt.forward_train(p2, cfg, labels, tokens[:, :-1],
                                      train=False,
                                      compute_dtype=jnp.bfloat16)
            agree = jnp.mean(jnp.argmax(l1, -1) == jnp.argmax(l2, -1))
            err = jnp.abs(l2 - l1)
            return agree, err.max(), err.mean(), jnp.abs(l1).mean()

        agree, emax, emean, scale = [float(np.asarray(v))
                                     for v in tf_compare(bf16_params, qparams)]
        print(f"{name} tf argmax agreement w4k vs bf16: {agree:.4f} "
              f"(err mean {emean:.4f} max {emax:.4f} scale {scale:.4f})",
              flush=True)
    del params, bf16_params

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
    mode = "per-channel" if per_channel else f"group-{group}"
    mode += "+awq" if awq else ""
    mode += "+gptq" if gptq else ""
    print(f"{name} w4-kernel ({mode}) batch-8: {ips:.3f} img/s "
          f"({best / cfg.block_size * 1e3:.3f} ms/step, "
          f"vs_baseline {ips / base:.3f})", flush=True)


if __name__ == "__main__":
    args = sys.argv[1:]
    name = next((a for a in args if a.startswith("GPT-")), "GPT-3B")
    group = int(args[args.index("--group") + 1]) if "--group" in args else 128
    main(name, per_channel="--per-channel" in args,
         skip_tf="--skip-tf" in args, group=group, gptq="--gptq" in args,
         awq="--awq" in args)
