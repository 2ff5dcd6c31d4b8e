"""Serving-engine throughput bench (not pytest).

Usage: python tests/bench_engine.py [GPT-L] [--pairs 16] [--reqs 48]
         [--bf16 | --w8 | --w4k | --w4k-pc | --w4k-g64] [--stats]

Default: GPT-L 384, 16 CFG pairs, 48 queued requests, int8 KV + W8A16.
Baselines: A100+vLLM serve table seconds per 8-image batch.
--stats prints the full engine.stats() dict (e2e/TTFT/TPOT p50/p95) —
the latency side of the throughput headline (vLLM StatLogger parity,
/root/reference/autoregressive/serve/llm_engine.py:588-659)."""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
import jax.numpy as jnp
import numpy as np

BASELINE_S = {"GPT-B": 2.39, "GPT-L": 3.48, "GPT-XL": 4.84,
              "GPT-XXL": 6.36, "GPT-3B": 6.26}


def main(name="GPT-L", pairs=16, n_req=48, int8_weights=True, w4k=None,
         show_stats=False):
    from llamagen_tpu.config import gpt_config
    from llamagen_tpu.models import gpt
    from llamagen_tpu.ops.quant_matmul import quantize_gpt_params
    from llamagen_tpu.serve.engine import SamplingParams, ServeEngine

    cfg = gpt_config(name, block_size=576, cls_token_num=1)
    params = gpt.init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
    if w4k:
        # W4A16 Pallas kernel path; at 32 slots the grouped mode's segment
        # dots amortize over 2x the batch rows (ops/w4_matmul.py)
        from llamagen_tpu.ops.w4_matmul import quantize_gpt_params_w4k
        params = quantize_gpt_params_w4k(
            params, per_channel=(w4k == "pc"), int8_head=True,
            group_size=64 if w4k == "g64" else 128)
    elif int8_weights:
        # at 32 slots the int8 head DOES fuse profitably (batch-dependent
        # XLA fusion choice; at batch 16 the bf16 head wins — BENCH.md)
        params = quantize_gpt_params(params, quantize_head=True)

    eng = ServeEngine(params, cfg, num_pairs=pairs, max_new_tokens=576,
                      sampling_params=SamplingParams(cfg_scale=2.0),
                      chunk=64, compute_dtype=jnp.bfloat16,
                      cache_dtype=jnp.int8, use_kernel=True)
    # warm: one full drain at small load (compiles chunk + harvest paths)
    eng.generate(list(range(4)))
    # reset gauges so stats() reflects only the measured run
    eng.reset_stats()

    labels = list(np.arange(n_req) * 17 % 1000)
    t0 = time.time()
    out = eng.generate(labels)
    dt = time.time() - t0
    ips = n_req / dt
    tag = (f"+w4k-{w4k}" if w4k
           else ("+int8w" if int8_weights else ""))
    base = 8.0 / BASELINE_S[name]
    print(f"engine {name} 384 ({pairs} pairs) int8kv{tag}: "
          f"{n_req} reqs in {dt:.2f}s = {ips:.3f} img/s "
          f"(vs_baseline {ips / base:.3f})")
    if show_stats:
        print("stats " + json.dumps(
            {k: (round(v, 4) if isinstance(v, float) else v)
             for k, v in eng.stats().items()}))
    assert out.shape == (n_req, 576)


if __name__ == "__main__":
    args = sys.argv[1:]
    w4k = ("pc" if "--w4k-pc" in args
           else ("g64" if "--w4k-g64" in args
                 else ("g" if "--w4k" in args else None)))
    name = next((a for a in args if a.startswith("GPT-")), "GPT-L")
    pairs = int(args[args.index("--pairs") + 1]) if "--pairs" in args else 16
    n_req = int(args[args.index("--reqs") + 1]) if "--reqs" in args else 48
    main(name, pairs, n_req, int8_weights=not ("--bf16" in args), w4k=w4k,
         show_stats="--stats" in args)
