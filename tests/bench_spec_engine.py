"""Speculative serving-engine throughput bench (not pytest).

Usage: python tests/bench_spec_engine.py [GPT-XXL] [--draft GPT-B]
         [--pairs 8] [--reqs 24] [--k 4] [--acc 0|2|4|-1] [--w8]

Continuous batching with draft/verify rounds (serve/spec_engine.py).
--acc pins the per-round commit count via force_accept (all compute
real, only the accept decision overridden — tests/bench_spec.py
methodology); -1 runs unforced (random weights accept nearly everything,
so unforced ~= the acc=k upper bound; the forced sweep is the result).
Baselines: A100+vLLM serve table seconds per 8-image batch.
"""

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


def main(name="GPT-XXL", draft="GPT-B", pairs=8, n_req=24, k=4, acc=4,
         w8=False):
    from llamagen_tpu.config import gpt_config
    from llamagen_tpu.models import gpt
    from llamagen_tpu.serve.engine import SamplingParams
    from llamagen_tpu.serve.spec_engine import SpecEngine

    cfg = gpt_config(name, block_size=576, cls_token_num=1)
    dcfg = gpt_config(draft, block_size=576, cls_token_num=1)
    params = gpt.init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
    dparams = gpt.init_params(jax.random.PRNGKey(1), dcfg,
                              dtype=jnp.bfloat16)
    if w8:
        # W8A16 target+draft: the batch-path cross-check says the spec
        # round is NOT weight-stream-bound (BENCH.md), so this should be
        # ~free — this flag confirms it in the ENGINE
        from llamagen_tpu.ops.quant_matmul import quantize_gpt_params
        params = quantize_gpt_params(params)
        dparams = quantize_gpt_params(dparams)

    eng = SpecEngine(params, dparams, cfg, dcfg, num_pairs=pairs,
                     max_new_tokens=576, k=k,
                     sampling_params=SamplingParams(cfg_scale=2.0),
                     compute_dtype=jnp.bfloat16,
                     force_accept=None if acc < 0 else acc)
    eng.generate(list(range(2)))  # warm: admission + chunk compiles

    labels = list(np.arange(n_req) * 17 % 1000)
    t0 = time.time()
    out = eng.generate(labels)
    dt = time.time() - t0
    ips = n_req / dt
    base = 8.0 / BASELINE_S[name]
    st = eng.stats()
    wtag = " w8a16" if w8 else ""
    print(f"spec engine {name}<-{draft} k={k} acc={acc} ({pairs} pairs){wtag}: "
          f"{n_req} reqs in {dt:.2f}s = {ips:.3f} img/s "
          f"(vs_baseline {ips / base:.3f}) "
          f"tokens/round/slot {st['tokens_per_round_per_slot']:.2f} "
          f"ttft_mean {st['ttft_mean_s']:.3f}s")
    assert out.shape == (n_req, 576)


if __name__ == "__main__":
    a = sys.argv[1:]
    name = next((x for x in a if x.startswith("GPT-")), "GPT-XXL")
    draft = a[a.index("--draft") + 1] if "--draft" in a else "GPT-B"
    pairs = int(a[a.index("--pairs") + 1]) if "--pairs" in a else 8
    n_req = int(a[a.index("--reqs") + 1]) if "--reqs" in a else 24
    k = int(a[a.index("--k") + 1]) if "--k" in a else 4
    acc = int(a[a.index("--acc") + 1]) if "--acc" in a else 4
    main(name, draft, pairs, n_req, k, acc, w8="--w8" in a)
