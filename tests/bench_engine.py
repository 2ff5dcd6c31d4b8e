"""Serving-engine throughput bench (not pytest): GPT-L 384, 16 CFG pairs,
48 queued requests, int8 KV + optional int8 weights."""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np


def main(int8_weights=True):
    from llamagen_tpu.config import gpt_config
    from llamagen_tpu.models import gpt
    from llamagen_tpu.ops.quant_matmul import quantize_gpt_params
    from llamagen_tpu.serve.engine import SamplingParams, ServeEngine

    cfg = gpt_config("GPT-L", block_size=576, cls_token_num=1)
    params = gpt.init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
    if int8_weights:
        # at 32 slots the int8 head DOES fuse profitably (batch-dependent
        # XLA fusion choice; at batch 16 the bf16 head wins — BENCH.md)
        params = quantize_gpt_params(params, quantize_head=True)

    n_req = 48
    eng = ServeEngine(params, cfg, num_pairs=16, max_new_tokens=576,
                      sampling_params=SamplingParams(cfg_scale=2.0),
                      chunk=64, compute_dtype=jnp.bfloat16,
                      cache_dtype=jnp.int8, use_kernel=True)
    # warm: one full drain at small load (compiles chunk + harvest paths)
    eng.generate(list(range(4)))

    labels = list(np.arange(n_req) * 17 % 1000)
    t0 = time.time()
    out = eng.generate(labels)
    dt = time.time() - t0
    ips = n_req / dt
    print(f"engine GPT-L 384 int8kv{'+int8w' if int8_weights else ''}: "
          f"{n_req} reqs in {dt:.2f}s = {ips:.3f} img/s "
          f"(vs_baseline {ips / (8.0 / 3.48):.3f})")
    assert out.shape == (n_req, 576)


if __name__ == "__main__":
    main(int8_weights=not ("--bf16" in sys.argv))
