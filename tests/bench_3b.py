"""GPT-3B 384 batch-8 CFG bench with int8 weights + int8 KV (not pytest).

A100+vLLM GPT-3B baseline: 6.26 s per 8 images = 1.278 img/s
(`/root/reference/autoregressive/serve/README.md:16`).
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

BASELINE = 8.0 / 6.26


def main(int8_weights=True):
    from llamagen_tpu.config import gpt_config
    from llamagen_tpu.models import gpt
    from llamagen_tpu.ops.generate import generate
    from llamagen_tpu.ops.quant_matmul import quantize_gpt_params

    cfg = gpt_config("GPT-3B", block_size=576, cls_token_num=1)
    params = gpt.init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
    if int8_weights:
        params = quantize_gpt_params(params)

    batch = 8
    labels = jnp.asarray(np.arange(batch) * 100 % 1000)

    def run(seed):
        seq = generate(params, jax.random.PRNGKey(seed), labels, cfg=cfg,
                       max_new_tokens=cfg.block_size, cfg_scale=1.65,
                       temperature=1.0, top_k=0, top_p=1.0,
                       cache_dtype=jnp.int8)
        return np.asarray(seq)

    run(0)
    run(0)
    times = []
    for i in range(3):
        t0 = time.time()
        run(i + 1)
        times.append(time.time() - t0)
    best = min(times)
    ips = batch / best
    print(f"GPT-3B 384 batch-8{'+int8w' if int8_weights else ''}: "
          f"{ips:.3f} img/s ({best / 576 * 1e3:.2f} ms/step, "
          f"vs_baseline {ips / BASELINE:.3f})")


if __name__ == "__main__":
    main(int8_weights=not ("--bf16" in sys.argv))
