"""Model-zoo serve bench (not pytest): batch-8+CFG 384px for any GPT size.

Replicates the reference serve table row by row
(`/root/reference/autoregressive/serve/README.md:12-16`, A100+vLLM,
8 images of 576 tokens per batch):

    GPT-B 2.39s | GPT-L 3.48s | GPT-XL 4.84s | GPT-XXL 6.36s | GPT-3B 6.26s

Usage: python tests/bench_zoo.py GPT-XL [GPT-XXL ...] [--w4k | --w4k-pc]
int8 KV + W8A16 layer weights (bf16 head), the bench.py configuration;
--w4k / --w4k-pc switch to the W4A16 Pallas kernel (grouped /
per-channel scales — numerics tradeoff, BENCH.md).
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

# A100+vLLM seconds per 8-image CFG batch at 384px (serve/README.md)
BASELINE_S = {"GPT-B": 2.39, "GPT-L": 3.48, "GPT-XL": 4.84,
              "GPT-XXL": 6.36, "GPT-3B": 6.26}


def main(models, w4k=None):
    from llamagen_tpu.config import gpt_config
    from llamagen_tpu.models import gpt
    from llamagen_tpu.ops.quant_matmul import quantize_gpt_params
    from llamagen_tpu.ops.generate import generate
    from llamagen_tpu.ops.w4_matmul import quantize_gpt_params_w4k

    params = None
    for name in models:
        del params  # free the previous model BEFORE allocating the next
        cfg = gpt_config(name, block_size=576, cls_token_num=1)
        raw = gpt.init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
        # jit the quantizer (donating the bf16 params): eager-mode
        # quantization keeps every f32 intermediate alive and OOMs on 3B
        if w4k:
            params = jax.jit(
                lambda p: quantize_gpt_params_w4k(p,
                                                  per_channel=(w4k == "pc")),
                donate_argnums=0)(raw)
        else:
            params = jax.jit(quantize_gpt_params, donate_argnums=0)(raw)
        del raw
        labels = jnp.asarray(np.arange(8) * 100 % 1000)

        def run(seed):
            seq = generate(params, jax.random.PRNGKey(seed), labels,
                           cfg=cfg, max_new_tokens=576, cfg_scale=2.0,
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
        ips = 8.0 / best
        base = 8.0 / BASELINE_S[name] if name in BASELINE_S else None
        print(json.dumps({
            "model": name, "images_per_sec": round(ips, 3),
            "ms_per_step": round(best / 576 * 1000, 2),
            "vs_baseline": round(ips / base, 3) if base else None,
        }))


if __name__ == "__main__":
    args = sys.argv[1:]
    w4k = ("pc" if "--w4k-pc" in args else ("g" if "--w4k" in args else None))
    models = [a for a in args if a.startswith("GPT-")]
    main(models or ["GPT-XL", "GPT-XXL"], w4k=w4k)
