"""Headline benchmark: GPT-L c2i 384px (24x24 grid) CFG sampling throughput.

Mirrors the reference serve benchmark (batch of 8 images + 8 CFG-null
requests of 576 tokens each; `/root/reference/autoregressive/serve/README.md`).
Baseline: A100 + vLLM GPT-L = 3.48 s for 8 images = 2.299 images/sec.

Configuration: Pallas decode-attention kernel, int8 KV cache (100% greedy
agreement with bf16 cache), W8A16 int8 weights (numerics documented in
BENCH.md; set BENCH_BF16W=1 for bf16 weights, ~2.5x baseline).

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time

import jax

# Persistent compilation cache: the W8A16 kernel-path compile dominates a
# cold run (~5 min on the one-core host); with the cache warm (populated by
# any prior run, incl. during development) the whole benchmark takes <1 min.
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

BASELINE_IMG_PER_SEC = 8.0 / 3.48  # A100 vLLM GPT-L 384 (serve/README.md:13)


def main():
    from llamagen_tpu.config import gpt_config
    from llamagen_tpu.models import gpt
    from llamagen_tpu.ops.generate import generate

    cfg = gpt_config("GPT-L", block_size=576, cls_token_num=1)
    params = gpt.init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)

    batch = 8
    labels = jnp.asarray(np.arange(batch) * 100 % 1000)

    def run(seed):
        seq = generate(params, jax.random.PRNGKey(seed), labels, cfg=cfg,
                       max_new_tokens=cfg.block_size, cfg_scale=2.0,
                       temperature=1.0, top_k=0, top_p=1.0,
                       cache_dtype=jnp.int8)  # int8 KV: 100% greedy token
                                              # agreement with bf16 measured
        # materialize on host: block_until_ready does not reliably block on
        # the axon tunnel backend, a host transfer does
        return np.asarray(seq)

    import llamagen_tpu.ops.attention as attn
    if os.environ.get("BENCH_BLOCK_S"):
        attn.BLOCK_S = int(os.environ["BENCH_BLOCK_S"])
    if os.environ.get("BENCH_W4K"):
        # W4A16 Pallas kernel (ops/w4_matmul.py): another ~15% over W8A16
        # at a documented numerics cost — NOT the headline configuration
        # (BENCH_W4K=pc for per-channel scales, anything else = group-128)
        from llamagen_tpu.ops.w4_matmul import quantize_gpt_params_w4k
        params = quantize_gpt_params_w4k(
            params, per_channel=os.environ["BENCH_W4K"] == "pc")
    elif not os.environ.get("BENCH_BF16W"):
        # W8A16 weights: halved weight-stream bytes (see BENCH.md numerics)
        from llamagen_tpu.ops.quant_matmul import quantize_gpt_params
        params = quantize_gpt_params(params)

    run(0)  # compile (persistent-cached) + first-exec warmup
    times = []
    for i in range(2):
        t0 = time.time()
        run(i + 1)
        times.append(time.time() - t0)
    best = min(times)
    img_per_sec = batch / best

    record = {
        "metric": "images_per_sec_gpt_l_c2i_384_cfg_batch8",
        "value": round(img_per_sec, 3),
        "unit": "images/sec",
        "vs_baseline": round(img_per_sec / BASELINE_IMG_PER_SEC, 3),
    }

    # Engine mode (continuous batching at measured capacity: 64 CFG pairs
    # = 128 slots — the r5 split window-staging mode lifted the 16 MB
    # scoped-VMEM ceiling that capped r4 at 48 pairs; BENCH.md
    # latency-throughput curve): the vLLM-equivalent throughput
    # comparison. Reported as the headline; the batch-8 row above matches
    # the reference benchmark's exact operating point (extra fields).
    if not os.environ.get("BENCH_SKIP_ENGINE"):
        from llamagen_tpu.ops.quant_matmul import quantize_gpt_params
        from llamagen_tpu.serve.engine import SamplingParams, ServeEngine

        params_e = gpt.init_params(jax.random.PRNGKey(0), cfg,
                                   dtype=jnp.bfloat16)
        # at >=32 slots the int8 head fuses profitably (BENCH.md)
        params_e = quantize_gpt_params(params_e, quantize_head=True)
        pairs = int(os.environ.get("BENCH_ENGINE_PAIRS", "64"))
        eng = ServeEngine(params_e, cfg, num_pairs=pairs,
                          max_new_tokens=576,
                          sampling_params=SamplingParams(cfg_scale=2.0),
                          chunk=64, compute_dtype=jnp.bfloat16,
                          cache_dtype=jnp.int8, use_kernel=True)
        eng.generate(list(range(4)))  # compile chunk + harvest paths
        n_req = pairs * 3
        labels_e = list(np.arange(n_req) * 17 % 1000)
        t0 = time.time()
        eng.generate(labels_e)
        eng_ips = n_req / (time.time() - t0)
        # stable metric key across rounds (ADVICE r4): the pairs/request
        # geometry lives in extra fields, not the key name
        record.update({
            "metric": "images_per_sec_gpt_l_c2i_384_engine_capacity",
            "value": round(eng_ips, 3),
            "vs_baseline": round(eng_ips / BASELINE_IMG_PER_SEC, 3),
            "engine_pairs": pairs,
            "engine_requests": n_req,
            "generate_batch8_img_per_s": round(img_per_sec, 3),
            "generate_batch8_vs_baseline": round(
                img_per_sec / BASELINE_IMG_PER_SEC, 3),
        })

    print(json.dumps(record))


if __name__ == "__main__":
    main()
