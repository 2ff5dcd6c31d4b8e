"""t2i serving-engine throughput bench (not pytest): GPT-XL 256px or
512px (--image-size 512: grid-32, seq 120+1024=1144 -> kernel cache 1152,
the released stage-2 geometry, ref README.md:91), 120-token caption
prefill at admission, int8 KV (+ optional int8 weights).

No reference baseline exists (the reference serves c2i only); this records
absolute throughput of the t2i serving path.
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


def main(int8_weights=True, w4k=None, image_size=256, n_req=24, pairs=8,
         show_stats=False):
    from llamagen_tpu.config import gpt_config
    from llamagen_tpu.models import gpt
    from llamagen_tpu.ops.quant_matmul import quantize_gpt_params
    from llamagen_tpu.serve.engine import SamplingParams, ServeEngine

    grid = image_size // 16
    cfg = gpt_config("GPT-XL", block_size=grid * grid, cls_token_num=120,
                     model_type="t2i", caption_dim=2048)
    params = gpt.init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
    if w4k:
        from llamagen_tpu.ops.w4_matmul import quantize_gpt_params_w4k
        params = quantize_gpt_params_w4k(params, per_channel=(w4k == "pc"))
    elif int8_weights:
        params = quantize_gpt_params(params)

    rng = np.random.RandomState(0)
    caps = rng.randn(n_req, 120, 2048).astype(np.float32)
    masks = np.ones((n_req, 120), np.int32)
    for i in range(n_req):
        pad = rng.randint(0, 60)
        masks[i, :pad] = 0
        caps[i, :pad] = 0

    eng = ServeEngine(params, cfg, num_pairs=pairs,
                      max_new_tokens=cfg.block_size,
                      sampling_params=SamplingParams(cfg_scale=7.5),
                      chunk=64, compute_dtype=jnp.bfloat16,
                      cache_dtype=jnp.int8, use_kernel=True)
    eng.generate_t2i(caps[:2], masks[:2])  # warm (chunk + admit compiles)

    eng.reset_stats()  # stats() should reflect only the measured run
    t0 = time.time()
    out = eng.generate_t2i(caps, masks)
    dt = time.time() - t0
    tag = f"+w4k-{w4k}" if w4k else ("+int8w" if int8_weights else "")
    print(f"t2i engine GPT-XL {image_size} (120-tok captions, "
          f"int8kv{tag}, {pairs} pairs): "
          f"{n_req} reqs in {dt:.2f}s = {n_req / dt:.3f} img/s")
    if show_stats:
        import json
        print("stats " + json.dumps(
            {k: (round(v, 4) if isinstance(v, float) else v)
             for k, v in eng.stats().items()}))
    assert out.shape == (n_req, cfg.block_size)


if __name__ == "__main__":
    a = sys.argv[1:]
    w4k = ("pc" if "--w4k-pc" in a else ("g" if "--w4k" in a else None))
    size = int(a[a.index("--image-size") + 1]) if "--image-size" in a else 256
    n_req = int(a[a.index("--reqs") + 1]) if "--reqs" in a else 24
    pairs = int(a[a.index("--pairs") + 1]) if "--pairs" in a else 8
    main(int8_weights=not ("--bf16" in a), w4k=w4k, image_size=size,
         n_req=n_req, pairs=pairs, show_stats="--stats" in a)
