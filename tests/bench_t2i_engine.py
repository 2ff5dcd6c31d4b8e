"""t2i serving-engine throughput bench (not pytest): GPT-XL 256px,
120-token caption prefill at admission, int8 KV (+ optional int8 weights).

No reference baseline exists (the reference serves c2i only); this records
absolute throughput of the t2i serving path.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np


def main(int8_weights=True, w4k=None):
    from llamagen_tpu.config import gpt_config
    from llamagen_tpu.models import gpt
    from llamagen_tpu.ops.quant_matmul import quantize_gpt_params
    from llamagen_tpu.serve.engine import SamplingParams, ServeEngine

    cfg = gpt_config("GPT-XL", block_size=256, cls_token_num=120,
                     model_type="t2i", caption_dim=2048)
    params = gpt.init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
    if w4k:
        from llamagen_tpu.ops.w4_matmul import quantize_gpt_params_w4k
        params = quantize_gpt_params_w4k(params, per_channel=(w4k == "pc"))
    elif int8_weights:
        params = quantize_gpt_params(params)

    n_req = 24
    rng = np.random.RandomState(0)
    caps = rng.randn(n_req, 120, 2048).astype(np.float32)
    masks = np.ones((n_req, 120), np.int32)
    for i in range(n_req):
        pad = rng.randint(0, 60)
        masks[i, :pad] = 0
        caps[i, :pad] = 0

    eng = ServeEngine(params, cfg, num_pairs=8, max_new_tokens=256,
                      sampling_params=SamplingParams(cfg_scale=7.5),
                      chunk=64, compute_dtype=jnp.bfloat16,
                      cache_dtype=jnp.int8, use_kernel=True)
    eng.generate_t2i(caps[:2], masks[:2])  # warm (chunk + admit compiles)

    t0 = time.time()
    out = eng.generate_t2i(caps, masks)
    dt = time.time() - t0
    tag = f"+w4k-{w4k}" if w4k else ("+int8w" if int8_weights else "")
    print(f"t2i engine GPT-XL 256 (120-tok captions, int8kv{tag}): "
          f"{n_req} reqs in {dt:.2f}s = {n_req / dt:.3f} img/s")
    assert out.shape == (n_req, 256)


if __name__ == "__main__":
    w4k = ("pc" if "--w4k-pc" in sys.argv
           else ("g" if "--w4k" in sys.argv else None))
    main(int8_weights=not ("--bf16" in sys.argv), w4k=w4k)
