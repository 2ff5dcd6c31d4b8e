"""Decode-step anatomy: time generate() with components knocked out.

Not a pytest file — run on the real chip:

    python tests/bench_anatomy.py GPT-3B --w4k pc
    python tests/bench_anatomy.py GPT-XXL

Monkeypatches gpt's matmul_any / the attention kernel with shape-correct
no-ops so XLA dead-code-eliminates the corresponding weight/cache streams;
the difference between modes isolates each component's share of the step:

    full    - the real configuration (matches tests/bench_zoo.py rows)
    noattn  - attention kernel replaced by out=q (cache untouched)
    nohead  - output head replaced by a broadcast (no [D, V] stream)
    nomm    - the five layer matmuls replaced by broadcasts
    bare    - all of the above (scan/sampling/norm floor)

Sampling runs the full token count either way (no data-dependent control
flow), so subtraction is valid.
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

BASELINES = {  # A100+vLLM serve table, 8 images (serve/README.md:12-16)
    "GPT-B": 8.0 / 2.39, "GPT-L": 8.0 / 3.48, "GPT-XL": 8.0 / 4.84,
    "GPT-XXL": 8.0 / 6.36, "GPT-3B": 8.0 / 6.26,
}


def matmul_out_dim(p, key):
    if key + "_w4b" in p:
        b = p[key + "_w4b"]
        return b.shape[-3] * b.shape[-1]
    if key + "_q4" in p:
        return p[key + "_q4"].shape[-1] * 2
    if key + "_q" in p:
        return p[key + "_q"].shape[-1]
    return p[key].shape[-1]


def fake_matmul_any(real, skip):
    def fn(p, key, x):
        if key not in skip:
            return real(p, key, x)
        out = matmul_out_dim(p, key)
        return jnp.broadcast_to(x[..., :1], (*x.shape[:-1], out)).astype(x.dtype)

    return fn


def fake_decode_attention(q, kv_new, recent, kv_cache, pos, n_head,
                          prefix_pad=None, kv_scale=None, **kw):
    if kv_cache.dtype == jnp.int8:
        return q, kv_cache, kv_scale, recent
    return q, kv_cache, recent


def main():
    model = sys.argv[1] if len(sys.argv) > 1 else "GPT-3B"
    w4k = sys.argv[sys.argv.index("--w4k") + 1] if "--w4k" in sys.argv else None
    steps = (int(sys.argv[sys.argv.index("--steps") + 1])
             if "--steps" in sys.argv else None)
    modes = [m for m in ("full", "noattn", "nohead", "nomm", "bare")
             if "--modes" not in sys.argv
             or m in sys.argv[sys.argv.index("--modes") + 1].split(",")]

    from llamagen_tpu.config import gpt_config
    from llamagen_tpu.models import gpt
    from llamagen_tpu.ops.generate import generate

    cfg = gpt_config(model, block_size=576, cls_token_num=1)
    params = gpt.init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
    if w4k:
        from llamagen_tpu.ops.w4_matmul import quantize_gpt_params_w4k
        params = quantize_gpt_params_w4k(params, per_channel=w4k == "pc")
    else:
        from llamagen_tpu.ops.quant_matmul import quantize_gpt_params
        params = quantize_gpt_params(params)

    batch = 8
    labels = jnp.asarray(np.arange(batch) * 100 % 1000)
    real_mm, real_attn = gpt.matmul_any, None
    import llamagen_tpu.ops.attention as attn_lib
    real_attn = attn_lib.decode_attention

    LAYER_MM = ("wqkv", "wo", "w1", "w3", "w2")
    results = {}
    for mode in modes:
        gpt.matmul_any = real_mm
        attn_lib.decode_attention = real_attn
        if mode in ("nohead", "bare"):
            gpt.matmul_any = fake_matmul_any(gpt.matmul_any, ("output",))
        if mode in ("nomm", "bare"):
            gpt.matmul_any = fake_matmul_any(gpt.matmul_any, LAYER_MM)
        if mode in ("noattn", "bare"):
            attn_lib.decode_attention = fake_decode_attention
        # generate is a cached jax.jit: monkeypatches don't key the trace
        # cache, so force a fresh trace per mode
        generate.clear_cache()

        nsteps = steps or cfg.block_size

        def run(seed):
            seq = generate(params, jax.random.PRNGKey(seed), labels, cfg=cfg,
                           max_new_tokens=nsteps, cfg_scale=1.65,
                           temperature=1.0, top_k=0, top_p=1.0,
                           use_kernel=True, cache_dtype=jnp.int8)
            return np.asarray(seq)

        run(0)
        times = []
        for i in range(2):
            t0 = time.time()
            run(i + 1)
            times.append(time.time() - t0)
        best = min(times)
        results[mode] = best
        ips = batch / best
        extra = ""
        if mode != "full" and "full" in results:
            extra = (f"  share={1e3 * (results['full'] - best) / nsteps:.2f}"
                     f" ms/step")
        print(f"{model} {mode:7s}: {best:.3f} s  "
              f"{1e3 * best / nsteps:.2f} ms/step "
              f"({ips:.2f} img/s, {ips / BASELINES[model]:.2f}x){extra}",
              flush=True)

    gpt.matmul_any = real_mm
    attn_lib.decode_attention = real_attn


if __name__ == "__main__":
    main()
