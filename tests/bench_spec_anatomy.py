"""Spec-round anatomy (not pytest): where do the ~20 ms/round go?

Times, on the real chip, each component of a speculative round at the
bench_spec operating point (batch 8+8 CFG, 384px geometry, positions
mid-sequence):

  verify   — one C=k+1-token target verify (chunk kernel / XLA)
  draft    — one C=1 draft step through the same chunk path
  dwindow  — one draft step through the single-token windowed kernel
             path (serve.engine._decode_step_slots_pallas) for reference
  sample   — warp + sample + accept arithmetic on [B, V] logits

Each is amortized inside one jitted lax.scan with a carry dependence
(tunnel dispatch latency otherwise dominates; see verify skill notes).

Usage: python tests/bench_spec_anatomy.py GPT-XXL [--draft GPT-B] [--k 4]
       [--w8 | --w4] [--xla] [--pos 300] [--iters 50]
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np


def timed_scan(fn, state, iters, label):
    """Scan fn over `iters` steps with a carry dependence; returns ms/step
    (warm, second call)."""
    @jax.jit
    def run(state):
        def body(c, _):
            return fn(c), ()
        c, _ = jax.lax.scan(body, state, None, length=iters)
        return c

    out = run(state)
    jax.tree.map(lambda x: x.block_until_ready(), out)
    np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]  # force host sync
    t0 = time.time()
    out = run(state)
    np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
    dt = (time.time() - t0) / iters * 1000
    print(json.dumps({"component": label, "ms": round(dt, 3)}), flush=True)
    return dt


def main():
    from llamagen_tpu.config import find_multiple, gpt_config
    from llamagen_tpu.models import gpt
    from llamagen_tpu.ops import sampling
    from llamagen_tpu.ops.quant_matmul import quantize_gpt_params
    from llamagen_tpu.ops.speculative import (spec_accept, verify_step_slots,
                                              warped_probs)

    args = sys.argv[1:]
    model = next((a for a in args if a.startswith("GPT-")), "GPT-XXL")
    draft = (args[args.index("--draft") + 1] if "--draft" in args
             else "GPT-B")
    k = int(args[args.index("--k") + 1]) if "--k" in args else 4
    iters = int(args[args.index("--iters") + 1]) if "--iters" in args else 50
    pos0 = int(args[args.index("--pos") + 1]) if "--pos" in args else 300
    use_kernel = "--xla" not in args
    c = k + 1
    b = 16  # 8 + 8 CFG

    cfg = gpt_config(model, block_size=576, cls_token_num=1)
    dcfg = gpt_config(draft, block_size=576, cls_token_num=1)
    params = gpt.init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
    dparams = gpt.init_params(jax.random.PRNGKey(1), dcfg,
                              dtype=jnp.bfloat16)
    if "--w8" in args:
        params = jax.jit(quantize_gpt_params, donate_argnums=0)(params)
        dparams = jax.jit(quantize_gpt_params, donate_argnums=0)(dparams)
    elif "--w4" in args:
        from llamagen_tpu.ops.w4_matmul import quantize_gpt_params_w4k
        params = jax.jit(lambda p: quantize_gpt_params_w4k(
            p, per_channel=True))(params)
        dparams = jax.jit(quantize_gpt_params, donate_argnums=0)(dparams)

    smax = find_multiple(1 + 576 + c + 16, 128 if use_kernel else 8)
    tcache = gpt.init_cache(cfg, b, smax, dtype=jnp.bfloat16)
    dcache = gpt.init_cache(dcfg, b, smax, dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(2)

    # --- verify: C-token target forward, pos pinned mid-sequence ---
    toks0 = jnp.zeros((b, c), jnp.int32)

    def vstep(carry):
        tcache, toks = carry
        logits, tcache = verify_step_slots(
            params, cfg, toks, jnp.full((b,), pos0, jnp.int32), tcache,
            use_kernel=use_kernel)
        nxt = jnp.argmax(logits[:, -1], -1).astype(jnp.int32)
        return tcache, jnp.broadcast_to(nxt[:, None], (b, c))

    t_verify = timed_scan(vstep, (tcache, toks0), iters,
                          f"verify C={c} {model}")

    # --- draft: C=1 chunk-path step (what the spec round runs) ---
    def dstep(carry):
        dcache, tok = carry
        logits, dcache = verify_step_slots(
            dparams, dcfg, tok[:, None], jnp.full((b,), pos0, jnp.int32),
            dcache, use_kernel=use_kernel)
        return dcache, jnp.argmax(logits[:, 0], -1).astype(jnp.int32)

    t_draft = timed_scan(dstep, (dcache, toks0[:, 0]), iters,
                         f"draft C=1 chunk-path {draft}")

    # --- draft + sampling/warp exactly as the round body does ---
    def dstep_full(carry):
        dcache, tok, r = carry
        logits, dcache = verify_step_slots(
            dparams, dcfg, tok[:, None], jnp.full((b,), pos0, jnp.int32),
            dcache, use_kernel=use_kernel)
        logits = logits[:, 0]
        mixed = sampling.cfg_mix(logits, 2.0)
        qp = warped_probs(mixed, 1.0, 0, 1.0)
        r, rr = jax.random.split(r)
        nxt = sampling.sample(rr, mixed)
        nxt2 = jnp.concatenate([nxt, nxt])
        del qp
        return dcache, nxt2, r

    t_draft_full = timed_scan(dstep_full, (dcache, toks0[:, 0], rng), iters,
                              "draft + cfg_mix + warp + sample")

    # --- acceptance arithmetic alone ---
    props = jnp.zeros((b // 2, k), jnp.int32)
    qps = jax.nn.softmax(jax.random.normal(rng, (b // 2, k,
                                                 cfg.vocab_size)))
    pps = jax.nn.softmax(jax.random.normal(rng, (b // 2, c,
                                                 cfg.vocab_size)))

    def astep(carry):
        r, _ = carry
        r, rr = jax.random.split(r)
        tokens, n_new = spec_accept(rr, props, qps, pps)
        return r, tokens.sum() + n_new.sum()

    t_accept = timed_scan(astep, (rng, jnp.int32(0)), iters, "spec_accept")

    total = t_verify + (k + 1) * t_draft_full + t_accept
    print(json.dumps({
        "model": model, "draft": draft, "k": k,
        "sum ms (verify + (k+1)*draft_full + accept)": round(total, 2),
        "draft_overhead_ms": round(t_draft_full - t_draft, 3),
    }), flush=True)


if __name__ == "__main__":
    main()
