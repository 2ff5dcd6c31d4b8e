"""Speculative-decoding serve bench (not pytest): batch-8+CFG 384px.

Measures the weights-bound tail (GPT-XL/XXL/3B) with a GPT-B draft and
the k+1-token verify forward (ops/speculative.py). Because no trained
checkpoints exist in this environment, random-weight draft/target pairs
have near-zero agreement — so the harness sweeps CONTROLLED acceptance
via `force_accept` (all compute real: k draft steps + verify + warps +
resample per round; only the accept decision is pinned), reporting
wall-clock throughput as a function of acceptance rate. One unforced run
reports the true random-weight rounds count as the honest floor.

Usage:
    python tests/bench_spec.py GPT-XXL [--draft GPT-B] [--k 4] [--w8]
    python tests/bench_spec.py GPT-3B --self-w4   # draft = W4 self
                                                  # (real accept on
                                                  # trained ckpts)
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_S = {"GPT-B": 2.39, "GPT-L": 3.48, "GPT-XL": 4.84,
              "GPT-XXL": 6.36, "GPT-3B": 6.26}


def main(model, draft, k, quant, self_w4=False):
    from llamagen_tpu.config import gpt_config
    from llamagen_tpu.models import gpt
    from llamagen_tpu.ops.quant_matmul import quantize_gpt_params
    from llamagen_tpu.ops.speculative import generate_speculative

    cfg = gpt_config(model, block_size=576, cls_token_num=1)
    params = gpt.init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
    if self_w4:
        # self-speculation: the W4 round-to-nearest pytree drafts for its
        # own W8A16 parent — no second checkpoint needed, and on trained
        # weights the two argmax-agree often (BENCH.md W4 numerics)
        from llamagen_tpu.ops.w4_matmul import quantize_gpt_params_w4k

        draft, dcfg = model + "(w4-self)", cfg
        dparams = jax.jit(lambda p: quantize_gpt_params_w4k(
            p, per_channel=True))(params)
        params = jax.jit(quantize_gpt_params, donate_argnums=0)(params)
    else:
        dcfg = gpt_config(draft, block_size=576, cls_token_num=1)
        dparams = gpt.init_params(jax.random.PRNGKey(1), dcfg,
                                  dtype=jnp.bfloat16)
        if quant:
            params = jax.jit(quantize_gpt_params, donate_argnums=0)(params)
            dparams = jax.jit(quantize_gpt_params, donate_argnums=0)(dparams)
    labels = jnp.asarray(np.arange(8) * 100 % 1000)
    base = 8.0 / BASELINE_S[model] if model in BASELINE_S else None

    use_kernel = None if "--xla" not in sys.argv else False

    def run(seed, force):
        seq, rounds = generate_speculative(
            params, dparams, jax.random.PRNGKey(seed), labels, cfg=cfg,
            draft_cfg=dcfg, max_new_tokens=576, k=k, cfg_scale=2.0,
            force_accept=force, use_kernel=use_kernel)
        return np.asarray(seq), int(rounds)

    for force in (None, 0, k // 2, k):
        run(0, force)  # compile + warmup
        t0 = time.time()
        _, rounds = run(1, force)
        dt = time.time() - t0
        ips = 8.0 / dt
        print(json.dumps({
            "model": model, "draft": draft, "k": k,
            "force_accept": force, "rounds": rounds,
            "tokens_per_round": round(576 / max(rounds, 1), 2),
            "images_per_sec": round(ips, 3),
            "ms_per_round": round(dt / max(rounds, 1) * 1000, 2),
            "vs_baseline": round(ips / base, 3) if base else None,
        }), flush=True)


if __name__ == "__main__":
    args = sys.argv[1:]
    draft = (args[args.index("--draft") + 1] if "--draft" in args
             else "GPT-B")
    model = next((a for i, a in enumerate(args) if a.startswith("GPT-")
                  and (i == 0 or args[i - 1] != "--draft")), "GPT-XXL")
    k = int(args[args.index("--k") + 1]) if "--k" in args else 4
    main(model, draft, k, quant="--w8" in args,
         self_w4="--self-w4" in args)
