"""Perf experiment (not pytest): cost of the recent-window plumbing.

Variants of the GPT-L int8w decode step:
  A. real step (current code)
  B. no XLA dynamic_update_slice into recent (reuse as-is)
  C. B + recent shrunk to 8 rows (invalid numerics; operand-size cost probe)
"""

import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from llamagen_tpu.config import gpt_config
from llamagen_tpu.models import gpt
from llamagen_tpu.ops.quant_matmul import quantize_gpt_params


def run_variant(name, skip_dus):
    cfg = gpt_config("GPT-L", block_size=576, cls_token_num=1)
    params = quantize_gpt_params(
        gpt.init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16))
    B = 16
    smax = 768
    cache = gpt.init_cache(cfg, B, smax, dtype=jnp.int8)
    recent = gpt.init_recent(cfg, B, dtype=jnp.bfloat16, window=32)
    rng = np.random.RandomState(0)
    tok = jnp.asarray(rng.randint(0, 16384, size=(B,)))

    orig_dus = jax.lax.dynamic_update_slice
    if skip_dus:
        import llamagen_tpu.models.gpt as g

        def fake_dus(x, upd, idx):
            return x
        g.jax.lax.dynamic_update_slice = fake_dus  # monkeypatch for probe

    @functools.partial(jax.jit, donate_argnums=(1, 2))
    def steps(params, cache, recent, tok):
        def body(carry, i):
            cache, recent, tok = carry
            logits, cache, recent = gpt.decode_step_pallas(
                params, cfg, tok, 300, cache, recent)
            nxt = jnp.argmax(logits, axis=-1)
            return (cache, recent, nxt), nxt[0]
        (cache, recent, tok), outs = jax.lax.scan(
            body, (cache, recent, tok), jnp.arange(32))
        return outs

    try:
        o = steps(params, cache, recent, tok)
        np.asarray(o)
        cache = gpt.init_cache(cfg, B, smax, dtype=jnp.int8)
        recent = gpt.init_recent(cfg, B, dtype=jnp.bfloat16, window=32)
        times = []
        for _ in range(3):
            c = gpt.init_cache(cfg, B, smax, dtype=jnp.int8)
            r = gpt.init_recent(cfg, B, dtype=jnp.bfloat16, window=32)
            t0 = time.time()
            np.asarray(steps(params, c, r, tok))
            times.append(time.time() - t0)
        ms = min(times) / 32 * 1e3
        print(f"{name}: {ms:.3f} ms/step")
    finally:
        if skip_dus:
            import llamagen_tpu.models.gpt as g
            g.jax.lax.dynamic_update_slice = orig_dus


if __name__ == "__main__":
    run_variant("A real", False)
    run_variant("B no-dus", True)
