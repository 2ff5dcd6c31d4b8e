"""Serving engine tests: slot admission, CFG pairing, output correctness."""

import numpy as np
import pytest

import conftest  # noqa: F401

import jax
import jax.numpy as jnp

from llamagen_tpu.config import GPTConfig
from llamagen_tpu.models import gpt
from llamagen_tpu.ops.generate import generate
from llamagen_tpu.serve.engine import SamplingParams, ServeEngine

CFG = GPTConfig(dim=64, n_layer=2, n_head=4, block_size=16, num_classes=10,
                vocab_size=128, cls_token_num=1)
MAX_NEW = CFG.block_size


@pytest.fixture(scope="module")
def params():
    p = gpt.init_params(jax.random.PRNGKey(0), CFG)
    # randomize zero-initialized output head so logits are non-degenerate
    k = jax.random.PRNGKey(1)
    p["output"] = jax.random.normal(k, p["output"].shape) * 0.02
    return p


def _engine(params, num_pairs=4, chunk=4, cfg_scale=2.0):
    return ServeEngine(params, CFG, num_pairs=num_pairs,
                       max_new_tokens=MAX_NEW,
                       sampling_params=SamplingParams(cfg_scale=cfg_scale),
                       chunk=chunk, compute_dtype=jnp.float32)


def test_offline_batch_shapes(params):
    eng = _engine(params)
    out = eng.generate([1, 2, 3, 4, 5])  # more requests than slots
    assert out.shape == (5, MAX_NEW)
    assert (out >= 0).all() and (out < CFG.vocab_size).all()


def test_engine_matches_generate_greedy(params):
    """Greedy engine output must equal the batch generate() path."""
    labels = [3, 7]
    eng = ServeEngine(params, CFG, num_pairs=2, max_new_tokens=MAX_NEW,
                      sampling_params=SamplingParams(cfg_scale=2.0,
                                                     temperature=1e-6),
                      chunk=4, compute_dtype=jnp.float32)
    out = eng.generate(labels)
    ref = generate(params, jax.random.PRNGKey(0), jnp.asarray(labels),
                   cfg=CFG, max_new_tokens=MAX_NEW, cfg_scale=2.0,
                   sample_logits=False, compute_dtype=jnp.float32,
                   cache_dtype=jnp.float32)
    # temperature ~0 sampling == argmax; trajectories must coincide
    np.testing.assert_array_equal(out, np.asarray(ref))


def test_continuous_admission(params):
    """Requests submitted while others are running still complete."""
    eng = _engine(params, num_pairs=2, chunk=4)
    first = [eng.submit(i) for i in range(2)]
    eng._admit_and_step()  # engine busy with 2 requests
    late = [eng.submit(9) for _ in range(3)]
    eng.run_until_idle()
    for r in first + late:
        assert r.result is not None and r.result.shape == (MAX_NEW,)
    stats = eng.stats()
    assert stats["running"] == 0 and stats["waiting"] == 0


def test_staggered_equals_fresh(params):
    """A request admitted into a reused slot gives the same greedy result."""
    sp = SamplingParams(cfg_scale=1.5, temperature=1e-6)
    eng = ServeEngine(params, CFG, num_pairs=1, max_new_tokens=MAX_NEW,
                      sampling_params=sp, chunk=4, compute_dtype=jnp.float32)
    out1 = eng.generate([5])      # fills slot 0
    out2 = eng.generate([5])      # reuses slot 0 — stale cache must not leak
    np.testing.assert_array_equal(out1, out2)


def test_engine_kernel_path_matches_xla():
    """Kernel-path engine (interpret on CPU) == XLA-path engine, greedy."""
    cfg = GPTConfig(dim=128, n_layer=2, n_head=2, block_size=16,
                    num_classes=10, vocab_size=128, cls_token_num=1)
    p = gpt.init_params(jax.random.PRNGKey(0), cfg)
    p["output"] = jax.random.normal(jax.random.PRNGKey(1),
                                    p["output"].shape) * 0.02
    sp = SamplingParams(cfg_scale=2.0, temperature=1e-6)
    common = dict(num_pairs=2, max_new_tokens=cfg.block_size,
                  sampling_params=sp, chunk=4, compute_dtype=jnp.float32)
    eng_x = ServeEngine(p, cfg, use_kernel=False, **common)
    eng_k = ServeEngine(p, cfg, use_kernel=True, **common)
    labels = [3, 7, 1]
    out_x = eng_x.generate(labels)
    out_k = eng_k.generate(labels)
    np.testing.assert_array_equal(out_x, out_k)


def test_engine_int8_kernel_path():
    """int8-KV kernel engine produces valid tokens and matches greedy bf16
    closely (identical on small models)."""
    cfg = GPTConfig(dim=128, n_layer=2, n_head=2, block_size=16,
                    num_classes=10, vocab_size=128, cls_token_num=1)
    p = gpt.init_params(jax.random.PRNGKey(0), cfg)
    p["output"] = jax.random.normal(jax.random.PRNGKey(1),
                                    p["output"].shape) * 0.02
    sp = SamplingParams(cfg_scale=2.0, temperature=1e-6)
    common = dict(num_pairs=2, max_new_tokens=cfg.block_size,
                  sampling_params=sp, chunk=4, compute_dtype=jnp.float32)
    out16 = ServeEngine(p, cfg, use_kernel=True, **common).generate([3, 7])
    out8 = ServeEngine(p, cfg, use_kernel=True, cache_dtype=jnp.int8,
                       **common).generate([3, 7])
    agree = (out16 == out8).mean()
    assert agree > 0.9, f"int8 greedy agreement too low: {agree}"
