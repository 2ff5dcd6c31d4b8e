"""W8A16 dequant-matmul kernel + quantized-GPT integration tests."""

import numpy as np
import pytest

import conftest  # noqa: F401

import jax
import jax.numpy as jnp


def test_int8_matmul_matches_dequant_reference():
    from llamagen_tpu.ops.quant_matmul import int8_matmul, quantize_weight

    rng = np.random.RandomState(0)
    x = rng.randn(16, 256).astype(np.float32)
    w = (rng.randn(256, 512) * 0.02).astype(np.float32)
    w_q, w_scale = quantize_weight(jnp.asarray(w))
    got = np.asarray(int8_matmul(jnp.asarray(x), w_q, w_scale))
    expected = x @ (np.asarray(w_q, np.float32) * np.asarray(w_scale)[None])
    np.testing.assert_allclose(got, expected, atol=1e-4, rtol=1e-5)


def test_int8_matmul_multi_block():
    from llamagen_tpu.ops.quant_matmul import int8_matmul, quantize_weight

    rng = np.random.RandomState(1)
    x = rng.randn(8, 128).astype(np.float32)
    w = rng.randn(128, 1536).astype(np.float32)
    w_q, w_scale = quantize_weight(jnp.asarray(w))
    got = np.asarray(int8_matmul(jnp.asarray(x), w_q, w_scale, block_n=256))
    expected = x @ (np.asarray(w_q, np.float32) * np.asarray(w_scale)[None])
    np.testing.assert_allclose(got, expected, atol=2e-4, rtol=1e-5)


def test_quantize_weight_roundtrip_error_bounded():
    from llamagen_tpu.ops.quant_matmul import quantize_weight

    rng = np.random.RandomState(2)
    w = (rng.randn(64, 96) * 0.05).astype(np.float32)
    q, s = quantize_weight(jnp.asarray(w))
    deq = np.asarray(q, np.float32) * np.asarray(s)[None]
    # symmetric per-channel int8: error bounded by scale/2 per element
    assert np.abs(deq - w).max() <= np.asarray(s).max() * 0.5 + 1e-8


def test_matmul_any_fallback_unaligned():
    from llamagen_tpu.ops.quant_matmul import matmul_any, quantize_weight

    rng = np.random.RandomState(3)
    w = (rng.randn(48, 80) * 0.1).astype(np.float32)
    q, s = quantize_weight(jnp.asarray(w))
    p = {"w_q": q, "w_scale": s}
    x = jnp.asarray(rng.randn(4, 48).astype(np.float32))
    got = np.asarray(matmul_any(p, "w", x))
    expected = np.asarray(x) @ (np.asarray(q, np.float32) * np.asarray(s)[None])
    np.testing.assert_allclose(got, expected, atol=1e-5)


def _gen(params, cfg, **kw):
    from llamagen_tpu.ops.generate import generate

    labels = jnp.asarray(np.array([3, 7]))
    return np.asarray(generate(
        params, jax.random.PRNGKey(0), labels, cfg=cfg,
        max_new_tokens=cfg.block_size, cfg_scale=2.0, temperature=0.0,
        compute_dtype=jnp.float32, cache_dtype=jnp.float32, **kw))


def test_quantized_gpt_greedy_agreement():
    """int8-weight GPT produces (near-)identical greedy tokens at test scale;
    on the real models the agreement is measured on TPU (BENCH.md)."""
    from llamagen_tpu.config import GPTConfig
    from llamagen_tpu.models import gpt
    from llamagen_tpu.ops.quant_matmul import quantize_gpt_params

    # 128-aligned dims so the real kernel path runs (interpret mode on CPU)
    cfg = GPTConfig(dim=128, n_layer=2, n_head=2, block_size=16,
                    num_classes=16, vocab_size=512, cls_token_num=1)
    params = gpt.init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    # non-degenerate output head (init zeroes it)
    params = dict(params)
    params["output"] = jax.random.normal(
        jax.random.PRNGKey(5), params["output"].shape) * 0.1

    ref = _gen(params, cfg)
    qparams = quantize_gpt_params(params)
    got = _gen(qparams, cfg)
    agree = (ref == got).mean()
    assert agree >= 0.9, f"greedy agreement {agree:.3f}"


def test_quantized_forward_train_close():
    from llamagen_tpu.config import GPTConfig
    from llamagen_tpu.models import gpt
    from llamagen_tpu.ops.quant_matmul import quantize_gpt_params

    cfg = GPTConfig(dim=128, n_layer=2, n_head=2, block_size=16,
                    num_classes=16, vocab_size=512, cls_token_num=1)
    params = gpt.init_params(jax.random.PRNGKey(1), cfg, dtype=jnp.float32)
    rng = np.random.RandomState(0)
    labels = jnp.asarray(rng.randint(0, 16, size=(2,)))
    tokens = jnp.asarray(rng.randint(0, 512, size=(2, 16)))
    logits, loss = gpt.forward_train(params, cfg, labels, tokens[:, :-1],
                                     targets=tokens, train=False,
                                     compute_dtype=jnp.float32)
    qlogits, qloss = gpt.forward_train(
        quantize_gpt_params(params), cfg, labels, tokens[:, :-1],
        targets=tokens, train=False, compute_dtype=jnp.float32)
    assert abs(float(loss) - float(qloss)) < 0.05
    np.testing.assert_allclose(np.asarray(logits), np.asarray(qlogits),
                               atol=0.2)
