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


def test_int4_pack_unpack_roundtrip():
    from llamagen_tpu.ops.quant_matmul import quantize_weight_int4, unpack_int4

    rng = np.random.RandomState(4)
    w = (rng.randn(64, 96) * 0.05).astype(np.float32)
    packed, gs = quantize_weight_int4(jnp.asarray(w), group_size=32)
    assert packed.shape == (64, 48) and gs.shape == (2, 96)
    q = np.asarray(jax.jit(lambda p: unpack_int4(p).astype(jnp.int8))(packed))
    # every unpacked value is a valid int4 and dequantizes within scale/2
    assert q.min() >= -8 and q.max() <= 7
    deq = q.astype(np.float32).reshape(2, 32, 96) * np.asarray(gs)[:, None, :]
    err = np.abs(deq.reshape(64, 96) - w)
    assert err.max() <= np.asarray(gs).max() * 0.5 + 1e-8


def test_int4_matmul_matches_dequant_reference():
    from llamagen_tpu.ops.quant_matmul import (int4_matmul,
                                               quantize_weight_int4,
                                               unpack_int4)

    rng = np.random.RandomState(5)
    x = rng.randn(8, 256).astype(np.float32)
    w = (rng.randn(256, 128) * 0.02).astype(np.float32)
    for group in (256, 64):  # G=1 fast path and the grouped einsum path
        packed, gs = quantize_weight_int4(jnp.asarray(w), group_size=group)
        got = np.asarray(jax.jit(int4_matmul)(jnp.asarray(x), packed, gs))
        q = np.asarray(jax.jit(
            lambda p: unpack_int4(p).astype(jnp.float32))(packed))
        deq = (q.reshape(256 // group, group, 128)
               * np.asarray(gs)[:, None, :]).reshape(256, 128)
        expected = x @ deq
        np.testing.assert_allclose(got, expected, atol=1e-3, rtol=1e-4)


def test_int4_matmul_3d_activations():
    from llamagen_tpu.ops.quant_matmul import int4_matmul, quantize_weight_int4

    rng = np.random.RandomState(6)
    x = rng.randn(2, 5, 64).astype(np.float32)
    w = (rng.randn(64, 32) * 0.1).astype(np.float32)
    packed, gs = quantize_weight_int4(jnp.asarray(w), group_size=16)
    got = np.asarray(jax.jit(int4_matmul)(jnp.asarray(x), packed, gs))
    flat = np.asarray(jax.jit(int4_matmul)(
        jnp.asarray(x.reshape(10, 64)), packed, gs))
    np.testing.assert_allclose(got.reshape(10, 32), flat, atol=1e-5)


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


@pytest.mark.slow
def test_int4_gpt_forward_close_and_generates():
    """W4A16 end-to-end: decode runs through matmul_any's _q4 dispatch and
    teacher-forced logits track bf16 closely (int4 is a lossier opt-in
    than W8A16 — correlation, not token-exactness, is the bar here; the
    real-model numerics are measured on TPU, BENCH.md)."""
    from llamagen_tpu.config import GPTConfig
    from llamagen_tpu.models import gpt
    from llamagen_tpu.ops.quant_matmul import quantize_gpt_params

    cfg = GPTConfig(dim=128, n_layer=2, n_head=2, block_size=16,
                    num_classes=16, vocab_size=512, cls_token_num=1)
    params = gpt.init_params(jax.random.PRNGKey(2), cfg, dtype=jnp.float32)
    params = dict(params)
    params["output"] = jax.random.normal(
        jax.random.PRNGKey(5), params["output"].shape) * 0.1

    rng = np.random.RandomState(7)
    labels = jnp.asarray(rng.randint(0, 16, size=(2,)))
    tokens = jnp.asarray(rng.randint(0, 512, size=(2, 16)))
    logits, _ = gpt.forward_train(params, cfg, labels, tokens[:, :-1],
                                  train=False, compute_dtype=jnp.float32)
    qparams = quantize_gpt_params(params, bits=4, group_size=64)
    qlogits, _ = gpt.forward_train(qparams, cfg, labels, tokens[:, :-1],
                                   train=False, compute_dtype=jnp.float32)
    a = np.asarray(logits).ravel()
    b = np.asarray(qlogits).ravel()
    r = np.corrcoef(a, b)[0, 1]
    assert r > 0.97, f"int4 logits correlation {r:.4f}"
    # decode path smoke: greedy generation runs on the _q4 dispatch
    seq = _gen(qparams, cfg)
    assert seq.shape == (2, cfg.block_size)


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
