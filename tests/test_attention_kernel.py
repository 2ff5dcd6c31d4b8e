"""Pallas decode-attention kernel correctness (interpret mode on CPU)."""

import numpy as np
import pytest

import conftest  # noqa: F401

import jax
import jax.numpy as jnp

from llamagen_tpu.ops.attention import (RECENT, RECENT_INT8,
                                         decode_attention)

B, H, D, S = 2, 4, 64, 256
F = H * D


def _dense_oracle(q, k_hist, v_hist, prefix_allow=None):
    """q [B,H,D]; k/v_hist [B, pos+1, H, D] -> out [B,H,D]."""
    scale = D ** -0.5
    scores = np.einsum("bhd,bshd->bhs", q, k_hist) * scale
    if prefix_allow is not None:
        npos = k_hist.shape[1]
        scores = np.where(prefix_allow[:, None, :npos], scores, -1e30)
    p = np.exp(scores - scores.max(-1, keepdims=True))
    p = p / p.sum(-1, keepdims=True)
    return np.einsum("bhs,bshd->bhd", p, v_hist)


def _run(pos, prefix=None, dtype=np.float32, block_s=64, seed=0, version=2):
    rng = np.random.RandomState(seed)
    q = rng.randn(B, H, D).astype(np.float32)
    # full history of k/v for positions [0, pos]
    k_hist = rng.randn(B, pos + 1, H, D).astype(np.float32)
    v_hist = rng.randn(B, pos + 1, H, D).astype(np.float32)

    boundary = (pos // RECENT) * RECENT
    k_cache = rng.randn(B, S, H, D).astype(np.float32)  # junk beyond boundary
    v_cache = rng.randn(B, S, H, D).astype(np.float32)
    k_cache[:, :boundary] = k_hist[:, :boundary]
    v_cache[:, :boundary] = v_hist[:, :boundary]

    recent_k = rng.randn(B, RECENT, H, D).astype(np.float32)
    recent_v = rng.randn(B, RECENT, H, D).astype(np.float32)
    n_recent = pos - boundary + 1
    recent_k[:, :n_recent] = k_hist[:, boundary:pos + 1]
    recent_v[:, :n_recent] = v_hist[:, boundary:pos + 1]

    out, k_upd, v_upd = decode_attention(
        jnp.asarray(q.reshape(B, F), dtype),
        jnp.asarray(recent_k.reshape(B, RECENT, F), dtype),
        jnp.asarray(recent_v.reshape(B, RECENT, F), dtype),
        jnp.asarray(k_cache.reshape(B, S, F), dtype),
        jnp.asarray(v_cache.reshape(B, S, F), dtype),
        jnp.int32(pos), H,
        prefix_allow=None if prefix is None else jnp.asarray(prefix),
        block_s=block_s, version=version, interpret=True)

    expected = _dense_oracle(q, k_hist, v_hist, prefix)
    return (np.asarray(out, np.float32).reshape(B, H, D), expected,
            np.asarray(k_upd, np.float32), np.asarray(v_upd, np.float32),
            k_hist, boundary)


@pytest.mark.parametrize("version", [1, 2])
@pytest.mark.parametrize("pos", [0, 1, 7, 8, 63, 64, 100, 127, 200, 255])
def test_kernel_matches_dense(pos, version):
    out, expected, _, _, _, _ = _run(pos, version=version)
    np.testing.assert_allclose(out, expected, atol=2e-5, rtol=1e-4)


def test_flush_writes_window_to_cache():
    pos = 63  # pos % 8 == 7 -> flush
    out, expected, k_upd, v_upd, k_hist, boundary = _run(pos)
    np.testing.assert_allclose(out, expected, atol=2e-5, rtol=1e-4)
    assert boundary == 56
    np.testing.assert_allclose(
        k_upd[:, boundary:pos + 1],
        k_hist[:, boundary:pos + 1].reshape(B, RECENT, F), atol=1e-6)


def test_no_flush_leaves_cache_unchanged():
    pos = 20  # pos % 8 != 7
    rng = np.random.RandomState(0)
    _ = rng.randn(B, H, D)
    k_hist = rng.randn(B, pos + 1, H, D)
    _ = rng.randn(B, pos + 1, H, D)
    k_cache = rng.randn(B, S, H, D).astype(np.float32)
    boundary = (pos // RECENT) * RECENT
    k_cache[:, :boundary] = k_hist[:, :boundary]
    _, _, k_upd, _, _, _ = _run(pos, seed=0)
    np.testing.assert_array_equal(k_upd, k_cache.reshape(B, S, F))


def test_kernel_with_prefix_mask():
    allow = np.ones((B, S), bool)
    allow[0, :3] = False
    allow[1, :5] = False
    out, expected, _, _, _, _ = _run(70, prefix=allow, seed=1)
    np.testing.assert_allclose(out, expected, atol=2e-5, rtol=1e-4)


def test_kernel_bf16():
    out, expected, _, _, _, _ = _run(65, dtype=jnp.bfloat16, seed=2)
    np.testing.assert_allclose(out, expected, atol=0.06, rtol=0.06)


def test_decode_step_pallas_matches_xla():
    """Full decode step: kernel path (interpret) vs XLA path, multi-step."""
    from llamagen_tpu.config import GPTConfig
    from llamagen_tpu.models import gpt

    cfg = GPTConfig(dim=128, n_layer=2, n_head=2, block_size=256,
                    num_classes=10, vocab_size=128, cls_token_num=1)
    params = gpt.init_params(jax.random.PRNGKey(0), cfg)
    params["output"] = jax.random.normal(jax.random.PRNGKey(1),
                                         params["output"].shape) * 0.02
    b = 2
    smax = 384  # 128-aligned
    cache_x = gpt.init_cache(cfg, b, smax, dtype=jnp.float32)
    cache_p = gpt.init_cache(cfg, b, smax, dtype=jnp.float32)
    rk, rv = gpt.init_recent(cfg, b, dtype=jnp.float32)

    # prefill both paths identically
    labels = jnp.asarray(np.array([1, 5]))
    logits_x, cache_x = gpt.prefill(params, cfg, labels, cache_x,
                                    compute_dtype=jnp.float32)
    logits_p, cache_p = gpt.prefill(params, cfg, labels, cache_p,
                                    compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(logits_x), np.asarray(logits_p))
    # seed recent windows from the prefill boundary rows
    base = (cfg.cls_token_num // RECENT) * RECENT
    rk = tuple(jax.lax.dynamic_slice(ck, (0, base, 0), (b, RECENT, ck.shape[2]))
               for ck in cache_p.k)
    rv = tuple(jax.lax.dynamic_slice(cv, (0, base, 0), (b, RECENT, cv.shape[2]))
               for cv in cache_p.v)

    import functools

    step_x = jax.jit(functools.partial(gpt.decode_step, params, cfg,
                                       compute_dtype=jnp.float32))
    step_p = jax.jit(functools.partial(gpt.decode_step_pallas, params, cfg,
                                       compute_dtype=jnp.float32,
                                       interpret=True))
    rng = np.random.RandomState(0)
    for i in range(12):  # crosses a window flush at pos 7
        pos = jnp.int32(cfg.cls_token_num + i)
        tok = jnp.asarray(rng.randint(0, cfg.vocab_size, size=(b,)))
        lx, cache_x = step_x(tok, pos, cache_x)
        lp, cache_p, rk, rv = step_p(tok, pos, cache_p, rk, rv)
        np.testing.assert_allclose(np.asarray(lp), np.asarray(lx),
                                   atol=2e-4, rtol=1e-3,
                                   err_msg=f"step {i} (pos {pos})")


def test_kernel_int8_quantized_cache():
    """int8 cache: flush quantizes; dequantized attention stays accurate."""
    pos = 64  # int8 window=32 -> boundary 64: cache rows [0, 64) read
    rng = np.random.RandomState(4)
    q = rng.randn(B, H, D).astype(np.float32)
    k_hist = rng.randn(B, pos + 1, H, D).astype(np.float32)
    v_hist = rng.randn(B, pos + 1, H, D).astype(np.float32)
    boundary = (pos // RECENT_INT8) * RECENT_INT8

    # quantize history rows per position (as the flush would have)
    k_flat = k_hist.reshape(B, pos + 1, F)
    v_flat = v_hist.reshape(B, pos + 1, F)
    k_cache = np.zeros((B, S, F), np.int8)
    v_cache = np.zeros((B, S, F), np.int8)
    k_scale = np.ones((B, S, 128), np.float32)
    v_scale = np.ones((B, S, 128), np.float32)
    for bb in range(B):
        for s in range(boundary):
            ks = np.abs(k_flat[bb, s]).max() / 127.0 + 1e-8
            vs = np.abs(v_flat[bb, s]).max() / 127.0 + 1e-8
            k_cache[bb, s] = np.clip(np.round(k_flat[bb, s] / ks), -127, 127)
            v_cache[bb, s] = np.clip(np.round(v_flat[bb, s] / vs), -127, 127)
            k_scale[bb, s] = ks
            v_scale[bb, s] = vs

    recent_k = np.zeros((B, RECENT_INT8, F), np.float32)
    recent_v = np.zeros((B, RECENT_INT8, F), np.float32)
    n_rec = pos - boundary + 1
    recent_k[:, :n_rec] = k_flat[:, boundary:pos + 1]
    recent_v[:, :n_rec] = v_flat[:, boundary:pos + 1]

    out, ku, vu, ksu, vsu = decode_attention(
        jnp.asarray(q.reshape(B, F)), jnp.asarray(recent_k),
        jnp.asarray(recent_v), jnp.asarray(k_cache), jnp.asarray(v_cache),
        jnp.int32(pos), H, k_scale=jnp.asarray(k_scale),
        v_scale=jnp.asarray(v_scale), block_s=64, interpret=True)

    expected = _dense_oracle(q, k_hist, v_hist)
    np.testing.assert_allclose(np.asarray(out).reshape(B, H, D), expected,
                               atol=0.03, rtol=0.03)


def test_kernel_int8_flush_roundtrip():
    """A flush step must write quantized rows that dequantize to the window."""
    pos = 95  # pos % 32 == 31 -> flush at boundary 64
    rng = np.random.RandomState(5)
    q = rng.randn(B, F).astype(np.float32)
    recent_k = rng.randn(B, RECENT_INT8, F).astype(np.float32)
    recent_v = rng.randn(B, RECENT_INT8, F).astype(np.float32)
    k_cache = np.zeros((B, S, F), np.int8)
    v_cache = np.zeros((B, S, F), np.int8)
    k_scale = np.ones((B, S, 128), np.float32)
    v_scale = np.ones((B, S, 128), np.float32)

    out, ku, vu, ksu, vsu = decode_attention(
        jnp.asarray(q), jnp.asarray(recent_k), jnp.asarray(recent_v),
        jnp.asarray(k_cache), jnp.asarray(v_cache), jnp.int32(pos), H,
        k_scale=jnp.asarray(k_scale), v_scale=jnp.asarray(v_scale),
        block_s=64, interpret=True)

    deq = (np.asarray(ku)[:, 64:96].astype(np.float32)
           * np.asarray(ksu)[:, 64:96, :1])
    np.testing.assert_allclose(deq, recent_k, atol=0.05, rtol=0.05)
