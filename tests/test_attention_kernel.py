"""Pallas decode-attention kernel correctness (interpret mode on CPU)."""

import numpy as np
import pytest

import conftest  # noqa: F401

import jax
import jax.numpy as jnp

from llamagen_tpu.ops.attention import decode_attention


def _reference_attention(q, k_all, v_all, pos, prefix_allow=None):
    """Dense f32 oracle: attend over slots [0..pos] inclusive."""
    scale = q.shape[-1] ** -0.5
    scores = np.einsum("bhd,bshd->bhs", q, k_all) * scale
    s = np.arange(k_all.shape[1])
    mask = s[None, None, :] <= pos
    if prefix_allow is not None:
        mask = mask & prefix_allow[:, None, :]
    scores = np.where(mask, scores, -1e30)
    p = np.exp(scores - scores.max(-1, keepdims=True))
    p = p / p.sum(-1, keepdims=True)
    return np.einsum("bhs,bshd->bhd", p, v_all)


@pytest.mark.parametrize("pos", [0, 1, 63, 64, 127, 200])
def test_kernel_matches_dense(pos):
    B, H, D, S, L = 2, 4, 64, 256, 3
    layer = 1
    rng = np.random.RandomState(0)
    q = rng.randn(B, H, D).astype(np.float32)
    k_new = rng.randn(B, H, D).astype(np.float32)
    v_new = rng.randn(B, H, D).astype(np.float32)
    k_cache = rng.randn(L, B, S, H, D).astype(np.float32)
    v_cache = rng.randn(L, B, S, H, D).astype(np.float32)

    out, k_upd, v_upd = decode_attention(
        jnp.asarray(q), jnp.asarray(k_new), jnp.asarray(v_new),
        jnp.asarray(k_cache), jnp.asarray(v_cache),
        jnp.int32(layer), jnp.int32(pos), block_s=64, interpret=True)

    # cache must contain the new k/v at (layer, :, pos)
    np.testing.assert_allclose(np.asarray(k_upd)[layer, :, pos], k_new,
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(v_upd)[layer, :, pos], v_new,
                               atol=1e-6)
    # untouched layers unchanged
    np.testing.assert_array_equal(np.asarray(k_upd)[0], k_cache[0])

    k_all = k_cache[layer].copy()
    v_all = v_cache[layer].copy()
    k_all[:, pos] = k_new
    v_all[:, pos] = v_new
    expected = _reference_attention(q, k_all, v_all, pos)
    np.testing.assert_allclose(np.asarray(out), expected, atol=2e-5,
                               rtol=1e-4)


def test_kernel_with_prefix_mask():
    B, H, D, S, L = 2, 4, 64, 128, 2
    pos, layer, t = 70, 0, 8
    rng = np.random.RandomState(1)
    q = rng.randn(B, H, D).astype(np.float32)
    k_new = rng.randn(B, H, D).astype(np.float32)
    v_new = rng.randn(B, H, D).astype(np.float32)
    k_cache = rng.randn(L, B, S, H, D).astype(np.float32)
    v_cache = rng.randn(L, B, S, H, D).astype(np.float32)
    allow = np.ones((B, S), bool)
    allow[0, :3] = False  # left-padded caption positions
    allow[1, :5] = False

    out, _, _ = decode_attention(
        jnp.asarray(q), jnp.asarray(k_new), jnp.asarray(v_new),
        jnp.asarray(k_cache), jnp.asarray(v_cache),
        jnp.int32(layer), jnp.int32(pos),
        prefix_allow=jnp.asarray(allow), block_s=64, interpret=True)

    k_all = k_cache[layer].copy()
    v_all = v_cache[layer].copy()
    k_all[:, pos] = k_new
    v_all[:, pos] = v_new
    expected = _reference_attention(q, k_all, v_all, pos, allow)
    np.testing.assert_allclose(np.asarray(out), expected, atol=2e-5,
                               rtol=1e-4)


def test_kernel_bf16_cache():
    B, H, D, S, L = 1, 2, 64, 128, 1
    pos = 65
    rng = np.random.RandomState(2)
    q = rng.randn(B, H, D).astype(np.float32)
    k_new = rng.randn(B, H, D).astype(np.float32)
    v_new = rng.randn(B, H, D).astype(np.float32)
    k_cache = rng.randn(L, B, S, H, D).astype(np.float32)
    v_cache = rng.randn(L, B, S, H, D).astype(np.float32)

    out, _, _ = decode_attention(
        jnp.asarray(q, jnp.bfloat16), jnp.asarray(k_new, jnp.bfloat16),
        jnp.asarray(v_new, jnp.bfloat16),
        jnp.asarray(k_cache, jnp.bfloat16), jnp.asarray(v_cache, jnp.bfloat16),
        jnp.int32(0), jnp.int32(pos), block_s=64, interpret=True)

    k_all = k_cache[0].copy()
    v_all = v_cache[0].copy()
    k_all[:, pos] = k_new
    v_all[:, pos] = v_new
    kb = k_all.astype(np.float32)
    expected = _reference_attention(q.astype(np.float32), kb,
                                    v_all.astype(np.float32), pos)
    np.testing.assert_allclose(np.asarray(out).astype(np.float32), expected,
                               atol=0.05, rtol=0.05)
