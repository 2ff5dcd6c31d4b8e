"""Layout-native training attention kernel (ops/train_attention.py)."""

import numpy as np
import pytest

import conftest  # noqa: F401

import jax
import jax.numpy as jnp

from llamagen_tpu.ops.train_attention import causal_attention_bshd


def _ref(q, k, v, scale):
    scores = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    s = q.shape[1]
    mask = jnp.tril(jnp.ones((s, s), bool))[None, None]
    scores = jnp.where(mask, scores, jnp.float32(-1e30))
    p = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", p, v)


@pytest.mark.parametrize("s", [17, 64])
def test_fwd_matches_einsum(s):
    rng = np.random.RandomState(0)
    b, h, d = 3, 2, 64
    q, k, v = (jnp.asarray(rng.randn(b, s, h, d), jnp.float32)
               for _ in range(3))
    scale = d ** -0.5
    out = causal_attention_bshd(q, k, v, scale)
    ref = _ref(q, k, v, scale)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_grads_match_einsum():
    rng = np.random.RandomState(1)
    b, s, h, d = 2, 33, 2, 64
    q, k, v = (jnp.asarray(rng.randn(b, s, h, d), jnp.float32)
               for _ in range(3))
    scale = d ** -0.5

    def loss_k(q, k, v):
        return jnp.sum(causal_attention_bshd(q, k, v, scale) ** 2)

    def loss_r(q, k, v):
        return jnp.sum(_ref(q, k, v, scale) ** 2)

    gk = jax.grad(loss_k, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_r, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(gk, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-4, atol=1e-4)


def test_bf16_inputs():
    rng = np.random.RandomState(2)
    b, s, h, d = 2, 24, 2, 64
    q, k, v = (jnp.asarray(rng.randn(b, s, h, d), jnp.bfloat16)
               for _ in range(3))
    scale = d ** -0.5
    out = causal_attention_bshd(q, k, v, scale)
    ref = _ref(q, k, v, scale)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=2e-2, atol=2e-2)


def test_jit_and_vjp_under_scan():
    """The kernel must trace under jit + grad like the train step uses."""
    rng = np.random.RandomState(3)
    b, s, h, d = 2, 16, 2, 64
    q, k, v = (jnp.asarray(rng.randn(b, s, h, d), jnp.float32)
               for _ in range(3))

    @jax.jit
    def f(q, k, v):
        return jax.grad(
            lambda q: jnp.sum(causal_attention_bshd(q, k, v, d ** -0.5))
        )(q)

    g = f(q, k, v)
    assert g.shape == q.shape and bool(jnp.all(jnp.isfinite(g)))


def test_padded_head_dim_100_fwd_and_grads():
    """GPT-3B geometry (head_dim=100): the padding wrapper is
    bit-identical to the einsum reference — zero q/k pad lanes add 0 to
    every score, padded v output lanes slice off."""
    from llamagen_tpu.ops.train_attention import causal_attention_padded

    rng = np.random.RandomState(2)
    b, s, h, d = 2, 33, 2, 100
    q, k, v = (jnp.asarray(rng.randn(b, s, h, d), jnp.float32)
               for _ in range(3))
    scale = d ** -0.5
    out = causal_attention_padded(q, k, v, scale)
    ref = _ref(q, k, v, scale)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)

    def loss_k(q, k, v):
        return jnp.sum(causal_attention_padded(q, k, v, scale) ** 2)

    def loss_r(q, k, v):
        return jnp.sum(_ref(q, k, v, scale) ** 2)

    gk = jax.grad(loss_k, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_r, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(gk, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-4, atol=1e-4)


def test_padded_pad128_env(monkeypatch):
    """LLAMAGEN_TRAIN_ATTN_PAD=128 (the fallback alignment) gives the
    same result as the default 8-alignment."""
    from llamagen_tpu.ops.train_attention import causal_attention_padded

    rng = np.random.RandomState(3)
    q, k, v = (jnp.asarray(rng.randn(1, 17, 2, 100), jnp.float32)
               for _ in range(3))
    base = np.asarray(causal_attention_padded(q, k, v, 0.1))
    monkeypatch.setenv("LLAMAGEN_TRAIN_ATTN_PAD", "128")
    out = np.asarray(causal_attention_padded(q, k, v, 0.1))
    np.testing.assert_allclose(out, base, rtol=1e-6, atol=1e-6)
