"""Chunk decode-attention kernel (ops/chunk_attention.py), interpret mode.

Oracle: plain einsum attention over rows [0, pos+c] per chunk row, with
the same merged [B, S, 2F] cache layout. Covers per-element positions,
epoch-boundary-crossing chunks (tile-1 write-back), C=1 (draft step),
backward position jumps across calls, prefix padding, and cache
write-back integrity.
"""

import numpy as np
import pytest

import conftest  # noqa: F401

import jax
import jax.numpy as jnp

from llamagen_tpu.ops.chunk_attention import chunk_decode_attention

H, D = 4, 32
F = H * D


def _oracle(q, kv_new, cache, pos, pad=None):
    """q [B,C,F], kv_new [B,C,2F], cache rows < pos[b] live."""
    b, c, f = q.shape
    smax = cache.shape[1]
    full = np.array(cache, np.float32).copy()
    out = np.zeros((b, c, f), np.float32)
    for bb in range(b):
        full[bb, pos[bb]:pos[bb] + c] = kv_new[bb]
        k = full[bb, :, :f].reshape(smax, H, D)
        v = full[bb, :, f:].reshape(smax, H, D)
        for cc in range(c):
            qr = np.array(q[bb, cc], np.float32).reshape(H, D)
            scores = np.einsum("hd,shd->hs", qr, k) / np.sqrt(D)
            valid = np.arange(smax) <= pos[bb] + cc
            if pad is not None:
                valid &= np.arange(smax) >= pad[bb]
            scores = np.where(valid[None], scores, -1e30)
            p = np.exp(scores - scores.max(-1, keepdims=True))
            p /= p.sum(-1, keepdims=True)
            out[bb, cc] = np.einsum("hs,shd->hd", p, v).reshape(f)
    return out


def _setup(rng, b, c, smax, pos):
    q = rng.randn(b, c, F).astype(np.float32)
    kv_new = rng.randn(b, c, 2 * F).astype(np.float32)
    cache = rng.randn(b, smax, 2 * F).astype(np.float32)  # finite garbage
    return q, kv_new, cache


@pytest.mark.parametrize("c,pos_list", [
    (5, [37, 12]),    # mid-epoch, no boundary crossing for b0
    (5, [6, 30]),     # b0 crosses the epoch boundary (6+5 > 8)
    (1, [45, 3]),     # draft-style single-token chunk
    (8, [16, 23]),    # full tile chunk
])
def test_matches_einsum_oracle(c, pos_list):
    rng = np.random.RandomState(0)
    b, smax = 2, 64
    pos = np.asarray(pos_list, np.int32)
    q, kv_new, cache = _setup(rng, b, c, smax, pos)
    ref = _oracle(q, kv_new, cache, pos)

    out, new_cache = chunk_decode_attention(
        jnp.asarray(q), jnp.asarray(kv_new), jnp.asarray(cache),
        jnp.asarray(pos), H, interpret=True)
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5, rtol=2e-5)
    # write-back: the chunk's rows land in the cache; committed rows keep
    # their values
    nc = np.asarray(new_cache)
    for bb in range(b):
        np.testing.assert_allclose(nc[bb, pos[bb]:pos[bb] + c],
                                   kv_new[bb], atol=1e-6)
        np.testing.assert_allclose(nc[bb, :pos[bb]], cache[bb, :pos[bb]],
                                   atol=1e-6)


def test_prefix_pad():
    rng = np.random.RandomState(1)
    b, c, smax = 2, 4, 64
    pos = np.asarray([20, 11], np.int32)
    pad = np.asarray([5, 0], np.int32)
    q, kv_new, cache = _setup(rng, b, c, smax, pos)
    ref = _oracle(q, kv_new, cache, pos, pad)
    out, _ = chunk_decode_attention(
        jnp.asarray(q), jnp.asarray(kv_new), jnp.asarray(cache),
        jnp.asarray(pos), H, prefix_pad=jnp.asarray(pad), interpret=True)
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5, rtol=2e-5)


def test_backward_position_jump_across_calls():
    """Speculative rejection moves pos BACKWARD relative to previously
    written rows; the cache-resident design must stay exact (this is the
    scenario the rolling-window kernel cannot handle)."""
    rng = np.random.RandomState(2)
    b, smax = 1, 64
    # call 1: chunk of 5 at pos 14 (crosses the 16-boundary? no: 14+5=19
    # crosses the 16 epoch boundary — tile 1 written)
    pos1 = np.asarray([14], np.int32)
    q1, kv1, cache = _setup(rng, b, 5, smax, pos1)
    _, cache2 = chunk_decode_attention(
        jnp.asarray(q1), jnp.asarray(kv1), jnp.asarray(cache),
        jnp.asarray(pos1), H, interpret=True)
    # suppose only 1 token committed (pos row 14): next call at pos 15
    pos2 = np.asarray([15], np.int32)
    q2 = rng.randn(b, 5, F).astype(np.float32)
    kv2 = rng.randn(b, 5, 2 * F).astype(np.float32)
    ref = _oracle(q2, kv2, np.asarray(cache2), pos2)
    out, _ = chunk_decode_attention(
        jnp.asarray(q2), jnp.asarray(kv2), cache2, jnp.asarray(pos2), H,
        interpret=True)
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize("rep", [2, 4])
def test_gqa_matches_einsum_oracle(rep):
    """GQA (r5): cache rows stay at kv_heads*head_dim lanes; the kernel
    lane-tiles each streamed half and the wrapper permutes q/out through
    tiled head order. Oracle: query head h attends kv head h // rep
    (gpt._attention's jnp.repeat convention)."""
    rng = np.random.RandomState(4)
    n_head, head_dim = 8, 64
    kv_heads = n_head // rep
    f, f_kv = n_head * head_dim, kv_heads * head_dim
    b, c, smax = 2, 5, 64
    pos = np.asarray([37, 14], np.int32)
    q = rng.randn(b, c, f).astype(np.float32)
    kv_new = rng.randn(b, c, 2 * f_kv).astype(np.float32)
    cache = rng.randn(b, smax, 2 * f_kv).astype(np.float32)

    full = cache.copy()
    ref = np.zeros((b, c, f), np.float32)
    for bb in range(b):
        full[bb, pos[bb]:pos[bb] + c] = kv_new[bb]
        k = full[bb, :, :f_kv].reshape(smax, kv_heads, head_dim)
        v = full[bb, :, f_kv:].reshape(smax, kv_heads, head_dim)
        k = np.repeat(k, rep, axis=1)
        v = np.repeat(v, rep, axis=1)
        for cc in range(c):
            qr = q[bb, cc].reshape(n_head, head_dim)
            scores = np.einsum("hd,shd->hs", qr, k) / np.sqrt(head_dim)
            valid = np.arange(smax) <= pos[bb] + cc
            scores = np.where(valid[None], scores, -1e30)
            p = np.exp(scores - scores.max(-1, keepdims=True))
            p /= p.sum(-1, keepdims=True)
            ref[bb, cc] = np.einsum("hs,shd->hd", p, v).reshape(f)

    out, new_cache = chunk_decode_attention(
        jnp.asarray(q), jnp.asarray(kv_new), jnp.asarray(cache),
        jnp.asarray(pos), n_head, interpret=True)
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5, rtol=2e-5)
    nc = np.asarray(new_cache)
    for bb in range(b):
        np.testing.assert_allclose(nc[bb, pos[bb]:pos[bb] + c],
                                   kv_new[bb], atol=1e-6)


def test_early_positions_no_blocks():
    """pos < w: nothing to stream, pure tail attention."""
    rng = np.random.RandomState(3)
    b, c, smax = 2, 3, 32
    pos = np.asarray([0, 5], np.int32)
    q, kv_new, cache = _setup(rng, b, c, smax, pos)
    ref = _oracle(q, kv_new, cache, pos)
    out, _ = chunk_decode_attention(
        jnp.asarray(q), jnp.asarray(kv_new), jnp.asarray(cache),
        jnp.asarray(pos), H, interpret=True)
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5, rtol=2e-5)
