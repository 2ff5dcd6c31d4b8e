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


def _merge(k, v):
    """[..., H, D] pairs -> merged [..., 2F] rows."""
    shape = k.shape[:-2]
    return np.concatenate([k.reshape(*shape, F), v.reshape(*shape, F)], -1)


def _run(pos, prefix_pad=None, dtype=np.float32, block_s=64, seed=0):
    rng = np.random.RandomState(seed)
    q = rng.randn(B, H, D).astype(np.float32)
    k_hist = rng.randn(B, pos + 1, H, D).astype(np.float32)
    v_hist = rng.randn(B, pos + 1, H, D).astype(np.float32)

    boundary = (pos // RECENT) * RECENT
    kv_cache = rng.randn(B, S, 2 * F).astype(np.float32)  # junk > boundary
    kv_cache[:, :boundary] = _merge(k_hist, v_hist)[:, :boundary]

    recent = rng.randn(B, RECENT, 2 * F).astype(np.float32)
    merged = _merge(k_hist, v_hist)
    n_prev = pos - boundary
    recent[:, :n_prev] = merged[:, boundary:pos]
    kv_new = merged[:, pos]  # the kernel inserts the current row itself

    out, kv_upd, recent_upd = decode_attention(
        jnp.asarray(q.reshape(B, F), dtype),
        jnp.asarray(kv_new, dtype),
        jnp.asarray(recent, dtype),
        jnp.asarray(kv_cache, dtype),
        jnp.int32(pos), H,
        prefix_pad=None if prefix_pad is None else jnp.asarray(
            prefix_pad, jnp.int32),
        block_s=block_s, interpret=True)
    np.testing.assert_allclose(
        np.asarray(recent_upd, np.float32)[:, pos - boundary], kv_new,
        atol=1e-2 if dtype != np.float32 else 1e-6)

    if prefix_pad is None:
        prefix = None
    else:
        prefix = np.arange(pos + 1)[None, :] >= np.asarray(prefix_pad)[:, None]
    expected = _dense_oracle(q, k_hist, v_hist, prefix)
    return (np.asarray(out, np.float32).reshape(B, H, D), expected,
            np.asarray(kv_upd, np.float32), kv_cache,
            np.asarray(recent_upd, np.float32), boundary)


@pytest.mark.parametrize("pos", [0, 1, 7, 8, 63, 64, 100, 127, 200, 255])
def test_kernel_matches_dense(pos):
    out, expected, _, _, _, _ = _run(pos)
    np.testing.assert_allclose(out, expected, atol=2e-5, rtol=1e-4)


def test_flush_writes_window_to_cache():
    pos = 63  # pos % 8 == 7 -> flush
    out, expected, kv_upd, _, recent, boundary = _run(pos)
    np.testing.assert_allclose(out, expected, atol=2e-5, rtol=1e-4)
    assert boundary == 56
    np.testing.assert_allclose(kv_upd[:, boundary:pos + 1], recent,
                               atol=1e-6)


def test_no_flush_leaves_cache_unchanged():
    pos = 20  # pos % 8 != 7
    _, _, kv_upd, kv_cache, _, _ = _run(pos, seed=0)
    np.testing.assert_array_equal(kv_upd, kv_cache)


def test_kernel_with_prefix_pad():
    """Left-padded caption prefix: first pad positions are masked."""
    out, expected, _, _, _, _ = _run(70, prefix_pad=[3, 5], seed=1)
    np.testing.assert_allclose(out, expected, atol=2e-5, rtol=1e-4)


def test_kernel_prefix_pad_inside_window():
    # pad boundary falls inside the recent window (pos < 8)
    out, expected, _, _, _, _ = _run(6, prefix_pad=[2, 4], seed=3)
    np.testing.assert_allclose(out, expected, atol=2e-5, rtol=1e-4)


def test_kernel_bf16():
    out, expected, _, _, _, _ = _run(65, dtype=jnp.bfloat16, seed=2)
    np.testing.assert_allclose(out, expected, atol=0.06, rtol=0.06)


def test_kernel_per_slot_positions():
    """Vector positions (serving): each batch element at a different pos."""
    rng = np.random.RandomState(9)
    positions = np.array([5, 100])
    q = rng.randn(B, H, D).astype(np.float32)
    hists = [
        (rng.randn(positions[b] + 1, H, D).astype(np.float32),
         rng.randn(positions[b] + 1, H, D).astype(np.float32))
        for b in range(B)]

    kv_cache = np.zeros((B, S, 2 * F), np.float32)
    recent = np.zeros((B, RECENT, 2 * F), np.float32)
    kv_new = np.zeros((B, 2 * F), np.float32)
    for b in range(B):
        bnd = (positions[b] // RECENT) * RECENT
        merged = _merge(hists[b][0][None], hists[b][1][None])[0]
        kv_cache[b, :bnd] = merged[:bnd]
        recent[b, :positions[b] - bnd] = merged[bnd:positions[b]]
        kv_new[b] = merged[positions[b]]

    out, _, _ = decode_attention(
        jnp.asarray(q.reshape(B, F)), jnp.asarray(kv_new),
        jnp.asarray(recent),
        jnp.asarray(kv_cache), jnp.asarray(positions, jnp.int32), H,
        block_s=64, interpret=True)
    for b in range(B):
        expected = _dense_oracle(q[b:b + 1], hists[b][0][None],
                                 hists[b][1][None])
        np.testing.assert_allclose(
            np.asarray(out, np.float32)[b].reshape(H, D), expected[0],
            atol=2e-5, rtol=1e-4, err_msg=f"slot {b}")


def test_kernel_int8_quantized_cache():
    """int8 cache: dequantized attention stays accurate."""
    pos = 64  # int8 window=32 -> boundary 64: rows [0, 64) quantized
    rng = np.random.RandomState(4)
    q = rng.randn(B, H, D).astype(np.float32)
    k_hist = rng.randn(B, pos + 1, H, D).astype(np.float32)
    v_hist = rng.randn(B, pos + 1, H, D).astype(np.float32)
    boundary = (pos // RECENT_INT8) * RECENT_INT8

    merged = _merge(k_hist, v_hist)
    kv_cache = np.zeros((B, S, 2 * F), np.int8)
    kv_scale = np.ones((B, S, 128), np.float32)
    for bb in range(B):
        for s in range(boundary):
            kr, vr = merged[bb, s, :F], merged[bb, s, F:]
            ks = np.abs(kr).max() / 127.0 + 1e-8
            vs = np.abs(vr).max() / 127.0 + 1e-8
            kv_cache[bb, s, :F] = np.clip(np.round(kr / ks), -127, 127)
            kv_cache[bb, s, F:] = np.clip(np.round(vr / vs), -127, 127)
            kv_scale[bb, s, :64] = ks
            kv_scale[bb, s, 64:] = vs

    recent = np.zeros((B, RECENT_INT8, 2 * F), np.float32)
    recent[:, :pos - boundary] = merged[:, boundary:pos]
    kv_new = merged[:, pos]

    out, kv_upd, sc_upd, _ = decode_attention(
        jnp.asarray(q.reshape(B, F)), jnp.asarray(kv_new),
        jnp.asarray(recent),
        jnp.asarray(kv_cache), jnp.int32(pos), H,
        kv_scale=jnp.asarray(kv_scale), block_s=64, interpret=True)

    expected = _dense_oracle(q, k_hist, v_hist)
    np.testing.assert_allclose(np.asarray(out).reshape(B, H, D), expected,
                               atol=0.03, rtol=0.03)


def test_kernel_int8_flush_roundtrip():
    """A flush step must write quantized rows that dequantize to the window."""
    pos = 95  # pos % 32 == 31 -> flush at boundary 64
    rng = np.random.RandomState(5)
    q = rng.randn(B, F).astype(np.float32)
    recent = rng.randn(B, RECENT_INT8, 2 * F).astype(np.float32)
    kv_new = rng.randn(B, 2 * F).astype(np.float32)
    kv_cache = np.zeros((B, S, 2 * F), np.int8)
    kv_scale = np.ones((B, S, 128), np.float32)

    out, kv_upd, sc_upd, _ = decode_attention(
        jnp.asarray(q), jnp.asarray(kv_new), jnp.asarray(recent),
        jnp.asarray(kv_cache),
        jnp.int32(pos), H, kv_scale=jnp.asarray(kv_scale), block_s=64,
        interpret=True)

    window = recent.copy()
    window[:, 31] = kv_new  # the kernel inserts the row before flushing
    kv_upd = np.asarray(kv_upd)
    sc_upd = np.asarray(sc_upd)
    deq_k = kv_upd[:, 64:96, :F].astype(np.float32) * sc_upd[:, 64:96, :1]
    deq_v = (kv_upd[:, 64:96, F:].astype(np.float32)
             * sc_upd[:, 64:96, 64:65])
    np.testing.assert_allclose(deq_k, window[:, :, :F], atol=0.05, rtol=0.05)
    np.testing.assert_allclose(deq_v, window[:, :, F:], atol=0.05, rtol=0.05)


def test_decode_step_pallas_matches_xla():
    """Full decode step: kernel path (interpret) vs XLA path, multi-step."""
    import functools

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

    labels = jnp.asarray(np.array([1, 5]))
    logits_x, cache_x = gpt.prefill(params, cfg, labels, cache_x,
                                    compute_dtype=jnp.float32)
    logits_p, cache_p = gpt.prefill(params, cfg, labels, cache_p,
                                    compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(logits_x), np.asarray(logits_p))
    base = (cfg.cls_token_num // RECENT) * RECENT
    recent = tuple(
        jax.lax.dynamic_slice(ckv, (0, base, 0), (b, RECENT, ckv.shape[2]))
        for ckv in cache_p.kv)

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
        lp, cache_p, recent = step_p(tok, pos, cache_p, recent)
        np.testing.assert_allclose(np.asarray(lp), np.asarray(lx),
                                   atol=2e-4, rtol=1e-3,
                                   err_msg=f"step {i} (pos {pos})")


def test_kernel_odd_head_dim():
    """head_dim=96 (GPT-3B-style non-power-of-2 heads): the head-segment
    matmul handles any head_dim as long as F is 128-aligned."""
    h2, d2 = 4, 96
    f2 = h2 * d2  # 384, 128-aligned
    rng = np.random.RandomState(11)
    pos = 40
    q = rng.randn(B, h2, d2).astype(np.float32)
    k_hist = rng.randn(B, pos + 1, h2, d2).astype(np.float32)
    v_hist = rng.randn(B, pos + 1, h2, d2).astype(np.float32)
    boundary = (pos // RECENT) * RECENT
    merged = np.concatenate([k_hist.reshape(B, pos + 1, f2),
                             v_hist.reshape(B, pos + 1, f2)], -1)
    kv_cache = np.zeros((B, 128, 2 * f2), np.float32)
    kv_cache[:, :boundary] = merged[:, :boundary]
    recent = np.zeros((B, RECENT, 2 * f2), np.float32)
    recent[:, :pos - boundary] = merged[:, boundary:pos]
    kv_new = merged[:, pos]

    out, _, _ = decode_attention(
        jnp.asarray(q.reshape(B, f2)), jnp.asarray(kv_new),
        jnp.asarray(recent),
        jnp.asarray(kv_cache), jnp.int32(pos), h2, block_s=64,
        interpret=True)

    scale = d2 ** -0.5
    scores = np.einsum("bhd,bshd->bhs", q, k_hist) * scale
    p = np.exp(scores - scores.max(-1, keepdims=True))
    p /= p.sum(-1, keepdims=True)
    expected = np.einsum("bhs,bshd->bhd", p, v_hist)
    np.testing.assert_allclose(np.asarray(out).reshape(B, h2, d2), expected,
                               atol=2e-5, rtol=1e-4)


@pytest.mark.parametrize("kv_heads,pos", [(2, 40), (2, 100), (2, 7)])
def test_kernel_gqa(kv_heads, pos):
    """GQA (kv_heads < n_head): the kernel lane-expands cache rows per
    query head (query head h reads kv head h // rep — the model path's
    jnp.repeat order, gpt._attention)."""
    h, d = 4, 64
    f = h * d
    f_kv = kv_heads * d          # 2*f_kv in {128, 256}: lane-aligned
    rep = h // kv_heads
    rng = np.random.RandomState(13)
    q = rng.randn(B, h, d).astype(np.float32)
    k_hist = rng.randn(B, pos + 1, kv_heads, d).astype(np.float32)
    v_hist = rng.randn(B, pos + 1, kv_heads, d).astype(np.float32)

    boundary = (pos // RECENT) * RECENT
    merged = np.concatenate([k_hist.reshape(B, pos + 1, f_kv),
                             v_hist.reshape(B, pos + 1, f_kv)], -1)
    kv_cache = rng.randn(B, 128, 2 * f_kv).astype(np.float32)
    kv_cache[:, :boundary] = merged[:, :boundary]
    recent = rng.randn(B, RECENT, 2 * f_kv).astype(np.float32)
    recent[:, :pos - boundary] = merged[:, boundary:pos]
    kv_new = merged[:, pos]

    out, kv_upd, recent_upd = decode_attention(
        jnp.asarray(q.reshape(B, f)), jnp.asarray(kv_new),
        jnp.asarray(recent), jnp.asarray(kv_cache), jnp.int32(pos), h,
        block_s=64, interpret=True)

    k_exp = np.repeat(k_hist, rep, axis=2)   # [B, S, h, d]
    v_exp = np.repeat(v_hist, rep, axis=2)
    expected = _dense_oracle(q, k_exp, v_exp)
    np.testing.assert_allclose(np.asarray(out).reshape(B, h, d), expected,
                               atol=2e-5, rtol=1e-4)
    # the window insert stores UNEXPANDED kv rows
    np.testing.assert_allclose(
        np.asarray(recent_upd)[:, pos - boundary], kv_new, atol=1e-6)


def test_gqa_generate_kernel_vs_xla():
    """End-to-end greedy GQA generation: kernel path == XLA path."""
    from llamagen_tpu.config import GPTConfig
    from llamagen_tpu.models import gpt as gpt_lib
    from llamagen_tpu.ops.generate import _kernel_supported, generate

    cfg = GPTConfig(dim=256, n_layer=2, n_head=4, n_kv_head=2,
                    block_size=16, num_classes=10, vocab_size=128,
                    cls_token_num=1, token_dropout_p=0.0,
                    resid_dropout_p=0.0, ffn_dropout_p=0.0)
    assert _kernel_supported(cfg, warn=False)  # GQA now kernel-eligible
    params = gpt_lib.init_params(jax.random.PRNGKey(0), cfg,
                                 dtype=jnp.float32)
    params = dict(params)
    params["output"] = jax.random.normal(
        jax.random.PRNGKey(1), params["output"].shape) * 0.02

    labels = jnp.asarray([1, 4])
    kw = dict(cfg=cfg, max_new_tokens=16, cfg_scale=2.0,
              sample_logits=False, compute_dtype=jnp.float32)
    ref = generate(params, jax.random.PRNGKey(0), labels,
                   use_kernel=False, cache_dtype=jnp.float32, **kw)
    out = generate(params, jax.random.PRNGKey(0), labels,
                   use_kernel=True, cache_dtype=jnp.float32, **kw)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


@pytest.mark.parametrize("pos", [0, 63, 100, 255])
def test_kernel_perb_window_mode(pos, monkeypatch):
    """Forced per-b window staging (the large-B VMEM-safe mode) matches
    the dense oracle at non-flush, flush, and wrap positions."""
    monkeypatch.setenv("LLAMAGEN_WINDOW_MODE", "perb")
    out, expected, kv_upd, _, recent, boundary = _run(pos, seed=4)
    np.testing.assert_allclose(out, expected, atol=2e-5, rtol=1e-4)
    if pos % 8 == 7:  # flush step: window must land in the cache
        np.testing.assert_allclose(kv_upd[:, boundary:pos + 1],
                                   recent[:, :pos + 1 - boundary],
                                   atol=1e-6)


def test_kernel_perb_per_slot_flush(monkeypatch):
    """per-b mode with ragged per-slot positions (engine shape): each
    row flushes independently of its neighbours."""
    monkeypatch.setenv("LLAMAGEN_WINDOW_MODE", "perb")
    test_kernel_per_slot_positions()


@pytest.mark.parametrize("pos", [0, 7, 63, 100, 255])
def test_kernel_split_window_mode(pos, monkeypatch):
    """Forced split-bulk window staging (two batch halves — the 128-slot
    mode) matches the dense oracle at non-flush, flush, and wrap
    positions. B=2 here makes the halves 1 row each, exercising the
    midpoint writeback/stage swap on every call."""
    monkeypatch.setenv("LLAMAGEN_WINDOW_MODE", "split")
    out, expected, kv_upd, _, recent, boundary = _run(pos, seed=4)
    np.testing.assert_allclose(out, expected, atol=2e-5, rtol=1e-4)
    if pos % 8 == 7:  # flush step: window must land in the cache
        np.testing.assert_allclose(kv_upd[:, boundary:pos + 1],
                                   recent[:, :pos + 1 - boundary],
                                   atol=1e-6)


def test_kernel_split_batch1_falls_back(monkeypatch):
    """Env-forced split mode at B=1 (a single-request A/B run) must not
    reach the kernel: split's midpoint swap needs two halves — at B=1 the
    swap never runs and the final writeback degenerates to a zero-row
    slice. The wrapper clamps to bulk; output must still match the
    oracle."""
    monkeypatch.setenv("LLAMAGEN_WINDOW_MODE", "split")
    pos = 100
    rng = np.random.RandomState(5)
    q = rng.randn(1, H, D).astype(np.float32)
    k_hist = rng.randn(1, pos + 1, H, D).astype(np.float32)
    v_hist = rng.randn(1, pos + 1, H, D).astype(np.float32)
    boundary = (pos // RECENT) * RECENT
    merged = _merge(k_hist, v_hist)
    kv_cache = rng.randn(1, S, 2 * F).astype(np.float32)
    kv_cache[:, :boundary] = merged[:, :boundary]
    recent = rng.randn(1, RECENT, 2 * F).astype(np.float32)
    recent[:, :pos - boundary] = merged[:, boundary:pos]
    out, _, _ = decode_attention(
        jnp.asarray(q.reshape(1, F)), jnp.asarray(merged[:, pos]),
        jnp.asarray(recent), jnp.asarray(kv_cache), jnp.int32(pos), H,
        block_s=64, interpret=True)
    expected = _dense_oracle(q, k_hist, v_hist)
    np.testing.assert_allclose(np.asarray(out).reshape(1, H, D), expected,
                               atol=2e-5, rtol=1e-4)


def test_kernel_split_per_slot_flush(monkeypatch):
    """split mode with ragged per-slot positions (engine shape): the two
    halves stage/retire independently with per-group live prefixes."""
    monkeypatch.setenv("LLAMAGEN_WINDOW_MODE", "split")
    test_kernel_per_slot_positions()


def test_kernel_split_window_insert_persists(monkeypatch):
    """split mode writes the non-flush insert back to HBM for BOTH
    halves (the midpoint retire covers half 0, the tail retire half 1)."""
    monkeypatch.setenv("LLAMAGEN_WINDOW_MODE", "split")
    pos = 100  # boundary 96 -> insert at window slot 4, no flush
    _, _, _, _, _, boundary = _run(pos, seed=6)
    rng = np.random.RandomState(6)
    q = rng.randn(B, H, D).astype(np.float32)
    k_hist = rng.randn(B, pos + 1, H, D).astype(np.float32)
    v_hist = rng.randn(B, pos + 1, H, D).astype(np.float32)
    kv_cache = rng.randn(B, S, 2 * F).astype(np.float32)
    merged = _merge(k_hist, v_hist)
    kv_cache[:, :boundary] = merged[:, :boundary]
    recent = rng.randn(B, RECENT, 2 * F).astype(np.float32)
    recent[:, :pos - boundary] = merged[:, boundary:pos]
    kv_new = merged[:, pos]
    _, _, recent_upd = decode_attention(
        jnp.asarray(q.reshape(B, F)), jnp.asarray(kv_new),
        jnp.asarray(recent), jnp.asarray(kv_cache), jnp.int32(pos), H,
        block_s=64, interpret=True)
    np.testing.assert_allclose(
        np.asarray(recent_upd)[:, pos - boundary], kv_new, atol=1e-6)
