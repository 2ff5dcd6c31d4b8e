"""512px stage-2 t2i geometry: grid-32 (32x32 = 1024 tokens) + 120-token
caption prefix = sequence 1144, padded to the kernel's 128-aligned cache
length 1152.

The reference releases a 512px t2i model (ref README.md:91; sampling via
GETTING_STARTED t2i 512) — these tests pin the kernel-path geometry that
serves it: cache-length alignment, the recent-window base around t=120,
left-padded caption masking (prefix_pad), and block streaming at S=1152
(9 blocks of 128). VERDICT r3 gap #4.
"""

import numpy as np
import pytest

import conftest  # noqa: F401

import jax
import jax.numpy as jnp

from llamagen_tpu.config import GPTConfig, find_multiple
from llamagen_tpu.models import gpt
from llamagen_tpu.ops.attention import RECENT, RECENT_INT8, decode_attention
from llamagen_tpu.ops.generate import generate

T = 120            # t2i caption tokens (ref t5 feature length)
GRID = 32          # 512px / 16 = 32 -> 1024 code tokens
SEQ = T + GRID * GRID          # 1144
S = find_multiple(SEQ, 128)    # 1152: the kernel cache length

B, H, D = 2, 4, 64
F = H * D


def _dense_oracle(q, k_hist, v_hist, prefix_allow=None):
    scale = D ** -0.5
    scores = np.einsum("bhd,bshd->bhs", q, k_hist) * scale
    if prefix_allow is not None:
        npos = k_hist.shape[1]
        scores = np.where(prefix_allow[:, None, :npos], scores, -1e30)
    p = np.exp(scores - scores.max(-1, keepdims=True))
    p = p / p.sum(-1, keepdims=True)
    return np.einsum("bhs,bshd->bhd", p, v_hist)


def _merge(k, v):
    shape = k.shape[:-2]
    return np.concatenate([k.reshape(*shape, F), v.reshape(*shape, F)], -1)


def _run_kernel(pos, prefix_pad, dtype=np.float32, block_s=128, seed=0):
    w = RECENT
    rng = np.random.RandomState(seed)
    q = rng.randn(B, H, D).astype(np.float32)
    k_hist = rng.randn(B, pos + 1, H, D).astype(np.float32)
    v_hist = rng.randn(B, pos + 1, H, D).astype(np.float32)

    boundary = (pos // w) * w
    kv_cache = rng.randn(B, S, 2 * F).astype(np.float32)
    kv_cache[:, :boundary] = _merge(k_hist, v_hist)[:, :boundary]
    recent = rng.randn(B, w, 2 * F).astype(np.float32)
    merged = _merge(k_hist, v_hist)
    recent[:, :pos - boundary] = merged[:, boundary:pos]
    kv_new = merged[:, pos]

    out, _, _ = decode_attention(
        jnp.asarray(q.reshape(B, F), dtype), jnp.asarray(kv_new, dtype),
        jnp.asarray(recent, dtype), jnp.asarray(kv_cache, dtype),
        jnp.int32(pos), H,
        prefix_pad=jnp.asarray(prefix_pad, jnp.int32),
        block_s=block_s, interpret=True)

    allow = np.arange(pos + 1)[None, :] >= np.asarray(prefix_pad)[:, None]
    expected = _dense_oracle(q, k_hist, v_hist, allow)
    np.testing.assert_allclose(np.asarray(out, np.float32).reshape(B, H, D),
                               expected, atol=2e-5, rtol=1e-4)


# positions that straddle every alignment the 512px geometry exercises:
# first generated token (120), window-base boundary around t (innermost
# 8-row base = 120), first/last row of a 128-block, mid-sequence, and the
# final token of the 1144-token sequence (cache rows 1144..1151 unused)
@pytest.mark.parametrize("pos", [T, T + 7, T + 8, 127, 128, 255, 640,
                                 SEQ - 2, SEQ - 1])
def test_kernel_512px_positions(pos):
    # left-padded captions: per-sample pad counts below t=120
    _run_kernel(pos, prefix_pad=np.array([0, 77]))


def test_kernel_512px_full_prefix_masked():
    # a caption padded to a single valid token (pad = 119)
    _run_kernel(SEQ - 1, prefix_pad=np.array([119, 40]))


def test_kernel_512px_int8_cache():
    """int8 cache at the 512px geometry: w=32 window base around t=120."""
    w = RECENT_INT8
    pos = T + 1                      # boundary = 96 < t: caption rows
    rng = np.random.RandomState(3)   # 96..119 still live in the window
    q = rng.randn(B, H, D).astype(np.float32)
    k_hist = rng.randn(B, pos + 1, H, D).astype(np.float32)
    v_hist = rng.randn(B, pos + 1, H, D).astype(np.float32)
    merged = _merge(k_hist, v_hist)

    boundary = (pos // w) * w
    kv_q = np.zeros((B, S, 2 * F), np.int8)
    kv_scale = np.ones((B, S, 128), np.float32)
    for b in range(B):
        for s in range(boundary):
            ks = np.abs(merged[b, s, :F]).max() / 127.0 + 1e-8
            vs = np.abs(merged[b, s, F:]).max() / 127.0 + 1e-8
            kv_q[b, s, :F] = np.clip(np.round(merged[b, s, :F] / ks),
                                     -127, 127)
            kv_q[b, s, F:] = np.clip(np.round(merged[b, s, F:] / vs),
                                     -127, 127)
            kv_scale[b, s, :64] = ks
            kv_scale[b, s, 64:] = vs
    recent = np.zeros((B, w, 2 * F), np.float32)
    recent[:, :pos - boundary] = merged[:, boundary:pos]

    prefix_pad = np.array([0, 50])
    out, _, _, _ = decode_attention(
        jnp.asarray(q.reshape(B, F), jnp.float32),
        jnp.asarray(merged[:, pos], jnp.float32),
        jnp.asarray(recent), jnp.asarray(kv_q), jnp.int32(pos), H,
        prefix_pad=jnp.asarray(prefix_pad, jnp.int32),
        kv_scale=jnp.asarray(kv_scale), interpret=True)

    allow = np.arange(pos + 1)[None, :] >= prefix_pad[:, None]
    expected = _dense_oracle(q, k_hist, v_hist, allow)
    np.testing.assert_allclose(np.asarray(out, np.float32).reshape(B, H, D),
                               expected, atol=2e-2, rtol=2e-2)  # int8 cache


@pytest.mark.slow
def test_t2i_512_generate_kernel_vs_xla():
    """Greedy grid-32 t2i generation: kernel path == XLA path token-exact
    at the full 1144-token geometry (tiny model, both paths on CPU)."""
    cfg = GPTConfig(dim=128, n_layer=2, n_head=2, block_size=GRID * GRID,
                    num_classes=10, vocab_size=512, cls_token_num=T,
                    model_type="t2i", caption_dim=64,
                    token_dropout_p=0.0, resid_dropout_p=0.0,
                    ffn_dropout_p=0.0)
    params = gpt.init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    params = dict(params)
    params["output"] = jax.random.normal(
        jax.random.PRNGKey(1), params["output"].shape) * 0.02

    rng = np.random.RandomState(0)
    caps = rng.randn(2, T, cfg.caption_dim).astype(np.float32)
    masks = np.ones((2, T), bool)
    masks[0, :30] = False   # left-padded caption
    caps[0, :30] = 0

    kw = dict(cfg=cfg, max_new_tokens=cfg.block_size,
              emb_masks=jnp.asarray(masks), cfg_scale=2.0,
              sample_logits=False, compute_dtype=jnp.float32)
    ref = generate(params, jax.random.PRNGKey(0), jnp.asarray(caps),
                   use_kernel=False, cache_dtype=jnp.float32, **kw)
    out = generate(params, jax.random.PRNGKey(0), jnp.asarray(caps),
                   use_kernel=True, cache_dtype=jnp.float32, **kw)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
