"""GPTQ error-compensated W4 quantization (ops/gptq.py)."""

import numpy as np
import pytest

import conftest  # noqa: F401

import jax
import jax.numpy as jnp

from llamagen_tpu.config import GPTConfig
from llamagen_tpu.models import gpt
from llamagen_tpu.ops.gptq import (gptq_quantize_gpt_params,
                                   gptq_quantize_matrix, _hessian)
from llamagen_tpu.ops.w4_matmul import pack_w4, w4_dequant


def _corr_inputs(rng, b, k):
    """Correlated activations (low-rank + noise) — the regime where error
    compensation actually pays (iid inputs make H ~ I and GPTQ ~ RTN)."""
    basis = rng.randn(k, k // 4).astype(np.float32)
    z = rng.randn(b, k // 4).astype(np.float32)
    return z @ basis.T + 0.1 * rng.randn(b, k).astype(np.float32)


@pytest.mark.parametrize("mode", ["g128", "g64", "pc"])
def test_gptq_beats_rtn_weighted_mse(mode):
    rng = np.random.RandomState(0)
    k, n = 256, 128
    w = rng.randn(k, n).astype(np.float32) * 0.05
    x = _corr_inputs(rng, 4096, k)
    h = jnp.asarray(x.T @ x / len(x))

    kw = ({"per_channel": True} if mode == "pc"
          else {"group_size": int(mode[1:])})
    bq, sq = gptq_quantize_matrix(jnp.asarray(w), h, **kw)
    wq = np.asarray(w4_dequant(bq, sq))
    br, sr = pack_w4(jnp.asarray(w), **kw)
    wr = np.asarray(w4_dequant(br, sr))

    err_gptq = np.mean((x @ (wq - w)) ** 2)
    err_rtn = np.mean((x @ (wr - w)) ** 2)
    assert err_gptq < err_rtn * 0.9, (err_gptq, err_rtn)


def test_gptq_levels_and_layout():
    """Levels stay in int4 range; scales layout matches the kernel's."""
    rng = np.random.RandomState(1)
    k, n = 128, 128
    w = rng.randn(k, n).astype(np.float32)
    x = rng.randn(1024, k).astype(np.float32)
    bq, sq = gptq_quantize_matrix(jnp.asarray(w), jnp.asarray(x.T @ x),
                                  group_size=64)
    br, sr = pack_w4(jnp.asarray(w), group_size=64)
    assert bq.shape == br.shape and sq.shape == sr.shape
    # blocks hold nibble pairs: every unpacked level must be in [-8, 7]
    p32 = np.asarray(bq).astype(np.int32)
    lo = (p32 << 28) >> 28
    hi = p32 >> 4
    assert lo.min() >= -8 and lo.max() <= 7
    assert hi.min() >= -8 and hi.max() <= 7


def test_group64_rtn_roundtrip():
    """pack_w4 group-64 dequant error is bounded by half a quant step."""
    rng = np.random.RandomState(2)
    w = rng.randn(256, 128).astype(np.float32)
    b64, s64 = pack_w4(jnp.asarray(w), group_size=64)
    wq = np.asarray(w4_dequant(b64, s64))
    # per-(group, column) max-abs scale: error <= scale/2 per element
    assert np.abs(wq - w).max() <= np.abs(w).max() / 7.0
    b128, s128 = pack_w4(jnp.asarray(w), group_size=128)
    w128 = np.asarray(w4_dequant(b128, s128))
    assert np.mean((wq - w) ** 2) <= np.mean((w128 - w) ** 2) + 1e-9


def test_group64_matmul_matches_dequant():
    """w4_matmul (interpret) agrees with the XLA dequant at group-64."""
    from llamagen_tpu.ops.w4_matmul import w4_matmul

    rng = np.random.RandomState(3)
    w = rng.randn(256, 256).astype(np.float32)
    x = rng.randn(4, 256).astype(np.float32) * 0.1
    blocks, scales = pack_w4(jnp.asarray(w), group_size=64)
    ref = x @ np.asarray(w4_dequant(blocks, scales))
    out = np.asarray(w4_matmul(jnp.asarray(x, jnp.float32), blocks, scales,
                               interpret=True))
    np.testing.assert_allclose(out, ref, rtol=2e-2, atol=2e-2)


def test_gptq_gpt_end_to_end():
    """Whole-model GPTQ on a tiny GPT: runs, serves, and is at least as
    good as RTN at teacher-forced argmax agreement."""
    from llamagen_tpu.ops.w4_matmul import quantize_gpt_params_w4k

    cfg = GPTConfig(dim=128, n_layer=2, n_head=2, block_size=16,
                    num_classes=10, vocab_size=128, cls_token_num=1)
    params = gpt.init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    params["output"] = jax.random.normal(jax.random.PRNGKey(1),
                                         params["output"].shape) * 0.02
    rng = np.random.RandomState(0)
    labels = jnp.asarray(rng.randint(0, 10, size=(8,)))
    tokens = jnp.asarray(rng.randint(0, 128, size=(8, 16)))

    qp = gptq_quantize_gpt_params(params, cfg, labels, tokens,
                                  group_size=64,
                                  compute_dtype=jnp.float32)
    rp = quantize_gpt_params_w4k(params, group_size=64)

    logits, _ = gpt.forward_train(params, cfg, labels, tokens[:, :-1],
                                  train=False, compute_dtype=jnp.float32)
    ql, _ = gpt.forward_train(qp, cfg, labels, tokens[:, :-1],
                              train=False, compute_dtype=jnp.float32)
    rl, _ = gpt.forward_train(rp, cfg, labels, tokens[:, :-1],
                              train=False, compute_dtype=jnp.float32)
    ref = np.argmax(np.asarray(logits), -1)
    agree_gptq = np.mean(np.argmax(np.asarray(ql), -1) == ref)
    agree_rtn = np.mean(np.argmax(np.asarray(rl), -1) == ref)
    assert agree_gptq >= agree_rtn - 0.02, (agree_gptq, agree_rtn)

    # serving path consumes the GPTQ layout unchanged
    from llamagen_tpu.ops.generate import generate
    seq = generate(qp, jax.random.PRNGKey(0), jnp.asarray([1, 2]), cfg=cfg,
                   max_new_tokens=8, cfg_scale=2.0, sample_logits=False,
                   compute_dtype=jnp.float32, cache_dtype=jnp.float32)
    assert np.asarray(seq).shape == (2, 8)
