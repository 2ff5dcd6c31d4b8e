"""AWQ activation-aware equalization (ops/awq.py)."""

import numpy as np
import pytest

import conftest  # noqa: F401

import jax
import jax.numpy as jnp

from llamagen_tpu.config import GPTConfig
from llamagen_tpu.models import gpt
from llamagen_tpu.ops.awq import (_fold_loss, _search_scale,
                                  awq_equalize_gpt_params)


def _tiny(n_head=2, kv_heads=None):
    kw = {} if kv_heads is None else {"n_kv_head": kv_heads}
    return GPTConfig(dim=128, n_layer=2, n_head=n_head, block_size=16,
                     num_classes=10, vocab_size=128, cls_token_num=1, **kw)


def _calib(cfg, n=8):
    rng = np.random.RandomState(0)
    labels = jnp.asarray(rng.randint(0, cfg.num_classes, size=(n,)))
    tokens = jnp.asarray(rng.randint(0, cfg.vocab_size, size=(n, 16)))
    return labels, tokens


@pytest.mark.parametrize("kv_heads", [None, 2])
def test_awq_fold_is_exact(kv_heads):
    """Equalization must not change the model function (f32, pre-quant)."""
    cfg = _tiny(n_head=4, kv_heads=kv_heads)
    params = gpt.init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    labels, tokens = _calib(cfg)
    eq = awq_equalize_gpt_params(params, cfg, labels, tokens,
                                 group_size=64, compute_dtype=jnp.float32)
    ref, _ = gpt.forward_train(params, cfg, labels, tokens[:, :-1],
                               train=False, compute_dtype=jnp.float32)
    got, _ = gpt.forward_train(eq, cfg, labels, tokens[:, :-1],
                               train=False, compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-3, atol=2e-3)


def test_awq_search_never_worse_than_identity():
    """alpha=0 (s=1) is in the grid, so the chosen scale's quantized-output
    error is <= the plain-RTN error by construction — and losses must
    actually realize that."""
    rng = np.random.RandomState(1)
    k, n = 128, 128
    # salient-channel regime: a few input channels carry 10x activations
    x = rng.randn(4, 64, k).astype(np.float32)
    x[..., :8] *= 10.0
    w = rng.randn(k, n).astype(np.float32) * 0.05
    from llamagen_tpu.ops.gptq import _group_table
    gid, _, _ = _group_table(k, 64, False)
    s, losses = _search_scale(jnp.asarray(x), [jnp.asarray(w)],
                              jnp.asarray(gid), int(gid.max()) + 1,
                              (0.0, 0.25, 0.5, 0.75, 1.0), sample=256)
    assert losses.min() <= losses[0] + 1e-12
    # in this regime equalization should strictly beat identity
    assert losses.min() < losses[0] * 0.9, losses
    # and the realized loss of the returned s matches the reported min
    xs = jnp.asarray(x.reshape(-1, k))
    got = float(_fold_loss(xs, jnp.asarray(w), s, jnp.asarray(gid),
                           ngroups=int(gid.max()) + 1))
    assert abs(got - losses.min()) < 1e-6 * max(1.0, losses.min())


def test_awq_then_rtn_pipeline_serves():
    """awq -> quantize_gpt_params_w4k -> forward works and does not hurt
    teacher-forced argmax agreement vs plain RTN."""
    from llamagen_tpu.ops.w4_matmul import quantize_gpt_params_w4k

    cfg = _tiny()
    params = gpt.init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    params["output"] = jax.random.normal(jax.random.PRNGKey(1),
                                         params["output"].shape) * 0.02
    labels, tokens = _calib(cfg)
    eq = awq_equalize_gpt_params(params, cfg, labels, tokens,
                                 group_size=64, compute_dtype=jnp.float32)
    qp = quantize_gpt_params_w4k(eq, group_size=64)
    rp = quantize_gpt_params_w4k(params, group_size=64)

    ref, _ = gpt.forward_train(params, cfg, labels, tokens[:, :-1],
                               train=False, compute_dtype=jnp.float32)
    al, _ = gpt.forward_train(qp, cfg, labels, tokens[:, :-1],
                              train=False, compute_dtype=jnp.float32)
    rl, _ = gpt.forward_train(rp, cfg, labels, tokens[:, :-1],
                              train=False, compute_dtype=jnp.float32)
    top = np.argmax(np.asarray(ref), -1)
    agree_awq = np.mean(np.argmax(np.asarray(al), -1) == top)
    agree_rtn = np.mean(np.argmax(np.asarray(rl), -1) == top)
    assert agree_awq >= agree_rtn - 0.02, (agree_awq, agree_rtn)
