"""Tensor-parallel kernel decode: shard_map path vs single-device decode."""

import numpy as np
import pytest

import conftest  # noqa: F401

import pytest as _pytest

pytestmark = _pytest.mark.slow  # engine/e2e tier (pyproject markers)

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from llamagen_tpu.config import GPTConfig
from llamagen_tpu.models import gpt
from llamagen_tpu.parallel.mesh import make_mesh
from llamagen_tpu.parallel.tp_decode import make_tp_decode_step, shard_tp_params

CFG = GPTConfig(dim=512, n_layer=2, n_head=4, block_size=16, num_classes=10,
                vocab_size=256, cls_token_num=1)
NTP = 4

# GQA geometry (r5): 4 query heads sharing 2 kv heads, head_dim 128 ->
# per-shard kv lanes 128-aligned at tp=2
CFG_GQA = GPTConfig(dim=512, n_layer=2, n_head=4, n_kv_head=2,
                    block_size=16, num_classes=10, vocab_size=256,
                    cls_token_num=1)


def test_tp_decode_matches_single_device():
    mesh = make_mesh(1, 1, NTP, devices=jax.devices()[:NTP])
    params = gpt.init_params(jax.random.PRNGKey(0), CFG)
    params["output"] = jax.random.normal(jax.random.PRNGKey(1),
                                         params["output"].shape) * 0.02

    b, smax = 2, 128
    w = 8
    # single-device reference path
    cache_ref = gpt.init_cache(CFG, b, smax, dtype=jnp.float32)
    recent_ref = gpt.init_recent(CFG, b, dtype=jnp.float32, window=w)

    # TP path: shard params + per-layer cache over tp (2F features split)
    tp_params = shard_tp_params(
        jax.tree.map(lambda x: jnp.asarray(x, jnp.float32), params), CFG, mesh)
    kv_sharding = NamedSharding(mesh, P(None, None, "tp"))
    cache_kv = tuple(
        jax.device_put(jnp.zeros((b, smax, 2 * CFG.dim)), kv_sharding)
        for _ in range(CFG.n_layer))
    recent = tuple(
        jax.device_put(jnp.zeros((b, w, 2 * CFG.dim)), kv_sharding)
        for _ in range(CFG.n_layer))

    step_tp = jax.jit(make_tp_decode_step(CFG, mesh, NTP,
                                          compute_dtype=jnp.float32))

    rng = np.random.RandomState(0)
    for i in range(10):  # crosses a window flush at pos 7
        pos = jnp.int32(i)
        tok = jnp.asarray(rng.randint(0, CFG.vocab_size, size=(b,)))
        ref_logits, cache_ref, recent_ref = gpt.decode_step_pallas(
            params, CFG, tok, pos, cache_ref, recent_ref,
            compute_dtype=jnp.float32, interpret=True)
        tp_logits, cache_kv, recent = step_tp(
            tp_params, tok, pos, cache_kv, recent)
        np.testing.assert_allclose(np.asarray(tp_logits),
                                   np.asarray(ref_logits), atol=5e-4,
                                   rtol=1e-3, err_msg=f"step {i}")


def test_tp_decode_gqa_matches_single_device():
    """GQA over TP (r5): head-major wqkv shards keep each query head with
    its kv head (h -> h // rep stays shard-local); the lane-sharded cache
    carries kv_heads*head_dim features. Oracle: the single-device GQA
    kernel decode (itself oracle-tested in test_attention_kernel)."""
    cfg = CFG_GQA
    ntp = 2
    mesh = make_mesh(1, 1, ntp, devices=jax.devices()[:ntp])
    params = gpt.init_params(jax.random.PRNGKey(2), cfg)
    params["output"] = jax.random.normal(jax.random.PRNGKey(3),
                                         params["output"].shape) * 0.02

    b, smax, w = 2, 128, 8
    f_kv2 = 2 * cfg.kv_heads * cfg.head_dim
    cache_ref = gpt.init_cache(cfg, b, smax, dtype=jnp.float32)
    recent_ref = gpt.init_recent(cfg, b, dtype=jnp.float32, window=w)

    tp_params = shard_tp_params(
        jax.tree.map(lambda x: jnp.asarray(x, jnp.float32), params), cfg,
        mesh)
    kv_sharding = NamedSharding(mesh, P(None, None, "tp"))
    cache_kv = tuple(
        jax.device_put(jnp.zeros((b, smax, f_kv2)), kv_sharding)
        for _ in range(cfg.n_layer))
    recent = tuple(
        jax.device_put(jnp.zeros((b, w, f_kv2)), kv_sharding)
        for _ in range(cfg.n_layer))

    step_tp = jax.jit(make_tp_decode_step(cfg, mesh, ntp,
                                          compute_dtype=jnp.float32))

    rng = np.random.RandomState(1)
    for i in range(10):
        pos = jnp.int32(i)
        tok = jnp.asarray(rng.randint(0, cfg.vocab_size, size=(b,)))
        ref_logits, cache_ref, recent_ref = gpt.decode_step_pallas(
            params, cfg, tok, pos, cache_ref, recent_ref,
            compute_dtype=jnp.float32, interpret=True)
        tp_logits, cache_kv, recent = step_tp(
            tp_params, tok, pos, cache_kv, recent)
        np.testing.assert_allclose(np.asarray(tp_logits),
                                   np.asarray(ref_logits), atol=5e-4,
                                   rtol=1e-3, err_msg=f"step {i}")
