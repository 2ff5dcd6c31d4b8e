"""Tensor-parallel serving engine: multi-chip continuous batching.

Composes serve.engine's slot conventions with parallel.tp_decode's
Megatron decomposition on the virtual CPU mesh — the multi-chip serving
path the reference plumbs but never enables (gpu_executor.py:61-62)."""

import numpy as np
import pytest

import conftest  # noqa: F401

import pytest as _pytest

pytestmark = _pytest.mark.slow  # engine/e2e tier (pyproject markers)

import jax
import jax.numpy as jnp

from llamagen_tpu.config import GPTConfig
from llamagen_tpu.models import gpt
from llamagen_tpu.ops.generate import generate
from llamagen_tpu.parallel.mesh import make_mesh
from llamagen_tpu.parallel.tp_decode import shard_tp_params
from llamagen_tpu.serve.engine import SamplingParams, ServeEngine

# head_dim 128 keeps the per-chip flattened heads 128-lane aligned at tp=2
CFG = GPTConfig(dim=256, n_layer=2, n_head=2, block_size=16, num_classes=10,
                vocab_size=256, cls_token_num=1)
MAX_NEW = CFG.block_size
NTP = 2


@pytest.fixture(scope="module")
def setup():
    mesh = make_mesh(1, 1, NTP, devices=jax.devices()[:NTP])
    params = gpt.init_params(jax.random.PRNGKey(0), CFG, dtype=jnp.float32)
    params["output"] = jax.random.normal(jax.random.PRNGKey(1),
                                         params["output"].shape) * 0.02
    tp_params = shard_tp_params(params, CFG, mesh)
    return mesh, params, tp_params


def _tp_engine(setup, cache_dtype=jnp.float32, num_pairs=2, **sp_kw):
    mesh, _, tp_params = setup
    sp = SamplingParams(cfg_scale=2.0, temperature=1e-6, **sp_kw)
    return ServeEngine(tp_params, CFG, num_pairs=num_pairs,
                       max_new_tokens=MAX_NEW, sampling_params=sp,
                       chunk=4, compute_dtype=jnp.float32,
                       cache_dtype=cache_dtype, mesh=mesh, tp=NTP)


def test_tp_engine_matches_generate_greedy(setup):
    """TP-2 engine greedy tokens == single-device generate() trajectory."""
    _, params, _ = setup
    labels = [3, 7]
    out = _tp_engine(setup).generate(labels)
    ref = generate(params, jax.random.PRNGKey(0), jnp.asarray(labels),
                   cfg=CFG, max_new_tokens=MAX_NEW, cfg_scale=2.0,
                   sample_logits=False, compute_dtype=jnp.float32,
                   cache_dtype=jnp.float32)
    np.testing.assert_array_equal(out, np.asarray(ref))


def test_tp_engine_gqa_matches_generate_greedy():
    """GQA over the TP engine (r5): 4 query heads / 2 kv heads sharded
    over tp=2 — each chip owns 2 query + 1 kv head (128-lane kv shard).
    Greedy tokens must equal the single-device generate() trajectory."""
    cfg = GPTConfig(dim=512, n_layer=2, n_head=4, n_kv_head=2,
                    block_size=16, num_classes=10, vocab_size=256,
                    cls_token_num=1)
    mesh = make_mesh(1, 1, NTP, devices=jax.devices()[:NTP])
    params = gpt.init_params(jax.random.PRNGKey(4), cfg, dtype=jnp.float32)
    params["output"] = jax.random.normal(jax.random.PRNGKey(5),
                                         params["output"].shape) * 0.02
    tp_params = shard_tp_params(params, cfg, mesh)
    sp = SamplingParams(cfg_scale=2.0, temperature=1e-6)
    eng = ServeEngine(tp_params, cfg, num_pairs=2,
                      max_new_tokens=cfg.block_size, sampling_params=sp,
                      chunk=4, compute_dtype=jnp.float32,
                      cache_dtype=jnp.float32, mesh=mesh, tp=NTP)
    labels = [3, 7]
    out = eng.generate(labels)
    ref = generate(params, jax.random.PRNGKey(0), jnp.asarray(labels),
                   cfg=cfg, max_new_tokens=cfg.block_size, cfg_scale=2.0,
                   sample_logits=False, compute_dtype=jnp.float32,
                   cache_dtype=jnp.float32)
    np.testing.assert_array_equal(out, np.asarray(ref))


def test_tp_engine_slot_reuse(setup):
    """Stale KV in a reused sharded slot must not leak into a new request."""
    eng = _tp_engine(setup, num_pairs=1)
    out1 = eng.generate([5])
    out2 = eng.generate([5])
    np.testing.assert_array_equal(out1, out2)


def test_tp_engine_more_requests_than_slots(setup):
    eng = _tp_engine(setup, num_pairs=2)
    out = eng.generate([1, 2, 3, 4, 5])
    assert out.shape == (5, MAX_NEW)
    assert (out >= 0).all() and (out < CFG.vocab_size).all()
    stats = eng.stats()
    assert stats["running"] == 0 and stats["completed"] == 5


def test_tp_engine_w8a16_matches_single_device(setup):
    """W8A16 layer weights sharded over tp: dequant is exact per shard
    (per-output-channel scales are K-independent and column permutations
    commute with quantization), so greedy tokens must equal the
    single-device quantized generate() trajectory."""
    from llamagen_tpu.ops.quant_matmul import quantize_gpt_params

    mesh, params, _ = setup
    qparams = quantize_gpt_params(
        jax.tree.map(lambda x: jnp.asarray(x), params))
    tp_qparams = shard_tp_params(qparams, CFG, mesh)
    sp = SamplingParams(cfg_scale=2.0, temperature=1e-6)
    eng = ServeEngine(tp_qparams, CFG, num_pairs=2, max_new_tokens=MAX_NEW,
                      sampling_params=sp, chunk=4,
                      compute_dtype=jnp.float32, cache_dtype=jnp.float32,
                      mesh=mesh, tp=NTP)
    out = eng.generate([3, 7])
    ref = generate(qparams, jax.random.PRNGKey(0), jnp.asarray([3, 7]),
                   cfg=CFG, max_new_tokens=MAX_NEW, cfg_scale=2.0,
                   sample_logits=False, compute_dtype=jnp.float32,
                   cache_dtype=jnp.float32)
    np.testing.assert_array_equal(out, np.asarray(ref))


def test_tp_engine_int8_cache_close_to_fp(setup):
    """int8 KV on the TP path: per-chip quantization scales differ from the
    single-chip layout, so demand strong greedy agreement, not equality."""
    fp = _tp_engine(setup).generate([3, 7])
    q = _tp_engine(setup, cache_dtype=jnp.int8).generate([3, 7])
    agree = (fp == q).mean()
    assert agree >= 0.85, f"greedy agreement {agree:.3f}"


def test_tp_engine_per_request_cfg_scale(setup):
    """Per-request traced sampling params on the TP path: two different
    cfg_scales in one compiled TP program, each matching generate()."""
    _, params, _ = setup
    eng = _tp_engine(setup)
    r_a = eng.submit(3, sp=SamplingParams(cfg_scale=1.5, temperature=1e-6))
    r_b = eng.submit(7, sp=SamplingParams(cfg_scale=4.0, temperature=1e-6))
    eng.run_until_idle()
    for label, req, scale in [(3, r_a, 1.5), (7, r_b, 4.0)]:
        ref = generate(params, jax.random.PRNGKey(0), jnp.asarray([label]),
                       cfg=CFG, max_new_tokens=MAX_NEW, cfg_scale=scale,
                       sample_logits=False, compute_dtype=jnp.float32,
                       cache_dtype=jnp.float32)
        np.testing.assert_array_equal(req.result[None], np.asarray(ref))


# ---------------------------------------------------------------------------
# t2i TP serving (TP caption prefill + prefix_pad decode over the mesh)
# ---------------------------------------------------------------------------

T2I_T = 24
T2I_CFG = GPTConfig(dim=256, n_layer=2, n_head=2, block_size=16,
                    vocab_size=256, caption_dim=32, cls_token_num=T2I_T,
                    model_type="t2i", token_dropout_p=0.0,
                    resid_dropout_p=0.0, ffn_dropout_p=0.0)


@pytest.fixture(scope="module")
def t2i_setup():
    mesh = make_mesh(1, 1, NTP, devices=jax.devices()[:NTP])
    params = gpt.init_params(jax.random.PRNGKey(2), T2I_CFG,
                             dtype=jnp.float32)
    params["output"] = jax.random.normal(jax.random.PRNGKey(3),
                                         params["output"].shape) * 0.02
    tp_params = shard_tp_params(params, T2I_CFG, mesh)
    return mesh, params, tp_params


def _t2i_caption(b=2, seed=0):
    rng = np.random.RandomState(seed)
    emb = rng.randn(b, T2I_T, T2I_CFG.caption_dim).astype(np.float32)
    mask = np.ones((b, T2I_T), np.int32)
    for i in range(b):
        pad = (3 * i + 3) % (T2I_T - 4)
        mask[i, :pad] = 0
        emb[i, :pad] = 0
    return emb, mask


def test_tp_t2i_engine_matches_generate_greedy(t2i_setup):
    """TP-2 t2i engine (TP caption prefill, prefix_pad decode) greedy ==
    single-device generate() (the combination the reference's vLLM TP
    plumbing never enabled)."""
    mesh, params, tp_params = t2i_setup
    emb, mask = _t2i_caption()
    eng = ServeEngine(tp_params, T2I_CFG, num_pairs=2,
                      max_new_tokens=T2I_CFG.block_size,
                      sampling_params=SamplingParams(cfg_scale=3.0,
                                                     temperature=1e-6),
                      chunk=4, compute_dtype=jnp.float32,
                      cache_dtype=jnp.float32, mesh=mesh, tp=NTP)
    out = eng.generate_t2i(emb, mask)
    ref = generate(params, jax.random.PRNGKey(0), jnp.asarray(emb),
                   cfg=T2I_CFG, max_new_tokens=T2I_CFG.block_size,
                   emb_masks=jnp.asarray(mask), cfg_scale=3.0,
                   sample_logits=False, compute_dtype=jnp.float32,
                   cache_dtype=jnp.float32)
    np.testing.assert_array_equal(out, np.asarray(ref))


def test_tp_t2i_engine_slot_reuse_and_per_request(t2i_setup):
    """Slot reuse across more requests than slots + per-request cfg_scale
    on the TP t2i path."""
    mesh, params, tp_params = t2i_setup
    emb, mask = _t2i_caption(b=3, seed=5)
    eng = ServeEngine(tp_params, T2I_CFG, num_pairs=1,
                      max_new_tokens=T2I_CFG.block_size,
                      sampling_params=SamplingParams(cfg_scale=2.0,
                                                     temperature=1e-6),
                      chunk=4, compute_dtype=jnp.float32,
                      cache_dtype=jnp.float32, mesh=mesh, tp=NTP)
    reqs = [eng.submit_caption(emb[i], mask[i],
                               sp=SamplingParams(cfg_scale=1.5 + i,
                                                 temperature=1e-6))
            for i in range(3)]
    eng.run_until_idle()
    for i, req in enumerate(reqs):
        ref = generate(params, jax.random.PRNGKey(0),
                       jnp.asarray(emb[i:i + 1]), cfg=T2I_CFG,
                       max_new_tokens=T2I_CFG.block_size,
                       emb_masks=jnp.asarray(mask[i:i + 1]),
                       cfg_scale=1.5 + i, sample_logits=False,
                       compute_dtype=jnp.float32, cache_dtype=jnp.float32)
        np.testing.assert_array_equal(req.result[None], np.asarray(ref))


def test_tp_engine_w4_presharded_matches_dequant_reference(setup):
    """W4-on-TP via per-shard repacking (quantize_gpt_params_w4k_tp):
    the TP engine's greedy tokens must equal a single-device generate()
    over the EXACT dequantization of the per-shard packed weights
    (per-shard group boundaries differ from single-chip packing, so the
    oracle is built from the shards themselves)."""
    from llamagen_tpu.parallel.tp_decode import (
        quantize_gpt_params_w4k_tp, unshard_w4_tp_for_reference)

    mesh, params, _ = setup
    qtp = quantize_gpt_params_w4k_tp(
        jax.tree.map(jnp.asarray, params), CFG, NTP, group_size=64)
    # at least one matmul must actually be W4-packed in this geometry
    assert any(k.endswith("_w4b") for k in qtp["layers"]), (
        sorted(qtp["layers"]))
    ref_params = unshard_w4_tp_for_reference(qtp, CFG, NTP)
    tp_params = shard_tp_params(qtp, CFG, mesh)

    sp = SamplingParams(cfg_scale=2.0, temperature=1e-6)
    eng = ServeEngine(tp_params, CFG, num_pairs=2, max_new_tokens=MAX_NEW,
                      sampling_params=sp, chunk=4,
                      compute_dtype=jnp.float32, cache_dtype=jnp.float32,
                      mesh=mesh, tp=NTP)
    out = eng.generate([3, 7])
    ref = generate(ref_params, jax.random.PRNGKey(0), jnp.asarray([3, 7]),
                   cfg=CFG, max_new_tokens=MAX_NEW, cfg_scale=2.0,
                   sample_logits=False, compute_dtype=jnp.float32,
                   cache_dtype=jnp.float32)
    # the W4 kernel computes its dots in bf16 while the dequant oracle
    # runs f32 — greedy rollouts chain-diverge after a near-tie flip at
    # this nano scale, so gate on first-token exactness (layout/scatter/
    # psum correctness: a wiring bug scores ~0 here) + strong agreement
    ref = np.asarray(ref)
    assert (out[:, 0] == ref[:, 0]).all()
    agree = (out == ref).mean()
    assert agree >= 0.5, f"W4-TP greedy agreement {agree}"
