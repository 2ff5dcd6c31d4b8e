"""Serving engine tests: slot admission, CFG pairing, output correctness."""

import numpy as np
import pytest

import conftest  # noqa: F401

import jax
import jax.numpy as jnp

from llamagen_tpu.config import GPTConfig
from llamagen_tpu.models import gpt
from llamagen_tpu.ops.generate import generate
from llamagen_tpu.serve.engine import SamplingParams, ServeEngine

CFG = GPTConfig(dim=64, n_layer=2, n_head=4, block_size=16, num_classes=10,
                vocab_size=128, cls_token_num=1)
MAX_NEW = CFG.block_size


@pytest.fixture(scope="module")
def params():
    p = gpt.init_params(jax.random.PRNGKey(0), CFG)
    # randomize zero-initialized output head so logits are non-degenerate
    k = jax.random.PRNGKey(1)
    p["output"] = jax.random.normal(k, p["output"].shape) * 0.02
    return p


def _engine(params, num_pairs=4, chunk=4, cfg_scale=2.0):
    return ServeEngine(params, CFG, num_pairs=num_pairs,
                       max_new_tokens=MAX_NEW,
                       sampling_params=SamplingParams(cfg_scale=cfg_scale),
                       chunk=chunk, compute_dtype=jnp.float32)


def test_offline_batch_shapes(params):
    eng = _engine(params)
    out = eng.generate([1, 2, 3, 4, 5])  # more requests than slots
    assert out.shape == (5, MAX_NEW)
    assert (out >= 0).all() and (out < CFG.vocab_size).all()


def test_engine_matches_generate_greedy(params):
    """Greedy engine output must equal the batch generate() path."""
    labels = [3, 7]
    eng = ServeEngine(params, CFG, num_pairs=2, max_new_tokens=MAX_NEW,
                      sampling_params=SamplingParams(cfg_scale=2.0,
                                                     temperature=1e-6),
                      chunk=4, compute_dtype=jnp.float32)
    out = eng.generate(labels)
    ref = generate(params, jax.random.PRNGKey(0), jnp.asarray(labels),
                   cfg=CFG, max_new_tokens=MAX_NEW, cfg_scale=2.0,
                   sample_logits=False, compute_dtype=jnp.float32,
                   cache_dtype=jnp.float32)
    # temperature ~0 sampling == argmax; trajectories must coincide
    np.testing.assert_array_equal(out, np.asarray(ref))


def test_continuous_admission(params):
    """Requests submitted while others are running still complete."""
    eng = _engine(params, num_pairs=2, chunk=4)
    first = [eng.submit(i) for i in range(2)]
    eng._admit_and_step()  # engine busy with 2 requests
    late = [eng.submit(9) for _ in range(3)]
    eng.run_until_idle()
    for r in first + late:
        assert r.result is not None and r.result.shape == (MAX_NEW,)
    stats = eng.stats()
    assert stats["running"] == 0 and stats["waiting"] == 0


def test_staggered_equals_fresh(params):
    """A request admitted into a reused slot gives the same greedy result."""
    sp = SamplingParams(cfg_scale=1.5, temperature=1e-6)
    eng = ServeEngine(params, CFG, num_pairs=1, max_new_tokens=MAX_NEW,
                      sampling_params=sp, chunk=4, compute_dtype=jnp.float32)
    out1 = eng.generate([5])      # fills slot 0
    out2 = eng.generate([5])      # reuses slot 0 — stale cache must not leak
    np.testing.assert_array_equal(out1, out2)


def test_engine_kernel_path_matches_xla():
    """Kernel-path engine (interpret on CPU) == XLA-path engine, greedy."""
    cfg = GPTConfig(dim=128, n_layer=2, n_head=2, block_size=16,
                    num_classes=10, vocab_size=128, cls_token_num=1)
    p = gpt.init_params(jax.random.PRNGKey(0), cfg)
    p["output"] = jax.random.normal(jax.random.PRNGKey(1),
                                    p["output"].shape) * 0.02
    sp = SamplingParams(cfg_scale=2.0, temperature=1e-6)
    common = dict(num_pairs=2, max_new_tokens=cfg.block_size,
                  sampling_params=sp, chunk=4, compute_dtype=jnp.float32)
    eng_x = ServeEngine(p, cfg, use_kernel=False, **common)
    eng_k = ServeEngine(p, cfg, use_kernel=True, **common)
    labels = [3, 7, 1]
    out_x = eng_x.generate(labels)
    out_k = eng_k.generate(labels)
    np.testing.assert_array_equal(out_x, out_k)


def test_engine_int8_kernel_path():
    """int8-KV kernel engine produces valid tokens and matches greedy bf16
    closely (identical on small models)."""
    cfg = GPTConfig(dim=128, n_layer=2, n_head=2, block_size=16,
                    num_classes=10, vocab_size=128, cls_token_num=1)
    p = gpt.init_params(jax.random.PRNGKey(0), cfg)
    p["output"] = jax.random.normal(jax.random.PRNGKey(1),
                                    p["output"].shape) * 0.02
    sp = SamplingParams(cfg_scale=2.0, temperature=1e-6)
    common = dict(num_pairs=2, max_new_tokens=cfg.block_size,
                  sampling_params=sp, chunk=4, compute_dtype=jnp.float32)
    out16 = ServeEngine(p, cfg, use_kernel=True, **common).generate([3, 7])
    out8 = ServeEngine(p, cfg, use_kernel=True, cache_dtype=jnp.int8,
                       **common).generate([3, 7])
    agree = (out16 == out8).mean()
    assert agree > 0.9, f"int8 greedy agreement too low: {agree}"


# ---------------------------------------------------------------------------
# t2i serving (admission-time caption prefill + prefix_pad decode)
# ---------------------------------------------------------------------------

T2I_T = 24  # shortened caption window (the math is T-agnostic)
T2I_CFG = GPTConfig(dim=64, n_layer=2, n_head=4, block_size=16,
                    vocab_size=128, caption_dim=32, cls_token_num=T2I_T,
                    model_type="t2i", token_dropout_p=0.0,
                    resid_dropout_p=0.0, ffn_dropout_p=0.0)


@pytest.fixture(scope="module")
def t2i_params():
    p = gpt.init_params(jax.random.PRNGKey(2), T2I_CFG)
    p["output"] = jax.random.normal(jax.random.PRNGKey(3),
                                    p["output"].shape) * 0.02
    return p


def _t2i_caption(b=2, seed=0):
    rng = np.random.RandomState(seed)
    emb = rng.randn(b, T2I_T, T2I_CFG.caption_dim).astype(np.float32)
    mask = np.ones((b, T2I_T), np.int32)
    mask[0, :3] = 0
    emb[0, :3] = 0
    if b > 1:
        mask[1, :7] = 0
        emb[1, :7] = 0
    return emb, mask


# the Pallas kernel needs 128-aligned flattened features
def _t2i_cfg_for(use_kernel):
    if not use_kernel:
        return T2I_CFG
    import dataclasses
    return dataclasses.replace(T2I_CFG, dim=128, n_head=2)


@pytest.mark.parametrize("use_kernel", [False, True])
@pytest.mark.slow
def test_t2i_engine_matches_generate_greedy(t2i_params, use_kernel):
    """Greedy t2i engine output equals the batch generate() path
    (mirrors test_engine_matches_generate_greedy for c2i)."""
    cfg = _t2i_cfg_for(use_kernel)
    if use_kernel:
        params = gpt.init_params(jax.random.PRNGKey(2), cfg)
        params["output"] = jax.random.normal(jax.random.PRNGKey(3),
                                             params["output"].shape) * 0.02
    else:
        params = t2i_params
    emb, mask = _t2i_caption()
    if use_kernel:
        rng = np.random.RandomState(0)
        emb = rng.randn(2, T2I_T, cfg.caption_dim).astype(np.float32)
        emb[0, :3] = 0
        emb[1, :7] = 0
    eng = ServeEngine(params, cfg, num_pairs=2,
                      max_new_tokens=MAX_NEW,
                      sampling_params=SamplingParams(cfg_scale=3.0,
                                                     temperature=1e-6),
                      chunk=4, compute_dtype=jnp.float32,
                      use_kernel=use_kernel)
    out = eng.generate_t2i(emb, mask)
    ref = generate(params, jax.random.PRNGKey(0), jnp.asarray(emb),
                   cfg=cfg, max_new_tokens=MAX_NEW,
                   emb_masks=jnp.asarray(mask), cfg_scale=3.0,
                   sample_logits=False, compute_dtype=jnp.float32,
                   cache_dtype=jnp.float32, use_kernel=use_kernel)
    np.testing.assert_array_equal(out, np.asarray(ref))


@pytest.mark.slow
def test_t2i_engine_int8_cache_agreement(t2i_params):
    """int8 KV t2i engine greedily agrees with the bf16-cache engine
    (kernel path; quantize-at-admission + quantize-at-flush)."""
    cfg = _t2i_cfg_for(True)
    params = gpt.init_params(jax.random.PRNGKey(2), cfg)
    params["output"] = jax.random.normal(jax.random.PRNGKey(3),
                                         params["output"].shape) * 0.02
    rng = np.random.RandomState(4)
    emb = rng.randn(2, T2I_T, cfg.caption_dim).astype(np.float32)
    _, mask = _t2i_caption(seed=4)
    emb[0, :3] = 0
    emb[1, :7] = 0
    outs = []
    for cache_dtype in (jnp.float32, jnp.int8):
        eng = ServeEngine(params, cfg, num_pairs=2,
                          max_new_tokens=MAX_NEW,
                          sampling_params=SamplingParams(cfg_scale=3.0,
                                                         temperature=1e-6),
                          chunk=4,
                          compute_dtype=jnp.float32,
                          cache_dtype=cache_dtype, use_kernel=True)
        outs.append(eng.generate_t2i(emb, mask))
    # Rollout agreement is chain-sensitive: one marginal flip diverges the
    # rest of the stream. At nano scale with random weights + bf16 dequant
    # scales this is a coarse gate; the first token (admission prefill,
    # full precision both ways) must agree exactly.
    assert (outs[0][:, 0] == outs[1][:, 0]).all()
    agree = (outs[0] == outs[1]).mean()
    assert agree >= 0.6, f"int8 t2i agreement {agree}"


@pytest.mark.slow
def test_t2i_slot_reuse(t2i_params):
    """More requests than slots: reused slots must not leak stale caption
    KV or prefix pads."""
    emb, mask = _t2i_caption(b=5, seed=7)
    eng = ServeEngine(t2i_params, T2I_CFG, num_pairs=2,
                      max_new_tokens=MAX_NEW,
                      sampling_params=SamplingParams(cfg_scale=2.0,
                                                     temperature=1e-6),
                      chunk=4, compute_dtype=jnp.float32)
    out = eng.generate_t2i(emb, mask)
    ref = generate(t2i_params, jax.random.PRNGKey(0), jnp.asarray(emb),
                   cfg=T2I_CFG, max_new_tokens=MAX_NEW,
                   emb_masks=jnp.asarray(mask), cfg_scale=2.0,
                   sample_logits=False, compute_dtype=jnp.float32,
                   cache_dtype=jnp.float32)
    np.testing.assert_array_equal(out, np.asarray(ref))


def test_engine_latency_stats(params):
    eng = _engine(params, num_pairs=2, chunk=4)
    eng.generate([1, 2, 3])
    st = eng.stats()
    assert st["completed"] == 3
    assert st["e2e_latency_mean_s"] > 0
    assert st["e2e_latency_p99_s"] >= st["e2e_latency_p50_s"]
    assert st["throughput_img_per_s"] > 0


@pytest.mark.slow
def test_per_request_sampling_params(params):
    """Two requests with DIFFERENT cfg_scale run in one engine instance
    (one compiled program, params are traced data — VERDICT r2 #4) and
    each matches the single-scale generate() trajectory."""
    eng = ServeEngine(params, CFG, num_pairs=2, max_new_tokens=MAX_NEW,
                      sampling_params=SamplingParams(cfg_scale=2.0,
                                                     temperature=1e-6),
                      chunk=4, compute_dtype=jnp.float32)
    r_a = eng.submit(3, sp=SamplingParams(cfg_scale=1.5, temperature=1e-6))
    r_b = eng.submit(7, sp=SamplingParams(cfg_scale=4.0, temperature=1e-6))
    eng.run_until_idle()
    for label, req, scale in [(3, r_a, 1.5), (7, r_b, 4.0)]:
        ref = generate(params, jax.random.PRNGKey(0), jnp.asarray([label]),
                       cfg=CFG, max_new_tokens=MAX_NEW, cfg_scale=scale,
                       sample_logits=False, compute_dtype=jnp.float32,
                       cache_dtype=jnp.float32)
        np.testing.assert_array_equal(req.result[None], np.asarray(ref))


def test_per_request_topk_gating(params):
    """Mixed filtered/unfiltered requests coexist; a top_k=1 request is
    exactly greedy while its neighbour samples freely."""
    eng = ServeEngine(params, CFG, num_pairs=2, max_new_tokens=MAX_NEW,
                      sampling_params=SamplingParams(cfg_scale=2.0),
                      chunk=4, compute_dtype=jnp.float32)
    r_k = eng.submit(3, sp=SamplingParams(cfg_scale=2.0, top_k=1,
                                          temperature=1.0))
    eng.submit(7)  # engine-default params
    eng.run_until_idle()
    ref = generate(params, jax.random.PRNGKey(0), jnp.asarray([3]),
                   cfg=CFG, max_new_tokens=MAX_NEW, cfg_scale=2.0,
                   sample_logits=False, compute_dtype=jnp.float32,
                   cache_dtype=jnp.float32)
    np.testing.assert_array_equal(r_k.result[None], np.asarray(ref))


@pytest.mark.slow
def test_t2i_per_request_cfg_scale(t2i_params):
    """t2i: per-request cfg_scale through admission prefill + decode."""
    emb, mask = _t2i_caption()
    eng = ServeEngine(t2i_params, T2I_CFG, num_pairs=2,
                      max_new_tokens=MAX_NEW,
                      sampling_params=SamplingParams(cfg_scale=2.0,
                                                     temperature=1e-6),
                      chunk=4, compute_dtype=jnp.float32)
    reqs = [eng.submit_caption(emb[i], mask[i],
                               sp=SamplingParams(cfg_scale=s,
                                                 temperature=1e-6))
            for i, s in enumerate([1.5, 5.0])]
    eng.run_until_idle()
    for i, (req, scale) in enumerate(zip(reqs, [1.5, 5.0])):
        ref = generate(t2i_params, jax.random.PRNGKey(0),
                       jnp.asarray(emb[i:i + 1]), cfg=T2I_CFG,
                       max_new_tokens=MAX_NEW,
                       emb_masks=jnp.asarray(mask[i:i + 1]),
                       cfg_scale=scale, sample_logits=False,
                       compute_dtype=jnp.float32, cache_dtype=jnp.float32)
        np.testing.assert_array_equal(req.result[None], np.asarray(ref))


def test_ttft_tpot_stats(params):
    eng = _engine(params, num_pairs=2, chunk=4)
    eng.generate([1, 2])  # both admitted immediately: queue wait ~ 0
    st = eng.stats()
    assert st["ttft_mean_s"] is not None and st["ttft_mean_s"] >= 0
    assert st["tpot_mean_s"] is not None and st["tpot_mean_s"] > 0
    # sub-chunk TTFT: with no queue wait the first token lands one step
    # (1/MAX_NEW of the run) in, NOT at the chunk boundary (chunk/MAX_NEW
    # = 1/4 of the run). Assert finer than chunk granularity.
    assert st["ttft_p50_s"] <= st["e2e_latency_p50_s"] / 8


@pytest.mark.slow
def test_t2i_ttft_and_batched_admission(t2i_params):
    """t2i TTFT/TPOT stats populate; batched admission (odd request count
    exercises the padded tail of the _abatch-wide prefill)."""
    emb, mask = _t2i_caption(b=3, seed=11)
    eng = ServeEngine(t2i_params, T2I_CFG, num_pairs=2,
                      max_new_tokens=MAX_NEW,
                      sampling_params=SamplingParams(cfg_scale=2.0,
                                                     temperature=1e-6),
                      chunk=4, compute_dtype=jnp.float32)
    assert eng._abatch == 2  # batched admission active
    out = eng.generate_t2i(emb, mask)
    ref = generate(t2i_params, jax.random.PRNGKey(0), jnp.asarray(emb),
                   cfg=T2I_CFG, max_new_tokens=MAX_NEW,
                   emb_masks=jnp.asarray(mask), cfg_scale=2.0,
                   sample_logits=False, compute_dtype=jnp.float32,
                   cache_dtype=jnp.float32)
    np.testing.assert_array_equal(out, np.asarray(ref))
    st = eng.stats()
    assert st["ttft_mean_s"] is not None and st["tpot_mean_s"] > 0
