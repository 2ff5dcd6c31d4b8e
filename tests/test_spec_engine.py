"""Speculative serving engine (serve/spec_engine.py).

Contracts:
  1. greedy output is token-exact vs the plain `ops.generate` greedy
     chain per request (speculation changes speed, never tokens);
  2. greedy output also matches the NON-speculative ServeEngine;
  3. self-draft greedy accepts everything: tokens/round ~= k+1;
  4. mixed per-slot cfg_scale batches match per-request generate;
  5. t2i left-padded captions thread prefix_pad through both caches;
  6. continuous admission (more requests than slots) reuses slots
     correctly;
  7. stochastic mode runs and fills valid token ids.
"""

import numpy as np
import pytest

import conftest  # noqa: F401

import pytest as _pytest

pytestmark = _pytest.mark.slow  # engine/e2e tier (pyproject markers)

import jax
import jax.numpy as jnp

from llamagen_tpu.config import gpt_config
from llamagen_tpu.models import gpt
from llamagen_tpu.ops.generate import generate
from llamagen_tpu.serve.engine import SamplingParams, ServeEngine
from llamagen_tpu.serve.spec_engine import SpecEngine


def _tiny(seed, **kw):
    cfg = gpt_config("GPT-nano", block_size=64, vocab_size=512,
                     num_classes=10, **kw)
    params = gpt.init_params(jax.random.PRNGKey(seed), cfg,
                             dtype=jnp.float32)
    return cfg, params


GREEDY = SamplingParams(cfg_scale=2.0, temperature=0.0)


def test_greedy_token_exact_vs_generate():
    cfg, params = _tiny(0)
    _, draft_params = _tiny(1)  # unrelated draft: low acceptance
    labels = [0, 3, 7]
    ref = generate(params, jax.random.PRNGKey(2), jnp.asarray(labels),
                   cfg=cfg, max_new_tokens=24, cfg_scale=2.0,
                   sample_logits=False, compute_dtype=jnp.float32,
                   use_kernel=False)
    eng = SpecEngine(params, draft_params, cfg, cfg, num_pairs=4,
                     max_new_tokens=24, k=3, sampling_params=GREEDY,
                     compute_dtype=jnp.float32, use_kernel=False)
    got = eng.generate(labels)
    np.testing.assert_array_equal(got, np.asarray(ref))
    st = eng.stats()
    assert st["completed"] == 3
    assert st["tokens_per_round_per_slot"] >= 1.0


def test_greedy_matches_nonspec_engine():
    cfg, params = _tiny(0)
    _, draft_params = _tiny(1)
    labels = [1, 4, 8, 2]
    base = ServeEngine(params, cfg, num_pairs=4, max_new_tokens=20,
                       sampling_params=GREEDY, compute_dtype=jnp.float32,
                       use_kernel=False)
    ref = base.generate(labels)
    eng = SpecEngine(params, draft_params, cfg, cfg, num_pairs=4,
                     max_new_tokens=20, k=2, sampling_params=GREEDY,
                     compute_dtype=jnp.float32, use_kernel=False)
    got = eng.generate(labels)
    np.testing.assert_array_equal(got, ref)


def test_self_draft_greedy_accepts_everything():
    cfg, params = _tiny(0)
    eng = SpecEngine(params, params, cfg, cfg, num_pairs=2,
                     max_new_tokens=25, k=3, sampling_params=GREEDY,
                     compute_dtype=jnp.float32, use_kernel=False)
    got = eng.generate([1, 2])
    ref = generate(params, jax.random.PRNGKey(0), jnp.asarray([1, 2]),
                   cfg=cfg, max_new_tokens=25, cfg_scale=2.0,
                   sample_logits=False, compute_dtype=jnp.float32,
                   use_kernel=False)
    np.testing.assert_array_equal(got, np.asarray(ref))
    # first token from admission; remaining 24 commit in k+1=4 batches
    assert eng.stats()["acceptance_rate"] == pytest.approx(1.0)
    assert eng._rounds == -(-(25 - 1) // 4)


def test_per_slot_cfg_scale_mixed_batch():
    cfg, params = _tiny(0)
    _, draft_params = _tiny(1)
    eng = SpecEngine(params, draft_params, cfg, cfg, num_pairs=2,
                     max_new_tokens=16, k=2, sampling_params=GREEDY,
                     compute_dtype=jnp.float32, use_kernel=False)
    r_a = eng.submit(3, sp=SamplingParams(cfg_scale=1.5, temperature=0.0))
    r_b = eng.submit(5, sp=SamplingParams(cfg_scale=3.0, temperature=0.0))
    eng.run_until_idle()
    for label, scale, req in [(3, 1.5, r_a), (5, 3.0, r_b)]:
        ref = generate(params, jax.random.PRNGKey(0),
                       jnp.asarray([label]), cfg=cfg, max_new_tokens=16,
                       cfg_scale=scale, sample_logits=False,
                       compute_dtype=jnp.float32, use_kernel=False)
        np.testing.assert_array_equal(req.result, np.asarray(ref)[0])


def test_continuous_admission_slot_reuse():
    cfg, params = _tiny(0)
    _, draft_params = _tiny(1)
    labels = [0, 1, 2, 3, 4, 5]  # 6 requests through 2 slots
    eng = SpecEngine(params, draft_params, cfg, cfg, num_pairs=2,
                     max_new_tokens=12, k=2, sampling_params=GREEDY,
                     compute_dtype=jnp.float32, use_kernel=False)
    got = eng.generate(labels)
    ref = generate(params, jax.random.PRNGKey(2), jnp.asarray(labels),
                   cfg=cfg, max_new_tokens=12, cfg_scale=2.0,
                   sample_logits=False, compute_dtype=jnp.float32,
                   use_kernel=False)
    np.testing.assert_array_equal(got, np.asarray(ref))
    assert eng.stats()["completed"] == 6


def test_stochastic_mode_runs():
    cfg, params = _tiny(0)
    _, draft_params = _tiny(1)
    eng = SpecEngine(params, draft_params, cfg, cfg, num_pairs=2,
                     max_new_tokens=16, k=2,
                     sampling_params=SamplingParams(cfg_scale=1.5,
                                                    temperature=1.0,
                                                    top_k=50, top_p=0.9),
                     compute_dtype=jnp.float32, use_kernel=False)
    got = eng.generate([1, 2, 3])
    assert got.shape == (3, 16)
    assert ((got >= 0) & (got < cfg.vocab_size)).all()
    st = eng.stats()
    assert 0.0 <= st["acceptance_rate"] <= 1.0


def test_t2i_spec_engine_greedy():
    cfg, params = _tiny(0, model_type="t2i", cls_token_num=6,
                        caption_dim=32)
    _, draft_params = _tiny(1, model_type="t2i", cls_token_num=6,
                            caption_dim=32)
    rng = np.random.default_rng(0)
    caps = rng.normal(size=(3, 6, 32)).astype(np.float32)
    masks = np.ones((3, 6), bool)
    masks[0, :2] = False  # left-padded caption
    masks[2, :4] = False
    # left-padding convention: masked rows are zeroed
    caps = caps * masks[..., None]
    ref = generate(params, jax.random.PRNGKey(2), jnp.asarray(caps),
                   cfg=cfg, max_new_tokens=16, cfg_scale=2.0,
                   emb_masks=jnp.asarray(masks), sample_logits=False,
                   compute_dtype=jnp.float32, use_kernel=False)
    eng = SpecEngine(params, draft_params, cfg, cfg, num_pairs=2,
                     max_new_tokens=16, k=2, sampling_params=GREEDY,
                     compute_dtype=jnp.float32, use_kernel=False)
    got = eng.generate_t2i(caps, masks)
    np.testing.assert_array_equal(got, np.asarray(ref))


def test_penalties_rejected():
    cfg, params = _tiny(0)
    with pytest.raises(AssertionError):
        SpecEngine(params, params, cfg, cfg, num_pairs=2,
                   sampling_params=SamplingParams(presence_penalty=0.5),
                   compute_dtype=jnp.float32, use_kernel=False)
