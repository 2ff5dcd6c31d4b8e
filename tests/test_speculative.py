"""Speculative decoding: greedy exactness, distribution preservation,
acceptance bookkeeping.

The load-bearing contracts (ops/speculative.py):
  1. greedy spec output is token-exact vs the plain `ops.generate` loop
     for an ARBITRARY draft model (acceptance only changes how fast the
     chain advances, never which tokens it commits);
  2. draft == target at greedy accepts every proposal: verify rounds =
     ceil(max_new / (k+1));
  3. `spec_accept`'s accept/resample step reproduces the target
     distribution empirically (the Leviathan/Chen guarantee);
  4. t2i left-padded captions thread prefix_pad through draft + verify.
"""

import numpy as np
import pytest

import conftest  # noqa: F401

import jax
import jax.numpy as jnp

from llamagen_tpu.config import gpt_config
from llamagen_tpu.models import gpt
from llamagen_tpu.ops.generate import generate
from llamagen_tpu.ops.speculative import (generate_speculative, spec_accept,
                                          warped_probs)


def _tiny(seed, **kw):
    cfg = gpt_config("GPT-nano", block_size=64, vocab_size=512,
                     num_classes=10, **kw)
    params = gpt.init_params(jax.random.PRNGKey(seed), cfg,
                             dtype=jnp.float32)
    return cfg, params


@pytest.mark.parametrize("cfg_scale", [1.0, 2.0])
def test_greedy_token_exact_vs_generate(cfg_scale):
    cfg, params = _tiny(0)
    _, draft_params = _tiny(1)  # unrelated draft: low acceptance
    labels = jnp.asarray([0, 3, 7])
    ref = generate(params, jax.random.PRNGKey(2), labels, cfg=cfg,
                   max_new_tokens=24, cfg_scale=cfg_scale,
                   sample_logits=False, compute_dtype=jnp.float32,
                   use_kernel=False)
    got, rounds = generate_speculative(
        params, draft_params, jax.random.PRNGKey(2), labels, cfg=cfg,
        draft_cfg=cfg, max_new_tokens=24, k=3, cfg_scale=cfg_scale,
        sample_logits=False, compute_dtype=jnp.float32)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
    # an unrelated draft must still make progress (>= 1 token per round)
    assert int(rounds) <= 24


def test_self_draft_greedy_accepts_everything():
    cfg, params = _tiny(0)
    labels = jnp.asarray([1, 2])
    k, max_new = 3, 24
    got, rounds = generate_speculative(
        params, params, jax.random.PRNGKey(0), labels, cfg=cfg,
        draft_cfg=cfg, max_new_tokens=max_new, k=k, cfg_scale=2.0,
        sample_logits=False, compute_dtype=jnp.float32)
    ref = generate(params, jax.random.PRNGKey(0), labels, cfg=cfg,
                   max_new_tokens=max_new, cfg_scale=2.0,
                   sample_logits=False, compute_dtype=jnp.float32,
                   use_kernel=False)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
    # first token comes from prefill; the remaining 23 commit in ceil
    # batches of k+1 = 4
    assert int(rounds) == -(-(max_new - 1) // (k + 1))


@pytest.mark.slow
def test_stochastic_runs_and_is_in_range():
    cfg, params = _tiny(0)
    _, draft_params = _tiny(1)
    labels = jnp.asarray([5, 9])
    got, rounds = generate_speculative(
        params, draft_params, jax.random.PRNGKey(3), labels, cfg=cfg,
        draft_cfg=cfg, max_new_tokens=16, k=2, cfg_scale=1.5,
        temperature=1.0, top_k=50, sample_logits=True,
        compute_dtype=jnp.float32)
    a = np.asarray(got)
    assert a.shape == (2, 16)
    assert (a >= 0).all() and (a < cfg.vocab_size).all()
    assert 1 <= int(rounds) <= 16


@pytest.mark.parametrize("model_type", ["c2i", "t2i"])
@pytest.mark.slow
def test_kernel_mode_greedy_token_exact(model_type):
    """use_kernel=True (Pallas chunk attention, interpret on CPU) commits
    the same greedy tokens as plain generate, c2i and t2i."""
    kw = (dict() if model_type == "c2i"
          else dict(model_type="t2i", cls_token_num=8, caption_dim=32))
    cfg, params = _tiny(0, **kw)
    _, draft_params = _tiny(1, **kw)
    if model_type == "c2i":
        cond, masks = jnp.asarray([0, 7]), None
    else:
        cond = jnp.asarray(np.random.RandomState(0).randn(2, 8, 32),
                           jnp.float32)
        masks = jnp.asarray([[0, 0, 1, 1, 1, 1, 1, 1],
                             [1, 1, 1, 1, 1, 1, 1, 1]], bool)
    ref = generate(params, jax.random.PRNGKey(2), cond, cfg=cfg,
                   max_new_tokens=16, emb_masks=masks, cfg_scale=2.0,
                   sample_logits=False, compute_dtype=jnp.float32,
                   use_kernel=False)
    got, _ = generate_speculative(
        params, draft_params, jax.random.PRNGKey(2), cond, cfg=cfg,
        draft_cfg=cfg, max_new_tokens=16, k=3, emb_masks=masks,
        cfg_scale=2.0, sample_logits=False, compute_dtype=jnp.float32,
        use_kernel=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


@pytest.mark.slow
def test_kernel_mode_gqa_greedy_token_exact():
    """GQA draft/target through the chunk kernel (r5: lane-tiled kv like
    the decode kernel) commit the same greedy tokens as plain generate."""
    from llamagen_tpu.config import GPTConfig

    cfg = GPTConfig(dim=512, n_layer=2, n_head=4, n_kv_head=2,
                    block_size=64, vocab_size=512, num_classes=10)
    params = gpt.init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    draft_params = gpt.init_params(jax.random.PRNGKey(1), cfg,
                                   dtype=jnp.float32)
    cond = jnp.asarray([0, 7])
    ref = generate(params, jax.random.PRNGKey(2), cond, cfg=cfg,
                   max_new_tokens=16, cfg_scale=2.0, sample_logits=False,
                   compute_dtype=jnp.float32, use_kernel=False)
    got, _ = generate_speculative(
        params, draft_params, jax.random.PRNGKey(2), cond, cfg=cfg,
        draft_cfg=cfg, max_new_tokens=16, k=3, cfg_scale=2.0,
        sample_logits=False, compute_dtype=jnp.float32, use_kernel=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_verify_step_matches_sequential_decode():
    """verify_step_slots logits == per-token decode_step logits at every
    chunk row (same cache trajectory), with per-element positions."""
    from llamagen_tpu.ops.speculative import verify_step_slots

    cfg, params = _tiny(0)
    b, t, c = 2, cfg.cls_token_num, 4
    rng = np.random.RandomState(0)
    toks = jnp.asarray(rng.randint(0, cfg.vocab_size, (b, c)))
    # diverged per-element positions (continuous-batching style)
    pos = jnp.asarray([t + 3, t + 7], jnp.int32)

    smax = 32
    cache_v = gpt.init_cache(cfg, b, smax, dtype=jnp.float32)
    cache_s = gpt.init_cache(cfg, b, smax, dtype=jnp.float32)
    # build identical history for both caches: random warm-up tokens per
    # element up to its pos via the engine's per-slot step
    from llamagen_tpu.serve.engine import _decode_step_slots

    hist = jnp.asarray(rng.randint(0, cfg.vocab_size, (b, 16)))
    for j in range(int(pos.max())):
        live = jnp.asarray([j < int(p) for p in np.asarray(pos)])
        emb = params["tok_embeddings"][hist[:, j % 16]].astype(jnp.float32)
        posj = jnp.minimum(jnp.full((b,), j, jnp.int32), pos - 1)
        _, cache_v = _decode_step_slots(params, cfg, emb, posj, cache_v,
                                        compute_dtype=jnp.float32)
        _, cache_s = _decode_step_slots(params, cfg, emb, posj, cache_s,
                                        compute_dtype=jnp.float32)
        del live

    vlogits, _ = verify_step_slots(params, cfg, toks, pos, cache_v,
                                   compute_dtype=jnp.float32)

    # sequential oracle: feed the same tokens one at a time
    slogits = []
    for j in range(c):
        emb = params["tok_embeddings"][toks[:, j]].astype(jnp.float32)
        lg, cache_s = _decode_step_slots(params, cfg, emb, pos + j, cache_s,
                                         compute_dtype=jnp.float32)
        slogits.append(lg)
    slogits = jnp.stack(slogits, axis=1)  # [B, C, V]
    np.testing.assert_allclose(np.asarray(vlogits), np.asarray(slogits),
                               atol=2e-4, rtol=2e-4)


@pytest.mark.slow
def test_self_draft_stochastic_accepts_everything():
    """With draft == target, q == p at every slot, so even STOCHASTIC
    acceptance (u < p/q) never rejects — this requires the draft cache to
    be complete after all-accept rounds (the k+1-th draft step consumes
    x_k; without it the draft attends a never-written zero row at the
    next round and q drifts from p)."""
    cfg, params = _tiny(0)
    k, max_new = 3, 32
    _, rounds = generate_speculative(
        params, params, jax.random.PRNGKey(9), jnp.asarray([1, 2]),
        cfg=cfg, draft_cfg=cfg, max_new_tokens=max_new, k=k,
        cfg_scale=2.0, temperature=1.0, sample_logits=True,
        compute_dtype=jnp.float32)
    assert int(rounds) == -(-(max_new - 1) // (k + 1))


@pytest.mark.slow
def test_force_accept_harness_round_count():
    """The bench harness knob commits exactly force_accept+1 per round."""
    cfg, params = _tiny(0)
    _, draft_params = _tiny(1)
    labels = jnp.asarray([1])
    k, max_new = 3, 25
    for force in (0, 2, k):
        _, rounds = generate_speculative(
            params, draft_params, jax.random.PRNGKey(0), labels, cfg=cfg,
            draft_cfg=cfg, max_new_tokens=max_new, k=k, cfg_scale=2.0,
            compute_dtype=jnp.float32, force_accept=force)
        per_round = min(force, k) + 1
        assert int(rounds) == -(-(max_new - 1) // per_round)


def test_spec_accept_preserves_target_distribution():
    """One accept/resample step must draw exactly from p, for proposals
    drawn from an arbitrary q (the core spec-sampling theorem)."""
    v = 8
    key = jax.random.PRNGKey(0)
    q_logits = jax.random.normal(jax.random.fold_in(key, 1), (v,)) * 2.0
    p_logits = jax.random.normal(jax.random.fold_in(key, 2), (v,)) * 2.0
    q = jax.nn.softmax(q_logits)
    p = jax.nn.softmax(p_logits)

    n = 200_000

    def one(rng):
        r_prop, r_acc = jax.random.split(rng)
        prop = jax.random.categorical(r_prop, q_logits)[None, None]  # [1,1]
        tokens, n_new = spec_accept(
            r_acc, prop, q[None, None], jnp.stack([p, p])[None],
            sample_logits=True)
        return tokens[0, 0]

    toks = jax.vmap(one)(jax.random.split(jax.random.PRNGKey(42), n))
    emp = np.bincount(np.asarray(toks), minlength=v) / n
    np.testing.assert_allclose(emp, np.asarray(p), atol=5e-3)


def test_spec_accept_greedy_chain():
    """Greedy acceptance commits exactly the target argmax chain."""
    v, k = 6, 3
    p_probs = jnp.asarray(np.random.RandomState(0).rand(1, k + 1, v),
                          jnp.float32)
    tgt = np.argmax(np.asarray(p_probs), -1)[0]  # [k+1]
    # proposals agree on slots 0..1, disagree on slot 2
    props = jnp.asarray([[tgt[0], tgt[1], (tgt[2] + 1) % v]])
    q_probs = jnp.ones((1, k, v)) / v
    tokens, n_new = spec_accept(jax.random.PRNGKey(0), props, q_probs,
                                p_probs, sample_logits=False)
    assert int(n_new[0]) == 3  # 2 accepted + 1 corrected
    np.testing.assert_array_equal(np.asarray(tokens[0, :3]), tgt[:3])


def test_warped_probs_matches_sampler_filters():
    logits = jnp.asarray(np.random.RandomState(1).randn(4, 32) * 3,
                         jnp.float32)
    p = warped_probs(logits, temperature=0.8, top_k=5, top_p=0.9)
    a = np.asarray(p)
    np.testing.assert_allclose(a.sum(-1), 1.0, atol=1e-5)
    assert ((a > 0).sum(-1) <= 5).all()  # top-k warp really applied


@pytest.mark.slow
def test_t2i_prefix_pad_path():
    cfg, params = _tiny(0, model_type="t2i", cls_token_num=8,
                        caption_dim=32)
    _, draft_params = _tiny(1, model_type="t2i", cls_token_num=8,
                            caption_dim=32)
    b, t = 2, 8
    caps = jnp.asarray(np.random.RandomState(0).randn(b, t, 32),
                       jnp.float32)
    # left-padded validity: first row 5 valid tokens, second full
    masks = jnp.asarray([[0, 0, 0, 1, 1, 1, 1, 1],
                         [1, 1, 1, 1, 1, 1, 1, 1]], bool)
    ref = generate(params, jax.random.PRNGKey(2), caps, cfg=cfg,
                   max_new_tokens=12, emb_masks=masks, cfg_scale=2.0,
                   sample_logits=False, compute_dtype=jnp.float32,
                   use_kernel=False)
    got, _ = generate_speculative(
        params, draft_params, jax.random.PRNGKey(2), caps, cfg=cfg,
        draft_cfg=cfg, max_new_tokens=12, k=2, emb_masks=masks,
        cfg_scale=2.0, sample_logits=False, compute_dtype=jnp.float32)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
