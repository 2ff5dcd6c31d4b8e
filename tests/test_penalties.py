"""Sampling penalties: exact reference-sampler semantics + loop threading.

Oracle: a literal numpy transcription of the reference `_apply_penalties`
(`/root/reference/autoregressive/serve/sampler.py:205-226`).
"""

import numpy as np
import pytest

import conftest  # noqa: F401

import jax
import jax.numpy as jnp

from llamagen_tpu.ops import sampling


def _ref_apply_penalties(logits, output_tokens, presence, frequency,
                         repetition, vocab):
    """Literal reimplementation of sampler.py:205-226 in numpy."""
    b = logits.shape[0]
    counts = np.zeros((b, vocab), np.int64)
    for i, toks in enumerate(output_tokens):
        for t in toks:
            counts[i, t] += 1
    mask = counts > 0
    rep = np.where(mask, repetition, 1.0)
    out = np.where(logits > 0, logits / rep, logits * rep)
    out = out - frequency * counts
    out = out - presence * mask
    return out


def test_apply_penalties_matches_reference_formula():
    rng = np.random.RandomState(0)
    vocab, b = 64, 3
    logits = rng.randn(b, vocab).astype(np.float32) * 2
    outputs = [rng.randint(0, vocab, size=(20,)) for _ in range(b)]
    counts = np.zeros((b, vocab), np.int32)
    for i, toks in enumerate(outputs):
        for t in toks:
            counts[i, t] += 1

    got = np.asarray(sampling.apply_penalties(
        jnp.asarray(logits), jnp.asarray(counts),
        presence=0.5, frequency=0.25, repetition=1.3))
    ref = _ref_apply_penalties(logits, outputs, 0.5, 0.25, 1.3, vocab)
    np.testing.assert_allclose(got, ref, atol=1e-5, rtol=1e-5)


def test_update_output_counts():
    counts = jnp.zeros((2, 8), jnp.int32)
    counts = sampling.update_output_counts(counts, jnp.asarray([3, 3]))
    counts = sampling.update_output_counts(counts, jnp.asarray([3, 5]))
    got = np.asarray(counts)
    assert got[0, 3] == 2 and got[1, 3] == 1 and got[1, 5] == 1
    assert got.sum() == 4


def test_repetition_penalty_reduces_repeats_in_generate():
    from llamagen_tpu.config import GPTConfig
    from llamagen_tpu.models import gpt
    from llamagen_tpu.ops.generate import generate

    cfg = GPTConfig(dim=64, n_layer=2, n_head=4, block_size=36,
                    num_classes=10, vocab_size=32, cls_token_num=1)
    params = gpt.init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    params = dict(params)
    params["output"] = jax.random.normal(
        jax.random.PRNGKey(1), params["output"].shape) * 0.05
    labels = jnp.asarray(np.array([1, 2]))

    def uniq(rep):
        seq = np.asarray(generate(
            params, jax.random.PRNGKey(0), labels, cfg=cfg,
            max_new_tokens=36, cfg_scale=1.5, temperature=0.0,
            repetition_penalty=rep, compute_dtype=jnp.float32,
            cache_dtype=jnp.float32))
        return np.mean([len(set(row.tolist())) for row in seq])

    base = uniq(1.0)
    pen = uniq(5.0)  # strong penalty: greedy must diversify
    assert pen > base, (base, pen)


@pytest.mark.slow
def test_engine_penalties_match_generate():
    """Greedy engine with penalties equals generate() with penalties."""
    from llamagen_tpu.config import GPTConfig
    from llamagen_tpu.models import gpt
    from llamagen_tpu.ops.generate import generate
    from llamagen_tpu.serve.engine import SamplingParams, ServeEngine

    cfg = GPTConfig(dim=64, n_layer=2, n_head=4, block_size=16,
                    num_classes=10, vocab_size=64, cls_token_num=1)
    params = gpt.init_params(jax.random.PRNGKey(2), cfg, dtype=jnp.float32)
    params = dict(params)
    params["output"] = jax.random.normal(
        jax.random.PRNGKey(3), params["output"].shape) * 0.05
    sp = SamplingParams(cfg_scale=2.0, temperature=1e-6,
                        presence_penalty=0.4, frequency_penalty=0.2,
                        repetition_penalty=1.5)
    eng = ServeEngine(params, cfg, num_pairs=2, max_new_tokens=16,
                      sampling_params=sp, chunk=4,
                      compute_dtype=jnp.float32)
    out = eng.generate([3, 7])
    ref = generate(params, jax.random.PRNGKey(0), jnp.asarray([3, 7]),
                   cfg=cfg, max_new_tokens=16, cfg_scale=2.0,
                   sample_logits=False, presence_penalty=0.4,
                   frequency_penalty=0.2, repetition_penalty=1.5,
                   compute_dtype=jnp.float32, cache_dtype=jnp.float32)
    np.testing.assert_array_equal(out, np.asarray(ref))
