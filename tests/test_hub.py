"""Hub-layout persistence roundtrip (vq_model_hf / gpt_hf equivalents)."""

import numpy as np

import pytest

import conftest  # noqa: F401

import jax
import jax.numpy as jnp

from llamagen_tpu.config import GPTConfig, vq_config
from llamagen_tpu.models import gpt, vq
from llamagen_tpu.utils import hub


@pytest.mark.slow
def test_gpt_hub_roundtrip(tmp_path):
    cfg = GPTConfig(dim=64, n_layer=2, n_head=4, block_size=16,
                    num_classes=10, vocab_size=128, cls_token_num=1)
    params = gpt.init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    d = hub.save_pretrained(str(tmp_path / "gpt"), params, cfg,
                            model_kind="gpt")
    params2, cfg2 = hub.load_pretrained(d)
    assert cfg2 == cfg
    rng = np.random.RandomState(0)
    labels = jnp.asarray(rng.randint(0, 10, size=(2,)))
    tokens = jnp.asarray(rng.randint(0, 128, size=(2, 16)))
    l1, _ = gpt.forward_train(params, cfg, labels, tokens[:, :-1],
                              train=False, compute_dtype=jnp.float32)
    l2, _ = gpt.forward_train(params2, cfg2, labels, tokens[:, :-1],
                              train=False, compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), atol=1e-6)


@pytest.mark.slow
def test_vq_hub_roundtrip(tmp_path):
    import dataclasses

    cfg = dataclasses.replace(
        vq_config("VQ-8", codebook_size=64, codebook_embed_dim=4),
        ch=32, z_channels=32)
    params = vq.init_params(jax.random.PRNGKey(1), cfg, dtype=jnp.float32)
    d = hub.save_pretrained(str(tmp_path / "vq"), params, cfg,
                            model_kind="vq")
    params2, cfg2 = hub.load_pretrained(d)
    assert cfg2 == cfg
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.uniform(-1, 1, (2, 32, 32, 3)).astype(np.float32))
    t1 = np.asarray(vq.encode(params, x, cfg, train=False)[2])
    t2 = np.asarray(vq.encode(params2, x, cfg2, train=False)[2])
    np.testing.assert_array_equal(t1, t2)
