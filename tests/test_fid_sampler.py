"""Multi-chip FID sampler: sharded sampling reproduces single-device
token streams (block-keyed rng; VERDICT round-1 item 8)."""

import numpy as np

import conftest  # noqa: F401

import pytest as _pytest

pytestmark = _pytest.mark.slow  # engine/e2e tier (pyproject markers)

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from llamagen_tpu.cli.sample_c2i_fid import (block_key, block_labels,
                                             make_sharded_sampler)
from llamagen_tpu.config import GPTConfig, vq_config
from llamagen_tpu.models import gpt, vq
from llamagen_tpu.ops.generate import generate

import dataclasses


def test_sharded_blocks_match_single_device():
    gpt_cfg = GPTConfig(dim=64, n_layer=2, n_head=4, block_size=16,
                        num_classes=10, vocab_size=64, cls_token_num=1)
    vq_cfg = dataclasses.replace(
        vq_config("VQ-8", codebook_size=64, codebook_embed_dim=4),
        ch=32, z_channels=32)
    params = gpt.init_params(jax.random.PRNGKey(0), gpt_cfg,
                             dtype=jnp.float32)
    params["output"] = jax.random.normal(
        jax.random.PRNGKey(1), params["output"].shape) * 0.02
    vq_params = vq.init_params(jax.random.PRNGKey(2), vq_cfg,
                               dtype=jnp.float32)

    bs, latent, seed = 2, 4, 0
    ndev = len(jax.devices())
    assert ndev == 8
    mesh = Mesh(np.array(jax.devices()), ("dp",))
    gen_kw = dict(cfg_scale=1.5, temperature=1.0, top_k=0, top_p=1.0,
                  cache_dtype=jnp.float32)

    sampler = make_sharded_sampler(params, gpt_cfg, vq_params, vq_cfg,
                                   mesh, bs, latent, gen_kw, jnp.float32)
    blocks = list(range(ndev))
    keys = np.stack([np.asarray(jax.random.key_data(block_key(seed, b)))
                     for b in blocks])
    labels = np.concatenate([
        block_labels(seed, b, bs, gpt_cfg.num_classes) for b in blocks])
    seq_sharded, imgs_sharded = sampler(jnp.asarray(keys),
                                        jnp.asarray(labels))
    seq_sharded = np.asarray(seq_sharded)

    # single-device reference: same blocks processed sequentially
    for d, b in enumerate(blocks):
        lab = jnp.asarray(block_labels(seed, b, bs, gpt_cfg.num_classes))
        ref = generate(params, block_key(seed, b), lab, cfg=gpt_cfg,
                       max_new_tokens=latent * latent,
                       compute_dtype=jnp.float32, **gen_kw)
        np.testing.assert_array_equal(seq_sharded[d * bs:(d + 1) * bs],
                                      np.asarray(ref),
                                      err_msg=f"block {b}")

    assert np.asarray(imgs_sharded).shape == (ndev * bs, 32, 32, 3)
