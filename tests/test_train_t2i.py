"""t2i trainer smoke test: online VQ encode + caption-conditioned loss."""

import dataclasses

import numpy as np

import conftest  # noqa: F401

import pytest as _pytest

pytestmark = _pytest.mark.slow  # engine/e2e tier (pyproject markers)

import jax
import jax.numpy as jnp

from llamagen_tpu.config import GPTConfig, vq_config
from llamagen_tpu.models import gpt, vq
from llamagen_tpu.train import t2i
from llamagen_tpu.train.train_state import init_train_state, make_optimizer


def test_t2i_train_step():
    vq_cfg = dataclasses.replace(
        vq_config("VQ-8", codebook_size=64, codebook_embed_dim=4),
        ch=32, z_channels=32)
    gpt_cfg = GPTConfig(dim=64, n_layer=2, n_head=4, block_size=16,
                        vocab_size=64, caption_dim=32, cls_token_num=6,
                        model_type="t2i")
    vq_params = vq.init_params(jax.random.PRNGKey(0), vq_cfg)
    gpt_params = gpt.init_params(jax.random.PRNGKey(1), gpt_cfg)
    tx = make_optimizer(lr=1e-3)
    state = init_train_state(gpt_params, tx, use_ema=True)
    step_fn = t2i.make_t2i_train_step(gpt_cfg, vq_cfg, tx, vq_params,
                                      compute_dtype=jnp.float32)

    rng = np.random.RandomState(0)
    b = 2
    img_size = 32  # VQ-8 -> 4x4 = 16 tokens = block_size
    batch = t2i.T2IBatch(
        images=jnp.asarray(rng.uniform(-1, 1, (b, img_size, img_size, 3))
                           .astype(np.float32)),
        captions=jnp.asarray(rng.randn(b, 6, 32).astype(np.float32)),
        emb_masks=jnp.asarray(np.ones((b, 6), np.int32)),
        valid=jnp.asarray(np.array([1.0, 1.0], np.float32)))

    losses = []
    for _ in range(3):
        state, metrics = step_fn(state, batch, jax.random.PRNGKey(2))
        losses.append(float(metrics["loss"]))
        assert np.isfinite(losses[-1])
    assert losses[-1] < losses[0]


def test_t2i_valid_mask_zeroes_bad_samples():
    vq_cfg = dataclasses.replace(
        vq_config("VQ-8", codebook_size=64, codebook_embed_dim=4),
        ch=32, z_channels=32)
    gpt_cfg = GPTConfig(dim=64, n_layer=2, n_head=4, block_size=16,
                        vocab_size=64, caption_dim=32, cls_token_num=6,
                        model_type="t2i", token_dropout_p=0.0,
                        resid_dropout_p=0.0, ffn_dropout_p=0.0,
                        class_dropout_prob=0.0)
    vq_params = vq.init_params(jax.random.PRNGKey(0), vq_cfg)
    gpt_params = gpt.init_params(jax.random.PRNGKey(1), gpt_cfg)
    rng = np.random.RandomState(0)
    imgs = rng.uniform(-1, 1, (2, 32, 32, 3)).astype(np.float32)
    caps = rng.randn(2, 6, 32).astype(np.float32)
    masks = np.ones((2, 6), np.int32)

    batch_full = t2i.T2IBatch(jnp.asarray(imgs), jnp.asarray(caps),
                              jnp.asarray(masks),
                              valid=jnp.asarray(np.array([1., 0.], np.float32)))
    batch_first = t2i.T2IBatch(jnp.asarray(imgs[:1]), jnp.asarray(caps[:1]),
                               jnp.asarray(masks[:1]))
    l_masked = t2i.t2i_loss_fn(gpt_params, vq_params, gpt_cfg, vq_cfg,
                               batch_full, None, jnp.float32, False)
    l_first = t2i.t2i_loss_fn(gpt_params, vq_params, gpt_cfg, vq_cfg,
                              batch_first, None, jnp.float32, False)
    np.testing.assert_allclose(float(l_masked), float(l_first), rtol=1e-5)


def test_t2i_dataset_retry_resamples(tmp_path):
    """openimage-style retry (ref dataset/openimage.py:24-30): a missing
    image resamples another index instead of yielding dummy/valid=0."""
    import json
    import os

    from PIL import Image

    from llamagen_tpu.data.t2i import T2IDataset

    feat = tmp_path / "t5"
    feat.mkdir()
    rng = np.random.RandomState(0)
    rows = []
    for i in range(4):
        path = str(tmp_path / f"img{i}.png")
        if i != 1:  # index 1: missing image
            Image.fromarray(rng.randint(0, 255, (40, 40, 3), dtype=np.uint8)
                            ).save(path)
        np.savez(str(feat / f"{i}.npz"),
                 feature=rng.randn(4, 8).astype(np.float16),
                 mask=np.ones(4, np.int32))
        rows.append({"image_path": path, "caption_idx": i})
    jsonl = str(tmp_path / "items.jsonl")
    with open(jsonl, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")

    # no retries: dummy with valid=0
    ds0 = T2IDataset(jsonl, str(feat), 32, caption_dim=8, t5_len=4)
    assert ds0[1][3] == 0.0
    # retries: a real sample (valid=1) comes back
    ds = T2IDataset(jsonl, str(feat), 32, caption_dim=8, t5_len=4,
                    retries=20)
    img, f, m, valid = ds[1]
    assert valid == 1.0 and img.shape == (32, 32, 3)
