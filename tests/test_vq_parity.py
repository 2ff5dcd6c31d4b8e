"""Golden-parity tests: our VQ-VAE vs the reference torch implementation.

The reference repo (read-only, /root/reference) is imported as a test oracle:
we instantiate its torch VQModel with random weights, convert the state dict
with our converter, and require token-id bit-parity + tight reconstruction
agreement. This validates every numeric detail (GroupNorm eps, swish,
asymmetric downsample padding, attention scaling, L2-normalized codebook
argmin) without needing released checkpoints.
"""

import numpy as np
import pytest

import conftest

torch = pytest.importorskip("torch")
conftest.add_reference_to_path()

import jax
import jax.numpy as jnp

from llamagen_tpu.config import vq_config
from llamagen_tpu.models import vq
from llamagen_tpu.utils.convert import convert_vq


@pytest.fixture(scope="module")
def ref_and_ours():
    from tokenizer.tokenizer_image.vq_model import VQ_models  # reference oracle

    torch.manual_seed(0)
    ref = VQ_models["VQ-16"]()
    ref.eval()
    cfg = vq_config("VQ-16")
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = convert_vq(sd, cfg)
    return ref, params, cfg


def _rand_image(batch=2, size=64, seed=42):
    rng = np.random.RandomState(seed)
    return rng.uniform(-1, 1, size=(batch, size, size, 3)).astype(np.float32)


def test_encode_token_parity(ref_and_ours):
    ref, params, cfg = ref_and_ours
    x = _rand_image()
    with torch.no_grad():
        _, _, (_, _, ref_idx) = ref.encode(torch.from_numpy(x).permute(0, 3, 1, 2))
    _, _, idx = vq.encode(params, jnp.asarray(x), cfg)
    grid = x.shape[1] // cfg.downsample_factor
    ref_idx = ref_idx.numpy().reshape(x.shape[0], grid, grid)
    assert idx.shape == (x.shape[0], grid, grid)
    match = (np.asarray(idx) == ref_idx).mean()
    assert match == 1.0, f"token-id parity {match:.4f} != 1.0"


def test_encoder_features_close(ref_and_ours):
    ref, params, cfg = ref_and_ours
    x = _rand_image(batch=1)
    with torch.no_grad():
        ref_h = ref.quant_conv(ref.encoder(torch.from_numpy(x).permute(0, 3, 1, 2)))
    h = vq.encoder_apply(params["encoder"], jnp.asarray(x), cfg)
    h = vq.conv2d(params["quant_conv"], h)
    ref_h = np.transpose(ref_h.numpy(), (0, 2, 3, 1))
    np.testing.assert_allclose(np.asarray(h), ref_h, atol=2e-4, rtol=1e-3)


def test_decode_code_parity(ref_and_ours):
    ref, params, cfg = ref_and_ours
    rng = np.random.RandomState(7)
    idx = rng.randint(0, cfg.codebook_size, size=(2, 4, 4)).astype(np.int32)
    with torch.no_grad():
        ref_img = ref.decode_code(
            torch.from_numpy(idx.reshape(2, -1)).long(),
            shape=(2, cfg.codebook_embed_dim, 4, 4))
    img = vq.decode_code(params, jnp.asarray(idx), cfg)
    ref_img = np.transpose(ref_img.numpy(), (0, 2, 3, 1))
    np.testing.assert_allclose(np.asarray(img), ref_img, atol=2e-4, rtol=1e-3)


def test_roundtrip_reconstruction_close(ref_and_ours):
    ref, params, cfg = ref_and_ours
    x = _rand_image(batch=1)
    with torch.no_grad():
        ref_rec, _ = ref(torch.from_numpy(x).permute(0, 3, 1, 2))
    rec, _, _ = vq.forward(params, jnp.asarray(x), cfg, train=False)
    ref_rec = np.transpose(ref_rec.numpy(), (0, 2, 3, 1))
    np.testing.assert_allclose(np.asarray(rec), ref_rec, atol=5e-4, rtol=1e-3)


def test_vq8_token_parity():
    from tokenizer.tokenizer_image.vq_model import VQ_models

    torch.manual_seed(3)
    ref = VQ_models["VQ-8"]()
    ref.eval()
    cfg = vq_config("VQ-8")
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = convert_vq(sd, cfg)
    x = _rand_image(batch=1, size=32, seed=5)
    with torch.no_grad():
        _, _, (_, _, ref_idx) = ref.encode(torch.from_numpy(x).permute(0, 3, 1, 2))
    _, _, idx = vq.encode(params, jnp.asarray(x), cfg)
    assert (np.asarray(idx).ravel() == ref_idx.numpy().ravel()).all()


def test_quantize_losses_match_reference_formulas(ref_and_ours):
    _, params, cfg = ref_and_ours
    rng = np.random.RandomState(0)
    z = jnp.asarray(rng.randn(1, 4, 4, cfg.codebook_embed_dim).astype(np.float32))
    z_q, losses, idx = vq.quantize(params["quantize"], z, cfg, train=True)
    # straight-through: z_q forward value equals codebook entries of idx
    expected = vq.codebook_lookup(params["quantize"], idx, cfg)
    np.testing.assert_allclose(np.asarray(z_q), np.asarray(expected), atol=1e-6)
    assert float(losses["vq"]) >= 0 and float(losses["commit"]) >= 0
