"""Taming-transformers VQGAN compatibility: converter + token parity."""

import numpy as np
import pytest

import conftest

torch = pytest.importorskip("torch")
pytest.importorskip("einops")
conftest.add_reference_to_path()

import jax.numpy as jnp

from llamagen_tpu.models import vq
from llamagen_tpu.utils.convert import convert_taming_vq, taming_vq_config


@pytest.fixture(scope="module")
def ref_and_ours():
    from tokenizer.vqgan.model import VQModel

    # vqgan_openimage_f8_256 geometry but tiny channel count for CPU speed
    ddconfig = dict(double_z=False, z_channels=32, resolution=32,
                    in_channels=3, out_ch=3, ch=32, ch_mult=[1, 2, 2, 4],
                    num_res_blocks=2, attn_resolutions=[4], dropout=0.0)
    torch.manual_seed(0)
    ref = VQModel(ddconfig, n_embed=256, embed_dim=16)
    ref.eval()
    import dataclasses
    cfg = dataclasses.replace(
        taming_vq_config("vqgan_openimage_f8_256"),
        codebook_size=256, codebook_embed_dim=16, z_channels=32, ch=32)
    params = convert_taming_vq(
        {k: v.detach().numpy() for k, v in ref.state_dict().items()}, cfg)
    return ref, params, cfg


def test_taming_encode_token_parity(ref_and_ours):
    ref, params, cfg = ref_and_ours
    rng = np.random.RandomState(0)
    x = rng.uniform(-1, 1, (2, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        _, _, (_, _, ref_idx) = ref.encode(
            torch.from_numpy(x).permute(0, 3, 1, 2))
    _, _, idx = vq.encode(params, jnp.asarray(x), cfg)
    assert (np.asarray(idx).ravel() == ref_idx.numpy().ravel()).all()


def test_taming_decode_parity(ref_and_ours):
    ref, params, cfg = ref_and_ours
    rng = np.random.RandomState(1)
    idx = rng.randint(0, 256, size=(1, 4, 4))
    with torch.no_grad():
        ref_img = ref.decode_code(
            torch.from_numpy(idx.reshape(1, -1)).long(),
            shape=(1, cfg.codebook_embed_dim, 4, 4))
    img = vq.decode_code(params, jnp.asarray(idx), cfg)
    np.testing.assert_allclose(
        np.asarray(img), np.transpose(ref_img.numpy(), (0, 2, 3, 1)),
        atol=3e-4, rtol=1e-3)
