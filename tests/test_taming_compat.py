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


def test_reconstruction_baseline_cli_taming(ref_and_ours, tmp_path):
    """Baseline comparison rig driven e2e with a taming checkpoint
    (SD-VAE/consistency backends share the loop, gated on diffusers)."""
    import json
    import os

    from PIL import Image

    from llamagen_tpu.cli import reconstruction_baseline

    ref, _, cfg = ref_and_ours
    ckpt = str(tmp_path / "taming.ckpt")
    torch.save({"state_dict": ref.state_dict()}, ckpt)

    data = tmp_path / "imgs" / "cls"
    data.mkdir(parents=True)
    rng = np.random.RandomState(0)
    for i in range(3):
        Image.fromarray(rng.randint(0, 255, (40, 40, 3), dtype=np.uint8)
                        ).save(str(data / f"{i}.png"))

    npz = str(tmp_path / "recon.npz")
    reconstruction_baseline.main([
        "--backend", "taming", "--ckpt", ckpt,
        "--taming-config", "vqgan_openimage_f8_256",
        "--taming-overrides", json.dumps(
            {"codebook_size": 256, "codebook_embed_dim": 16,
             "z_channels": 32, "ch": 32}),
        "--data-path", str(tmp_path / "imgs"), "--image-size", "32",
        "--batch-size", "2", "--npz-out", npz])
    assert os.path.exists(npz)
    arr = np.load(npz)["arr_0"]
    assert arr.shape == (3, 32, 32, 3)
