"""SD-VAE (AutoencoderKL) JAX implementation + converter oracle tests.

Oracle: the reference's own LDM conv backbone
(`/root/reference/tokenizer/vqgan/layer.py` Encoder/Decoder with
double_z=True, attn_resolutions=[]) IS the SD-VAE architecture — the
diffusers AutoencoderKL the reference rig loads
(`tokenizer/vae/reconstruction_vae_ddp.py:19`) is the same graph with
renamed keys. We parity-test our klvae against a torch model built from
those reference modules, and the diffusers key layout against the LDM
one."""

import numpy as np
import pytest

import conftest

torch = pytest.importorskip("torch")
conftest.add_reference_to_path()

import jax
import jax.numpy as jnp

from llamagen_tpu.models import klvae
from llamagen_tpu.utils.convert import convert_sd_vae

CFG = klvae.KLVAEConfig(ch=32, ch_mult=(1, 2, 4), num_res_blocks=2,
                        z_channels=8, embed_dim=4)


def _torch_vae(cfg):
    from tokenizer.vqgan.layer import Encoder, Decoder

    class KL(torch.nn.Module):
        def __init__(self):
            super().__init__()
            dd = dict(ch=cfg.ch, out_ch=3, ch_mult=list(cfg.ch_mult),
                      num_res_blocks=cfg.num_res_blocks,
                      attn_resolutions=[], dropout=0.0, in_channels=3,
                      resolution=32, z_channels=cfg.z_channels)
            self.encoder = Encoder(double_z=True, **dd)
            self.decoder = Decoder(**dd)
            self.quant_conv = torch.nn.Conv2d(2 * cfg.z_channels,
                                              2 * cfg.embed_dim, 1)
            self.post_quant_conv = torch.nn.Conv2d(cfg.embed_dim,
                                                   cfg.z_channels, 1)

        def forward(self, x):
            moments = self.quant_conv(self.encoder(x))
            mean, logvar = torch.chunk(moments, 2, dim=1)
            return self.decoder(self.post_quant_conv(mean)), mean, logvar

    torch.manual_seed(0)
    m = KL()
    m.eval()
    return m


@pytest.fixture(scope="module")
def ref_and_ours():
    ref = _torch_vae(CFG)
    params = jax.tree.map(jnp.asarray, convert_sd_vae(
        {k: v.detach().numpy() for k, v in ref.state_dict().items()}, CFG))
    return ref, params


def test_klvae_roundtrip_parity(ref_and_ours):
    """Mean-latent roundtrip matches the torch oracle."""
    ref, params = ref_and_ours
    rng = np.random.RandomState(0)
    x = rng.rand(2, 32, 32, 3).astype(np.float32) * 2 - 1
    with torch.no_grad():
        want, mean_t, logvar_t = ref(torch.from_numpy(x).permute(0, 3, 1, 2))
    mean, logvar = klvae.encode(params, jnp.asarray(x), CFG)
    np.testing.assert_allclose(np.asarray(mean),
                               mean_t.permute(0, 2, 3, 1).numpy(),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(logvar),
                               logvar_t.permute(0, 2, 3, 1).numpy(),
                               rtol=2e-4, atol=2e-4)
    got = klvae.roundtrip(params, jnp.asarray(x), CFG)
    np.testing.assert_allclose(np.asarray(got),
                               want.permute(0, 2, 3, 1).numpy(),
                               rtol=2e-3, atol=2e-3)


def test_klvae_sampling_shapes(ref_and_ours):
    _, params = ref_and_ours
    x = jnp.zeros((1, 32, 32, 3))
    out = klvae.roundtrip(params, x, CFG, rng=jax.random.PRNGKey(0))
    assert out.shape == (1, 32, 32, 3)
    f = CFG.downsample_factor
    mean, logvar = klvae.encode(params, x, CFG)
    assert mean.shape == (1, 32 // f, 32 // f, CFG.embed_dim)
    assert float(jnp.max(logvar)) <= 20.0


def test_diffusers_layout_equivalent(ref_and_ours):
    """The diffusers AutoencoderKL key layout converts to identical
    params as the LDM layout (level reversal, conv_shortcut naming,
    Linear attention projections)."""
    ref, params_ldm = ref_and_ours
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    nlev = len(CFG.ch_mult)
    out = {}
    for k, v in sd.items():
        nk = k
        nk = nk.replace("mid.block_1.", "mid_block.resnets.0.")
        nk = nk.replace("mid.block_2.", "mid_block.resnets.1.")
        for a, b in (("norm", "group_norm"), ("q", "to_q"), ("k", "to_k"),
                     ("v", "to_v"), ("proj_out", "to_out.0")):
            nk = nk.replace(f"mid.attn_1.{a}.", f"mid_block.attentions.0.{b}.")
        nk = nk.replace("norm_out.", "conv_norm_out.")
        nk = nk.replace(".nin_shortcut.", ".conv_shortcut.")
        import re
        m = re.match(r"encoder\.down\.(\d+)\.block\.(\d+)\.(.*)", nk)
        if m:
            nk = (f"encoder.down_blocks.{m.group(1)}.resnets."
                  f"{m.group(2)}.{m.group(3)}")
        m = re.match(r"encoder\.down\.(\d+)\.downsample\.conv\.(.*)", nk)
        if m:
            nk = (f"encoder.down_blocks.{m.group(1)}.downsamplers.0."
                  f"conv.{m.group(2)}")
        m = re.match(r"decoder\.up\.(\d+)\.block\.(\d+)\.(.*)", nk)
        if m:
            nk = (f"decoder.up_blocks.{nlev - 1 - int(m.group(1))}."
                  f"resnets.{m.group(2)}.{m.group(3)}")
        m = re.match(r"decoder\.up\.(\d+)\.upsample\.conv\.(.*)", nk)
        if m:
            nk = (f"decoder.up_blocks.{nlev - 1 - int(m.group(1))}."
                  f"upsamplers.0.conv.{m.group(2)}")
        # diffusers attention projections are Linear [C, C], not 1x1 conv
        if "attentions.0.to_" in nk and v.ndim == 4:
            v = v[:, :, 0, 0]
        out[nk] = v
    params_diff = convert_sd_vae(out, CFG)
    for a, b in zip(jax.tree.leaves(params_ldm),
                    jax.tree.leaves(params_diff)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_reconstruction_baseline_cli_sd_vae(ref_and_ours, tmp_path):
    """The rig CLI runs the JAX SD-VAE backend end to end."""
    ref, _ = ref_and_ours
    from PIL import Image

    ckpt = tmp_path / "sd_vae.ckpt"
    torch.save({"state_dict": ref.state_dict()}, str(ckpt))
    data = tmp_path / "val" / "cls"
    data.mkdir(parents=True)
    rng = np.random.RandomState(0)
    for i in range(2):
        Image.fromarray(rng.randint(0, 255, (40, 40, 3), np.uint8)).save(
            data / f"{i}.png")
    from llamagen_tpu.cli import reconstruction_baseline as rb
    rb.main(["--backend", "sd-vae", "--ckpt", str(ckpt),
             "--data-path", str(tmp_path / "val"), "--image-size", "32",
             "--batch-size", "2", "--max-images", "2",
             "--vae-config", '{"ch": 32, "ch_mult": [1, 2, 4], '
             '"z_channels": 8, "embed_dim": 4}'])
