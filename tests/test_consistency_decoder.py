"""Consistency decoder: JAX U-Net + converter oracle + sampler checks.

The oracle is an in-repo torch mirror of the openai ConvUNetVAE layout
(the reference compares through diffusers' ConsistencyDecoderVAE —
`/root/reference/tokenizer/consistencydecoder/reconstruction_cd_ddp.py`);
it pins the conversion math (key mapping, conv/linear transposes,
scale-shift conditioning order, skip-pop order)."""

import math

import numpy as np
import pytest

import conftest  # noqa: F401

import pytest as _pytest

pytestmark = _pytest.mark.slow  # engine/e2e tier (pyproject markers)

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from llamagen_tpu.models import consistency_decoder as cd
from llamagen_tpu.utils.convert import convert_consistency_decoder

CFG = cd.CDConfig(in_channels=7, base_ch=32, ch_mult=(1, 2, 4),
                  layers_per_block=2, time_embed_dim=64, n_timesteps=64,
                  latent_scale=4)


class _Res(torch.nn.Module):
    def __init__(self, cin, cout, temb):
        super().__init__()
        self.f_t = torch.nn.Linear(temb, 2 * cout)
        self.gn_1 = torch.nn.GroupNorm(32 if cin % 32 == 0 else 8, cin)
        self.f_1 = torch.nn.Conv2d(cin, cout, 3, padding=1)
        self.gn_2 = torch.nn.GroupNorm(32 if cout % 32 == 0 else 8, cout)
        self.f_2 = torch.nn.Conv2d(cout, cout, 3, padding=1)
        if cin != cout:
            self.f_s = torch.nn.Conv2d(cin, cout, 1)

    def forward(self, x, t):
        skip = self.f_s(x) if hasattr(self, "f_s") else x
        tt = self.f_t(torch.nn.functional.silu(t))
        t_s, t_b = tt.chunk(2, dim=-1)
        h = self.f_1(torch.nn.functional.silu(self.gn_1(x)))
        h = self.gn_2(h) * (1 + t_s[:, :, None, None]) + t_b[:, :, None, None]
        return self.f_2(torch.nn.functional.silu(h)) + skip


class _Sampler(torch.nn.Module):
    def __init__(self, c):
        super().__init__()
        self.f = torch.nn.Conv2d(c, c, 3, stride=2, padding=1)


class _Up(torch.nn.Module):
    def __init__(self, c):
        super().__init__()
        self.f = torch.nn.Conv2d(c, c, 3, padding=1)

    def forward(self, x):
        x = torch.nn.functional.interpolate(x, scale_factor=2,
                                            mode="nearest")
        return self.f(x)


class _Mirror(torch.nn.Module):
    """openai ConvUNetVAE-layout mirror at CFG geometry."""

    def __init__(self, cfg):
        super().__init__()
        chs = [cfg.base_ch * m for m in cfg.ch_mult]
        te = cfg.time_embed_dim

        class _EmbT(torch.nn.Module):
            def __init__(self):
                super().__init__()
                self.emb = torch.nn.Embedding(cfg.n_timesteps, cfg.base_ch)
                self.f_1 = torch.nn.Linear(cfg.base_ch, te)
                self.f_2 = torch.nn.Linear(te, te)

            def forward(self, t):
                return self.f_2(torch.nn.functional.silu(
                    self.f_1(self.emb(t))))

        class _EmbI(torch.nn.Module):
            def __init__(self):
                super().__init__()
                self.f = torch.nn.Conv2d(cfg.in_channels, chs[0], 3,
                                         padding=1)

        self.embed_time = _EmbT()
        self.embed_image = _EmbI()
        down = []
        cin = chs[0]
        for i, c in enumerate(chs):
            mods = []
            for _ in range(cfg.layers_per_block):
                mods.append(_Res(cin, c, te))
                cin = c
            if i != len(chs) - 1:
                mods.append(_Sampler(c))
            down.append(torch.nn.ModuleList(mods))
        self.down = torch.nn.ModuleList(down)
        self.mid = torch.nn.ModuleList([_Res(cin, cin, te),
                                        _Res(cin, cin, te)])
        up = []
        for i, c in reversed(list(enumerate(chs))):
            mods = []
            for j in range(cfg.layers_per_block + 1):
                skip_c = c if j < cfg.layers_per_block else (
                    chs[i - 1] if i > 0 else chs[0])
                mods.append(_Res(cin + skip_c, c, te))
                cin = c
            if i != 0:
                mods.append(_Up(c))
            up.append(torch.nn.ModuleList(mods))
        self.up = torch.nn.ModuleList(up)

        class _Out(torch.nn.Module):
            def __init__(self):
                super().__init__()
                self.gn = torch.nn.GroupNorm(32, chs[0])
                self.f = torch.nn.Conv2d(chs[0], 3, 3, padding=1)

        self.output = _Out()

    def forward(self, x, t):
        temb = self.embed_time(t)
        h = self.embed_image.f(x)
        skips = [h]
        for level in self.down:
            for m in level:
                if isinstance(m, _Res):
                    h = m(h, temb)
                    skips.append(h)
                else:
                    h = m.f(h)
                    skips.append(h)
        for m in self.mid:
            h = m(h, temb)
        for level in self.up:
            for m in level:
                if isinstance(m, _Res):
                    h = torch.cat([h, skips.pop()], dim=1)
                    h = m(h, temb)
                else:
                    h = m(h)
        assert not skips
        return self.output.f(torch.nn.functional.silu(self.output.gn(h)))


@pytest.fixture(scope="module")
def ref_and_ours():
    torch.manual_seed(0)
    ref = _Mirror(CFG)
    ref.eval()
    params = jax.tree.map(jnp.asarray, convert_consistency_decoder(
        {k: v.detach().numpy() for k, v in ref.state_dict().items()}, CFG))
    return ref, params


def test_unet_parity(ref_and_ours):
    """One U-Net forward matches the torch mirror (conversion math)."""
    ref, params = ref_and_ours
    rng = np.random.RandomState(0)
    x = rng.randn(2, 16, 16, CFG.in_channels).astype(np.float32)
    t = np.array([3, 40])
    with torch.no_grad():
        want = ref(torch.from_numpy(x).permute(0, 3, 1, 2),
                   torch.from_numpy(t))
    got = cd.unet_apply(params, jnp.asarray(x), jnp.asarray(t), CFG)
    np.testing.assert_allclose(np.asarray(got),
                               want.permute(0, 2, 3, 1).numpy(),
                               rtol=2e-4, atol=2e-4)


def test_init_params_matches_converter_structure(ref_and_ours):
    """init_params produces the exact pytree the converter produces."""
    _, params = ref_and_ours
    import dataclasses
    ours = cd.init_params(jax.random.PRNGKey(0), CFG)
    ta = jax.tree.structure(params)
    tb = jax.tree.structure(ours)
    assert ta == tb
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(ours)):
        assert a.shape == b.shape, (a.shape, b.shape)


def test_consistency_sampler_shapes_and_determinism():
    params = cd.init_params(jax.random.PRNGKey(1), CFG)
    lat = jnp.asarray(np.random.RandomState(0).randn(1, 4, 4, 4),
                      jnp.float32)
    out1 = cd.decode_latent(params, lat, CFG, jax.random.PRNGKey(2),
                            timesteps=(40, 20))
    out2 = cd.decode_latent(params, lat, CFG, jax.random.PRNGKey(2),
                            timesteps=(40, 20))
    assert out1.shape == (1, 16, 16, 3)
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))
    assert float(jnp.max(jnp.abs(out1))) <= 1.0  # clipped x0


def test_schedule_tables_consistency():
    tabs = cd.schedule_tables(CFG)
    sa = np.asarray(tabs["sqrt_acum"])
    s1 = np.asarray(tabs["sqrt_1m"])
    np.testing.assert_allclose(sa ** 2 + s1 ** 2, 1.0, atol=1e-5)
    # boundary behavior: at tiny t the consistency fn approaches identity
    assert float(tabs["c_skip"][0]) > 0.9
    assert abs(float(tabs["c_out"][0])) < 0.2
