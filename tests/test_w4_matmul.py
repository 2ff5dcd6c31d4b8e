"""W4A16 Pallas dequant-matmul kernel tests (interpret mode on CPU)."""

import numpy as np
import pytest

import conftest  # noqa: F401

import jax
import jax.numpy as jnp


def _host_dequant(blocks, scales, k, n):
    """Independent numpy dequant of the pack_w4 layout."""
    from llamagen_tpu.ops.w4_matmul import _segments

    nb, k2, bn = blocks.shape
    pk = np.asarray(blocks)
    lo = (pk << 4).astype(np.int8) >> 4
    hi = pk >> 4
    q = np.concatenate([lo, hi], axis=1)            # [NB, K, BN]
    sc = np.asarray(scales)
    if sc.shape[-2] == 1:
        qs = q * sc
    else:
        segs = _segments(k2)
        reps = np.concatenate([np.full(rl, h * len(segs) + g)
                               for h in range(2)
                               for g, (r0, rl) in enumerate(segs)])
        qs = q * sc[:, reps, :]
    return np.moveaxis(qs, 0, 1).reshape(k, n)


@pytest.mark.parametrize("per_channel", [False, True])
def test_pack_roundtrip_error_bounded(per_channel):
    from llamagen_tpu.ops.w4_matmul import pack_w4

    rng = np.random.RandomState(0)
    w = (rng.randn(256, 384) * 0.05).astype(np.float32)
    blocks, scales = pack_w4(jnp.asarray(w), per_channel=per_channel,
                             block_n=128)
    deq = _host_dequant(blocks, scales, 256, 384)
    err = np.abs(deq - w)
    assert err.max() <= np.asarray(scales).max() * 0.5 + 1e-7


@pytest.mark.parametrize("per_channel", [False, True])
def test_w4_matmul_matches_dequant(per_channel):
    from llamagen_tpu.ops.w4_matmul import pack_w4, w4_matmul

    rng = np.random.RandomState(1)
    # ragged half: K2 = 192 = 128 + 64 exercises the tail segment
    k, n = 384, 512
    w = (rng.randn(k, n) * 0.03).astype(np.float32)
    x = rng.randn(8, k).astype(np.float32)
    blocks, scales = pack_w4(jnp.asarray(w), per_channel=per_channel,
                             block_n=128)
    got = np.asarray(jax.jit(w4_matmul)(
        jnp.asarray(x, jnp.bfloat16), blocks, scales)).astype(np.float32)
    ref = x @ _host_dequant(blocks, scales, k, n)
    # bf16 activations + bf16 weight operands, f32 accumulation
    tol = np.abs(ref).max() * 2e-2 + 1e-3
    assert np.abs(got - ref).max() < tol, np.abs(got - ref).max()


def test_w4_matmul_fold_mode_matches_dequant():
    """The bf16 scale-fold grouped formulation must agree with the host
    dequant within bf16 rounding (scales fold into weight rows instead of
    the [B, BN] partials)."""
    from llamagen_tpu.ops import w4_matmul as m

    rng = np.random.RandomState(3)
    k, n = 384, 512
    w = (rng.randn(k, n) * 0.03).astype(np.float32)
    x = rng.randn(8, k).astype(np.float32)
    blocks, scales = m.pack_w4(jnp.asarray(w), block_n=128)
    ref = x @ _host_dequant(blocks, scales, k, n)
    old = m.GROUPED_MODE
    try:
        m.GROUPED_MODE = "fold"
        got = np.asarray(jax.jit(m.w4_matmul)(
            jnp.asarray(x, jnp.bfloat16), blocks, scales)).astype(np.float32)
    finally:
        m.GROUPED_MODE = old
    tol = np.abs(ref).max() * 2e-2 + 1e-3
    assert np.abs(got - ref).max() < tol, np.abs(got - ref).max()


def test_w4_xla_dequant_matches_host():
    from llamagen_tpu.ops.w4_matmul import pack_w4, w4_dequant

    rng = np.random.RandomState(2)
    w = (rng.randn(256, 256) * 0.1).astype(np.float32)
    for per_channel in (False, True):
        blocks, scales = pack_w4(jnp.asarray(w), per_channel=per_channel,
                                 block_n=128)
        got = np.asarray(jax.jit(w4_dequant)(blocks, scales))
        ref = _host_dequant(blocks, scales, 256, 256)
        np.testing.assert_allclose(got, ref, atol=1e-5)


def test_w4k_rejected_on_tp_path():
    """TP decode must refuse W4-kernel params loudly (per-shard repacking
    is unimplemented and N/tp is not 128-aligned for every zoo size)."""
    from llamagen_tpu.config import GPTConfig
    from llamagen_tpu.models import gpt
    from llamagen_tpu.ops.w4_matmul import quantize_gpt_params_w4k
    from llamagen_tpu.parallel.mesh import make_mesh
    from llamagen_tpu.parallel.tp_decode import shard_tp_params

    cfg = GPTConfig(dim=256, n_layer=1, n_head=2, block_size=16,
                    num_classes=10, vocab_size=128, cls_token_num=1)
    qp = quantize_gpt_params_w4k(
        gpt.init_params(jax.random.PRNGKey(0), cfg))
    mesh = make_mesh(1, 1, 2, devices=jax.devices()[:2])
    with pytest.raises(NotImplementedError, match="W4-kernel"):
        shard_tp_params(qp, cfg, mesh)


@pytest.mark.slow
def test_w4k_engine_matches_generate_greedy():
    """The serving engine's slot path must route W4-kernel params through
    the same dispatch as generate(): identical quantized weights ->
    identical greedy trajectories."""
    from llamagen_tpu.config import GPTConfig
    from llamagen_tpu.models import gpt
    from llamagen_tpu.ops.generate import generate
    from llamagen_tpu.ops.w4_matmul import quantize_gpt_params_w4k
    from llamagen_tpu.serve.engine import SamplingParams, ServeEngine

    cfg = GPTConfig(dim=128, n_layer=2, n_head=2, block_size=16,
                    num_classes=10, vocab_size=128, cls_token_num=1)
    params = gpt.init_params(jax.random.PRNGKey(0), cfg)
    params = dict(params)
    params["output"] = jax.random.normal(
        jax.random.PRNGKey(1), params["output"].shape) * 0.02
    qp = quantize_gpt_params_w4k(params)

    labels = [3, 7]
    eng = ServeEngine(qp, cfg, num_pairs=2, max_new_tokens=cfg.block_size,
                      sampling_params=SamplingParams(cfg_scale=2.0,
                                                     temperature=1e-6),
                      chunk=4, compute_dtype=jnp.float32)
    out = eng.generate(labels)
    ref = generate(qp, jax.random.PRNGKey(0), jnp.asarray(labels),
                   cfg=cfg, max_new_tokens=cfg.block_size, cfg_scale=2.0,
                   sample_logits=False, compute_dtype=jnp.float32,
                   cache_dtype=jnp.float32)
    np.testing.assert_array_equal(out, np.asarray(ref))


def test_w4k_gpt_generates_and_tracks_bf16():
    """quantize_gpt_params_w4k end to end through the decode scan: the
    kernel path must produce logits tracking bf16 (correlation bar — int4
    RTN is lossy; see BENCH.md) and run the generate() dispatch."""
    from llamagen_tpu.config import GPTConfig
    from llamagen_tpu.models import gpt
    from llamagen_tpu.ops.generate import generate
    from llamagen_tpu.ops.w4_matmul import quantize_gpt_params_w4k

    cfg = GPTConfig(dim=256, n_layer=2, n_head=2, block_size=16,
                    num_classes=16, vocab_size=512, cls_token_num=1)
    params = gpt.init_params(jax.random.PRNGKey(2), cfg, dtype=jnp.float32)
    params = dict(params)
    params["output"] = jax.random.normal(
        jax.random.PRNGKey(5), params["output"].shape) * 0.1

    rng = np.random.RandomState(7)
    labels = jnp.asarray(rng.randint(0, 16, size=(2,)))
    tokens = jnp.asarray(rng.randint(0, 512, size=(2, 16)))
    logits, _ = gpt.forward_train(params, cfg, labels, tokens[:, :-1],
                                  train=False, compute_dtype=jnp.float32)
    for per_channel in (False, True):
        qp = quantize_gpt_params_w4k(params, per_channel=per_channel)
        qlogits, _ = gpt.forward_train(qp, cfg, labels, tokens[:, :-1],
                                       train=False,
                                       compute_dtype=jnp.float32)
        r = np.corrcoef(np.asarray(logits).ravel(),
                        np.asarray(qlogits).ravel())[0, 1]
        assert r > 0.95, f"per_channel={per_channel}: corr {r:.4f}"

        seq = np.asarray(generate(
            qp, jax.random.PRNGKey(0), labels, cfg=cfg,
            max_new_tokens=cfg.block_size, cfg_scale=2.0, temperature=0.0,
            compute_dtype=jnp.float32, cache_dtype=jnp.float32))
        assert seq.shape == (2, cfg.block_size)
