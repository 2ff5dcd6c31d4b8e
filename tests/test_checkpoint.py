"""Orbax checkpoint save/restore + converter CLI roundtrip."""

import numpy as np
import pytest

import conftest  # noqa: F401

import pytest as _pytest

pytestmark = _pytest.mark.slow  # engine/e2e tier (pyproject markers)

import jax
import jax.numpy as jnp

from llamagen_tpu.config import GPTConfig
from llamagen_tpu.models import gpt
from llamagen_tpu.train import c2i
from llamagen_tpu.utils import checkpoint


CFG = GPTConfig(dim=64, n_layer=2, n_head=4, block_size=16, num_classes=10,
                vocab_size=128, cls_token_num=1)


def test_params_roundtrip(tmp_path):
    params = gpt.init_params(jax.random.PRNGKey(0), CFG)
    checkpoint.save(str(tmp_path / "p"), params)
    restored = checkpoint.restore(str(tmp_path / "p"),
                                  checkpoint.as_abstract(params))
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_train_state_step_roundtrip(tmp_path):
    from llamagen_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(1, 1, 1, devices=jax.devices()[:1])
    state, step_fn = c2i.build_trainer(CFG, mesh, use_ema=True,
                                       compute_dtype=jnp.float32)
    rng = np.random.RandomState(0)
    batch = c2i.Batch(labels=jnp.asarray(rng.randint(0, 10, (4,))),
                      tokens=jnp.asarray(rng.randint(0, 128, (4, 16))))
    state, _ = step_fn(state, batch, jax.random.PRNGKey(0))

    path = checkpoint.save_step(str(tmp_path / "ckpts"), int(state.step),
                                state)
    assert checkpoint.latest_step(str(tmp_path / "ckpts")) == 1
    step, restored = checkpoint.restore_latest(
        str(tmp_path / "ckpts"), checkpoint.as_abstract(state))
    assert step == 1
    # training continues identically from the restored state
    s1, m1 = step_fn(state, batch, jax.random.PRNGKey(1))
    s2, m2 = step_fn(restored, batch, jax.random.PRNGKey(1))
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=1e-6)


def test_restore_onto_different_mesh(tmp_path):
    """FSDP resume with a different device count (the reference refuses
    this, train_c2i_fsdp.py:193-201; orbax reshards transparently)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from llamagen_tpu.parallel.mesh import make_mesh
    from llamagen_tpu.parallel.partition import gpt_param_specs

    mesh2 = make_mesh(1, 2, 1, devices=jax.devices()[:2])
    mesh4 = make_mesh(1, 4, 1, devices=jax.devices()[:4])
    specs = gpt_param_specs(CFG)

    params = gpt.init_params(jax.random.PRNGKey(3), CFG)
    sharded2 = jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh2, s)), params,
        specs, is_leaf=lambda x: x is None)
    checkpoint.save(str(tmp_path / "m"), sharded2)

    template4 = jax.tree.map(
        lambda x, s: jax.ShapeDtypeStruct(x.shape, x.dtype,
                                          sharding=NamedSharding(mesh4, s)),
        params, specs, is_leaf=lambda x: x is None)
    restored = checkpoint.restore(str(tmp_path / "m"), template4)
    np.testing.assert_array_equal(np.asarray(restored["norm"]),
                                  np.asarray(params["norm"]))
    assert restored["output"].sharding.mesh.shape["fsdp"] == 4
