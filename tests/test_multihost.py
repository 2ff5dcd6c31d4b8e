"""REAL multi-host training: two OS processes, gloo-coordinated jax.

Each worker owns 4 virtual CPU devices (2 hosts x 4 = 8 global devices,
a (2,2,2) dp/fsdp/tp mesh) and feeds its own stride of the global batch —
the same shape as a 2-host TPU pod run (jax.distributed + per-host data +
make_array_from_process_local_data). Losses must agree across processes
AND match a single-process 8-device run of the identical global batch.
"""

import os
import re
import socket
import subprocess
import sys

import numpy as np
import pytest

import conftest  # noqa: F401

import pytest as _pytest

pytestmark = _pytest.mark.slow  # engine/e2e tier (pyproject markers)


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_training_matches_single_process():
    worker = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "multihost_worker.py")
    port = str(_free_port())
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [subprocess.Popen([sys.executable, worker, str(pid), port],
                              env=env, text=True, stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT)
             for pid in (0, 1)]
    outs = [p.communicate(timeout=540)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-2000:]

    losses = {}  # (pid, step) -> loss
    for out in outs:
        for m in re.finditer(r"LOSS (\d) (\d) ([0-9.]+)", out):
            losses[(int(m.group(1)), int(m.group(2)))] = float(m.group(3))
    assert len(losses) == 6, (losses, outs[0][-500:])
    for step in range(3):
        assert losses[(0, step)] == pytest.approx(losses[(1, step)],
                                                  abs=1e-6)

    # single-process reference: same global batch on an 8-device mesh
    import jax
    import jax.numpy as jnp

    from llamagen_tpu.config import GPTConfig
    from llamagen_tpu.parallel.mesh import make_mesh
    from llamagen_tpu.train import c2i

    cfg = GPTConfig(dim=64, n_layer=2, n_head=4, block_size=16,
                    num_classes=16, vocab_size=256, cls_token_num=1,
                    token_dropout_p=0.0, resid_dropout_p=0.0,
                    ffn_dropout_p=0.0, class_dropout_prob=0.0)
    mesh = make_mesh(dp=2, fsdp=2, tp=2)
    state, step_fn = c2i.build_trainer(cfg, mesh, compute_dtype=jnp.float32,
                                       use_ema=False, seed=0)
    rng = np.random.RandomState(0)
    labels = rng.randint(0, 16, size=(8,)).astype(np.int32)
    tokens = rng.randint(0, 256, size=(8, 16)).astype(np.int32)
    # interleave rows the way the two hosts contribute them (host 0 rows
    # land on devices 0..3): [0,2,4,6, 1,3,5,7]
    order = np.concatenate([np.arange(0, 8, 2), np.arange(1, 8, 2)])
    for step in range(3):
        batch = c2i.shard_batch(
            c2i.Batch(labels=jnp.asarray(labels[order]),
                      tokens=jnp.asarray(tokens[order])), mesh)
        state, metrics = step_fn(state, batch, jax.random.PRNGKey(1))
        ref = float(metrics["loss"])
        assert ref == pytest.approx(losses[(0, step)], rel=1e-5), (
            step, ref, losses[(0, step)])
