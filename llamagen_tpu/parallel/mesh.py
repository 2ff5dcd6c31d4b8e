"""Device mesh construction and sharding helpers.

Replaces the reference's NCCL process-group machinery
(`/root/reference/utils/distributed.py`, `train_c2i_fsdp.py:31-63`,
vLLM's pynccl/custom all-reduce) with a `jax.sharding.Mesh`: collectives
are inserted by XLA from sharding annotations and ride ICI.

Axes:
  dp   — pure data parallel (replicated params)
  fsdp — fully-sharded data parallel (params sharded, gathered on use;
         ZeRO-3 semantics, like the reference's FULL_SHARD)
  tp   — tensor parallel (attention heads / FFN hidden sharded; used for
         serving large models, the reference plumbs but never enables it)
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

MESH_AXES = ("dp", "fsdp", "tp")


def make_mesh(dp: int = 1, fsdp: int = 1, tp: int = 1,
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Build a (dp, fsdp, tp) mesh. Use dp/fsdp/tp = -1 to absorb the rest."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    sizes = [dp, fsdp, tp]
    if -1 in sizes:
        known = int(np.prod([s for s in sizes if s != -1]))
        assert n % known == 0, f"{n} devices not divisible by {known}"
        sizes[sizes.index(-1)] = n // known
    dp, fsdp, tp = sizes
    assert dp * fsdp * tp == n, (
        f"mesh {dp}x{fsdp}x{tp} != {n} devices")
    dev_array = np.asarray(devices).reshape(dp, fsdp, tp)
    return Mesh(dev_array, MESH_AXES)


def data_spec() -> P:
    """Batch sharding: data split over both dp and fsdp axes."""
    return P(("dp", "fsdp"))


def put_batch(tree, mesh: Mesh):
    """Split a batch pytree across (dp, fsdp) — `data_spec()`.

    Single-process: leaves are the GLOBAL batch (device_put sharded).
    Multi-host: each leaf holds THIS PROCESS's rows (the per-host stride
    the data loaders produce) and the global array is assembled from the
    process-local shards — the reference's DistributedSampler semantics
    (train_c2i.py:125-140) without any gather. None leaves pass through
    (jax.tree.map treats None as an empty subtree). One implementation
    for the c2i / t2i / VQ trainers' batch placement.
    """
    sharding = NamedSharding(mesh, data_spec())
    if jax.process_count() > 1:
        put = lambda x: jax.make_array_from_process_local_data(
            sharding, np.asarray(x))
    else:
        put = lambda x: jax.device_put(x, sharding)
    return jax.tree.map(put, tree)


def shard_pytree(tree, mesh: Mesh, specs):
    """Place a pytree on the mesh according to a matching pytree of specs."""
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), tree, specs,
        is_leaf=lambda x: x is None)


def replicate(tree, mesh: Mesh):
    return jax.tree.map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P())), tree)


def local_mesh_for_testing(dp=1, fsdp=1, tp=1) -> Mesh:
    return make_mesh(dp, fsdp, tp)
