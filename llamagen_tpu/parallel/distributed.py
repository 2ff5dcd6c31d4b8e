"""Multi-host initialization (ref: /root/reference/utils/distributed.py).

The reference discovers ranks from torchrun/SLURM env vars and initializes
NCCL process groups (distributed.py:20-57). On TPU pods this collapses to
`jax.distributed.initialize()` (rank discovery is automatic on TPU VMs) —
collectives afterwards are XLA ops over ICI/DCN via mesh shardings, and the
control plane is SPMD (no broadcast_tensor_dict equivalent needed).
"""

from __future__ import annotations

import os
from typing import Optional

import jax


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> bool:
    """Initialize multi-host JAX if running in a multi-process environment.

    Returns True if distributed mode is active. On single-host (this
    includes SLURM single-task and plain CLI runs) it is a no-op — the
    reference's fallback branch (distributed.py:41-47).
    """
    strong_hints = ("COORDINATOR_ADDRESS", "MEGASCALE_COORDINATOR_ADDRESS",
                    "TPU_WORKER_HOSTNAMES")
    strong = (coordinator_address is not None
              or any(os.environ.get(k) for k in strong_hints))
    if not strong:
        # SLURM is only a hint when it actually describes >1 task: a
        # single-task SLURM wrapper around a one-host run must NOT gate
        # out an explicit coordinator_address / TPU pod env (each worker
        # would silently train as an independent single-host job)
        if int(os.environ.get("SLURM_NTASKS", "1")) <= 1:
            return False
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)
    return True


def is_main_process() -> bool:
    return jax.process_index() == 0


def world_size() -> int:
    return jax.process_count()
