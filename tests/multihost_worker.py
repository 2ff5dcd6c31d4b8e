"""Worker for the real two-process multi-host training test.

Launched twice by tests/test_multihost.py with a shared coordinator port;
each process owns 4 virtual CPU devices (2 hosts x 4 = 8 global) and its
stride of the global batch, exactly like a 2-host TPU pod run.
"""

import os
import sys

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

import jax

jax.config.update("jax_platforms", "cpu")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    pid = int(sys.argv[1])
    port = sys.argv[2]
    from llamagen_tpu.parallel.distributed import init_distributed

    assert init_distributed(coordinator_address=f"127.0.0.1:{port}",
                            num_processes=2, process_id=pid)
    assert jax.process_count() == 2
    assert len(jax.devices()) == 8

    import jax.numpy as jnp
    import numpy as np

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
    # this process's stride of the global batch (DistributedSampler-style)
    local = slice(pid, None, 2)
    for step in range(3):
        batch = c2i.shard_batch(
            c2i.Batch(labels=jnp.asarray(labels[local]),
                      tokens=jnp.asarray(tokens[local])), mesh)
        state, metrics = step_fn(state, batch, jax.random.PRNGKey(1))
        print(f"LOSS {pid} {step} {float(metrics['loss']):.6f}", flush=True)


if __name__ == "__main__":
    main()
