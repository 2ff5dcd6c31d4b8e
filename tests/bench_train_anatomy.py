"""Training-step anatomy: knock components out of the GPT c2i train step
and measure the deltas on the real chip (VERDICT r3 item 5 — explain the
gap between ~35% 6NT-MFU and the hardware).

Not a pytest file:

    python tests/bench_train_anatomy.py GPT-B 256

Modes (each is a separate compile of the same pjit step):

    full    - the real configuration (matches tests/bench_train.py)
    nodrop  - all dropout probabilities zero (token/resid/ffn/class):
              isolates bernoulli-RNG + mask traffic
    noce    - loss = logits.mean() instead of CE: isolates the
              log-softmax/gather traffic over the [B, S, V] f32 logits
              (the head matmul and its backward stay)
    nohead  - output head replaced by a broadcast: head matmul + CE both
              gone (difference to noce = head fwd+bwd matmul)
    noattn  - training-attention kernel replaced by identity(q):
              attention fwd+bwd gone (qkv/wo matmuls stay)
    noopt   - value_and_grad only (no adamw/EMA/global-norm): isolates
              optimizer + EMA HBM traffic
    fwd     - forward loss only, no grad (remat recompute + backward gone)

Components overlap (remat re-runs the forward inside the backward), so
shares are read as "step minus knockout", not a partition.
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import dataclasses
import functools

import jax.numpy as jnp
import numpy as np

V5E_BF16_FLOPS = 197e12


def build(model, batch, mode):
    import optax

    from llamagen_tpu.config import gpt_config
    from llamagen_tpu.models import gpt
    from llamagen_tpu.ops import train_attention
    from llamagen_tpu.parallel.mesh import make_mesh
    from llamagen_tpu.train import c2i

    cfg = gpt_config(model, block_size=256, cls_token_num=1)
    if mode == "nodrop":
        cfg = dataclasses.replace(
            cfg, token_dropout_p=0.0, resid_dropout_p=0.0,
            ffn_dropout_p=0.0, class_dropout_prob=0.0)

    if mode == "noce":
        real_forward = gpt.forward_train

        def forward_noce(params, cfg_, cond, idx, targets=None, valid=None,
                         **kw):
            logits, _ = real_forward(params, cfg_, cond, idx, targets=None,
                                     valid=None, **kw)
            return logits, jnp.mean(logits)

        gpt.forward_train = forward_noce
    elif mode == "nohead":
        real_logits = gpt._logits

        def fake_logits(params, h, cfg_):
            h = gpt.rms_norm(h, params["norm"], cfg_.norm_eps)
            return jnp.broadcast_to(
                h[..., :1], (*h.shape[:-1], cfg_.vocab_size)
            ).astype(jnp.float32)

        gpt._logits = fake_logits
    elif mode == "noattn":
        train_attention.causal_attention_bshd = \
            lambda q, k, v, scale: q

    mesh = make_mesh(1, 1, 1)
    state, step_fn = c2i.build_trainer(cfg, mesh)
    if mode == "noopt":
        base = jax.jit(lambda p, b, r: jax.value_and_grad(c2i.loss_fn)(
            p, cfg, b, r, jnp.bfloat16, True))

        def step_fn(state, batch_, rng):  # noqa: F811
            loss, grads = base(state.params, batch_, rng)
            return state, {"loss": loss,
                           "grad_norm": grads["norm"].sum()}
    elif mode == "fwd":
        base = jax.jit(lambda p, b, r: c2i.loss_fn(
            p, cfg, b, r, jnp.bfloat16, True))

        def step_fn(state, batch_, rng):  # noqa: F811
            loss = base(state.params, batch_, rng)
            return state, {"loss": loss}

    rng = np.random.RandomState(0)
    batch_data = c2i.shard_batch(c2i.Batch(
        labels=jnp.asarray(rng.randint(0, 1000, size=(batch,))),
        tokens=jnp.asarray(rng.randint(
            0, cfg.vocab_size, size=(batch, cfg.block_size)))), mesh)
    return state, step_fn, batch_data, cfg


def run_mode(model, batch, mode, n_steps=8):
    import importlib

    from llamagen_tpu.models import gpt
    from llamagen_tpu.ops import train_attention

    # fresh module state per mode (the knockouts monkeypatch)
    importlib.reload(train_attention)
    importlib.reload(gpt)

    state, step_fn, batch_data, cfg = build(model, batch, mode)
    key = jax.random.PRNGKey(0)
    state, metrics = step_fn(state, batch_data, key)
    _ = float(metrics["loss"])
    t0 = time.time()
    for _ in range(n_steps):
        state, metrics = step_fn(state, batch_data, key)
    _ = float(metrics["loss"])
    dt = (time.time() - t0) / n_steps
    del state, batch_data
    return dt


def main(model="GPT-B", batch=256):
    modes = ["full", "nodrop", "noce", "nohead", "noattn", "noopt", "fwd"]
    full = None
    for mode in modes:
        dt = run_mode(model, batch, mode)
        if mode == "full":
            full = dt
            import jax as _j
            from llamagen_tpu.config import gpt_config
            from llamagen_tpu.models import gpt as _g
            cfg = gpt_config(model, block_size=256, cls_token_num=1)
            n_params = sum(
                x.size for x in _j.tree.leaves(
                    _g.init_params(_j.random.PRNGKey(0), cfg)))
            mfu = 6 * n_params * batch * 256 / dt / V5E_BF16_FLOPS
            print(f"{model} full   : {dt:.3f} s/step  (6NT-MFU {mfu:.1%})")
        else:
            print(f"{model} {mode:7s}: {dt:.3f} s/step  "
                  f"share={full - dt:+.3f} s")


if __name__ == "__main__":
    main(*(sys.argv[1:2] or ["GPT-B"]), *(int(a) for a in sys.argv[2:3]))
