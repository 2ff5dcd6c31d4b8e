"""VQ-VAE GAN training: alternating generator/discriminator steps.

Functional port of the reference two-optimizer loop
(`/root/reference/tokenizer/tokenizer_image/vq_train.py:187-216`) and loss
(`vq_loss.py:117-168`): generator loss = rec (l1/l2) + LPIPS + adversarial +
codebook terms with a disc warm-start gate; discriminator loss =
hinge/vanilla/non-saturating on (real, stopped-fake).

Both optimizer updates are fused into ONE jitted step (the reference issues
two backward passes per iteration anyway; here XLA shares the generator
forward between them where possible).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from functools import partial
from typing import Any, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from llamagen_tpu.config import VQConfig
from llamagen_tpu.models import discriminator as disc_lib
from llamagen_tpu.models import lpips as lpips_lib
from llamagen_tpu.models import vq
from llamagen_tpu.train.train_state import ema_update


@dataclass(frozen=True)
class VQLossConfig:
    """Mirrors VQLoss.__init__ defaults (ref: vq_loss.py:50-54)."""
    disc_start: int = 20000
    disc_weight: float = 0.5
    disc_type: str = "patchgan"           # or 'stylegan'
    disc_loss: str = "hinge"              # 'hinge' | 'vanilla' | 'non-saturating'
    gen_adv_loss: str = "hinge"           # 'hinge' | 'non-saturating'
    reconstruction_loss: str = "l2"       # 'l1' | 'l2'
    reconstruction_weight: float = 1.0
    codebook_weight: float = 1.0
    perceptual_weight: float = 1.0
    disc_adaptive_weight: bool = False
    image_size: int = 256


# --- adversarial losses (ref: vq_loss.py:14-40) ---

def hinge_d_loss(real, fake):
    return 0.5 * (jnp.mean(jax.nn.relu(1.0 - real))
                  + jnp.mean(jax.nn.relu(1.0 + fake)))


def vanilla_d_loss(real, fake):
    return 0.5 * (jnp.mean(jax.nn.softplus(-real))
                  + jnp.mean(jax.nn.softplus(fake)))


def non_saturating_d_loss(real, fake):
    # BCE-with-logits: real vs 1, fake vs 0
    return 0.5 * (jnp.mean(jax.nn.softplus(-real))
                  + jnp.mean(jax.nn.softplus(fake)))


def hinge_gen_loss(fake):
    return -jnp.mean(fake)


def non_saturating_gen_loss(fake):
    return jnp.mean(jax.nn.softplus(-fake))


D_LOSSES = {"hinge": hinge_d_loss, "vanilla": vanilla_d_loss,
            "non-saturating": non_saturating_d_loss}
G_LOSSES = {"hinge": hinge_gen_loss, "non-saturating": non_saturating_gen_loss}


def rec_loss_fn(kind: str, x, y):
    if kind == "l1":
        return jnp.mean(jnp.abs(x - y))
    return jnp.mean((x - y) ** 2)


USAGE_WINDOW = 65536  # ref: vq_model.py:212 (rolling codebook_used buffer)


class VQTrainState(NamedTuple):
    step: jnp.ndarray
    params: Any            # VQ-VAE params
    opt_state: Any
    disc_params: Any
    disc_opt_state: Any
    ema_params: Optional[Any] = None
    # rolling window of the last 65536 emitted code indices — scan-carried
    # state replacing the reference's mutable `codebook_used` buffer
    # (vq_model.py:241-245); starts at zeros like the reference, so code 0
    # counts as "used" until the window fills (kept for log comparability)
    usage_window: Optional[jnp.ndarray] = None


def init_vq_train_state(key, cfg: VQConfig, loss_cfg: VQLossConfig,
                        tx_gen, tx_disc, use_ema: bool = False,
                        dtype=jnp.float32) -> VQTrainState:
    k1, k2 = jax.random.split(key)
    params = vq.init_params(k1, cfg, dtype)
    disc_params = disc_lib.init_discriminator(
        k2, loss_cfg.disc_type, loss_cfg.image_size, dtype=dtype)
    return VQTrainState(
        step=jnp.zeros((), jnp.int32),
        params=params, opt_state=tx_gen.init(params),
        disc_params=disc_params, disc_opt_state=tx_disc.init(disc_params),
        ema_params=jax.tree.map(jnp.copy, params) if use_ema else None,
        usage_window=jnp.zeros((USAGE_WINDOW,), jnp.int32))


def make_train_step_fn(cfg: VQConfig, loss_cfg: VQLossConfig, tx_gen, tx_disc,
                       *, use_lpips: bool, use_disc: bool = True,
                       ema_decay: Optional[float] = None,
                       compute_dtype=jnp.float32, remat: bool = False):
    """Un-jitted combined generator+discriminator step
    `(state, imgs, lpips_params) -> (state, metrics)`.

    lpips_params travels as a runtime ARGUMENT (not a closure constant) so
    the ~15M-param VGG tree is a device-resident operand instead of an HLO
    constant blob in the compile payload; `use_lpips` is the static switch.
    use_disc=False statically removes the discriminator forward AND its
    update (a runtime disc_weight=0 still pays both) — for GAN-free
    warm-up phases and the step-anatomy bench.
    remat=True checkpoints every encoder/decoder block and the LPIPS
    forward: required to fit 256px batches on one 16 GB chip (the f32
    no-remat program wants 30 GB at batch 64); bit-identical losses.
    """
    disc_apply = disc_lib.DISC_APPLY[loss_cfg.disc_type]
    d_loss = D_LOSSES[loss_cfg.disc_loss]
    g_adv = G_LOSSES[loss_cfg.gen_adv_loss]

    def disc_gate(step):
        """adopt_weight: 0 before disc_start (ref: vq_loss.py:43-46)."""
        return jnp.where(step >= loss_cfg.disc_start,
                         jnp.float32(loss_cfg.disc_weight), 0.0)

    def _swap_last(params, kernel):
        """params with the decoder's conv_out kernel replaced (the
        reference's `last_layer`, vq_train.py passes
        vq_model.decoder.last_layer into VQLoss)."""
        dec = dict(params["decoder"])
        dec["conv_out"] = {**dec["conv_out"], "kernel": kernel}
        return {**params, "decoder": dec}

    # Per-SLICE checkpoints (lpips.vgg_features remat=True), NO outer
    # whole-LPIPS checkpoint: the forward saves only the 10 slice-boundary
    # feature maps and the backward recomputes one slice's internals at a
    # time — the full-VGG backward region was the batch-64/256px HBM peak
    # (~20 256MB maxpool/conv temps; OOM by 828 MB). Total recompute equals
    # the old whole-LPIPS checkpoint (one extra VGG forward), so this is
    # strictly better: measured batch-64 unlocked AND batch-32 unregressed,
    # where nesting outer+inner (a second full recompute) cost -3.4%.
    lpips_mean = (partial(lpips_lib.lpips_mean, remat=True)
                  if remat else lpips_lib.lpips_mean)

    def _nll_and_adv(params, disc_params, imgs_f, recons, lp):
        recons_f = recons.astype(jnp.float32)
        rec = rec_loss_fn(loss_cfg.reconstruction_loss, imgs_f, recons_f)
        if use_lpips and loss_cfg.perceptual_weight > 0:
            # LPIPS runs in the AUTOCAST dtype, exactly like the
            # reference (vq_train.py:192 wraps the whole VQLoss —
            # including its LPIPS VGG forward — in autocast(bf16));
            # the scalar mean is accumulated f32. Measured: the f32
            # VGG forward was 21% of the bf16-step wall time.
            p = lpips_mean(lp, imgs_f.astype(compute_dtype),
                           recons.astype(compute_dtype)).astype(jnp.float32)
        else:
            p = jnp.float32(0.0)
        if use_disc:
            logits_fake = disc_apply(disc_params, recons)
            adv = g_adv(logits_fake.astype(jnp.float32))
        else:
            adv = jnp.float32(0.0)
        return rec, p, adv

    def gen_loss(params, disc_params, imgs, step, lp):
        # dropout keys (cfg.dropout_p, reference --dropout-p): derived
        # from the step counter — deterministic, so remat recomputes and
        # multi-host SPMD see identical masks. None when dropout is off
        # (the reference recipe), keeping those programs unchanged.
        if cfg.dropout_p > 0:
            drng = jax.random.fold_in(jax.random.PRNGKey(23), step)
            enc_rng = jax.random.fold_in(drng, 0)
            dec_rng = jax.random.fold_in(drng, 1)
        else:
            enc_rng = dec_rng = None
        z_q, cb, indices = vq.encode(params, imgs.astype(compute_dtype),
                                     cfg, train=True, remat=remat,
                                     rng=enc_rng)
        recons = vq.decode(params, z_q, cfg, remat=remat, rng=dec_rng)
        imgs_f = imgs.astype(jnp.float32)
        rec, p, adv = _nll_and_adv(params, disc_params, imgs_f, recons, lp)
        dw = disc_gate(step)

        if loss_cfg.disc_adaptive_weight:
            # grad-norm-ratio adaptive GAN weight (ref: vq_loss.py:109-115,
            # 132-137): d = ||d(nll)/dW_last|| / (||d(adv)/dW_last|| + 1e-4).
            # ONE decoder forward via jax.vjp, two pullbacks — both loss
            # terms differentiate through the identical decode(kernel, z_sg),
            # so separate jax.grad closures would pay the decoder forward
            # (the step's most expensive op) twice.
            z_sg = jax.lax.stop_gradient(z_q)
            kernel = jax.lax.stop_gradient(
                params["decoder"]["conv_out"]["kernel"])
            r2, pull = jax.vjp(
                lambda kk: vq.decode(_swap_last(params, kk), z_sg, cfg,
                                     remat=remat, rng=dec_rng), kernel)

            def nll_of(r):
                rec2, p2, _ = _nll_and_adv(params, disc_params, imgs_f, r,
                                           lp)
                return (loss_cfg.reconstruction_weight * rec2
                        + loss_cfg.perceptual_weight * p2)

            def adv_of(r):
                return _nll_and_adv(params, disc_params, imgs_f, r, lp)[2]

            g_nll = pull(jax.grad(nll_of)(r2))[0]
            g_adv_grad = pull(jax.grad(adv_of)(r2))[0]
            d_adapt = jnp.linalg.norm(g_nll.reshape(-1)) / (
                jnp.linalg.norm(g_adv_grad.reshape(-1)) + 1e-4)
            d_adapt = jax.lax.stop_gradient(jnp.clip(d_adapt, 0.0, 1e4))
        else:
            d_adapt = jnp.float32(1.0)

        codebook_total = cb["vq"] + cb["commit"] + cb["entropy"]
        loss = (loss_cfg.reconstruction_weight * rec
                + loss_cfg.perceptual_weight * p
                + d_adapt * dw * adv
                + loss_cfg.codebook_weight * codebook_total)
        metrics = {"rec_loss": rec, "perceptual_loss": p,
                   "gen_adv_loss": adv, "vq_loss": cb["vq"],
                   "commit_loss": cb["commit"], "entropy_loss": cb["entropy"],
                   "disc_adaptive_weight": d_adapt}
        return loss, (recons, indices, metrics)

    def disc_loss(disc_params, imgs, recons, step):
        logits_real = disc_apply(disc_params, imgs.astype(compute_dtype))
        logits_fake = disc_apply(disc_params,
                                 jax.lax.stop_gradient(recons))
        dw = disc_gate(step)
        loss = dw * d_loss(logits_real.astype(jnp.float32),
                           logits_fake.astype(jnp.float32))
        return loss, {"disc_loss": loss,
                      "logits_real": jnp.mean(logits_real),
                      "logits_fake": jnp.mean(logits_fake)}

    def train_step(state: VQTrainState, imgs, lp):
        # generator update (ref: vq_train.py:187-204)
        (g_total, (recons, indices, g_metrics)), grads = jax.value_and_grad(
            gen_loss, has_aux=True)(state.params, state.disc_params, imgs,
                                    state.step, lp)
        updates, opt_state = tx_gen.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)

        # discriminator update (ref: vq_train.py:206-216)
        if use_disc:
            (d_total, d_metrics), d_grads = jax.value_and_grad(
                disc_loss, has_aux=True)(state.disc_params, imgs, recons,
                                         state.step)
            d_updates, disc_opt_state = tx_disc.update(
                d_grads, state.disc_opt_state, state.disc_params)
            disc_params = optax.apply_updates(state.disc_params, d_updates)
        else:
            d_metrics = {"disc_loss": jnp.float32(0.0),
                         "logits_real": jnp.float32(0.0),
                         "logits_fake": jnp.float32(0.0)}
            disc_params = state.disc_params
            disc_opt_state = state.disc_opt_state

        ema = state.ema_params
        if ema is not None and ema_decay is not None:
            ema = ema_update(ema, params, ema_decay)

        window = state.usage_window
        if window is not None:
            window, usage = rolling_codebook_usage(window, indices,
                                                   cfg.codebook_size)
        else:
            usage = codebook_usage(indices, cfg.codebook_size)
        metrics = {"gen_loss": g_total, **g_metrics, **d_metrics,
                   "codebook_usage": usage}
        return VQTrainState(step=state.step + 1, params=params,
                            opt_state=opt_state, disc_params=disc_params,
                            disc_opt_state=disc_opt_state,
                            ema_params=ema, usage_window=window), metrics

    return train_step


def make_vq_train_step(cfg: VQConfig, loss_cfg: VQLossConfig, tx_gen, tx_disc,
                       lpips_params=None, ema_decay: Optional[float] = None,
                       compute_dtype=jnp.float32):
    """Single-device convenience wrapper: `(state, imgs) -> (state, metrics)`
    with lpips_params bound once. Mesh training uses `build_trainer`."""
    fn = make_train_step_fn(cfg, loss_cfg, tx_gen, tx_disc,
                            use_lpips=lpips_params is not None,
                            ema_decay=ema_decay, compute_dtype=compute_dtype)
    jfn = jax.jit(fn, donate_argnums=(0,))
    lp = (jax.tree.map(jnp.asarray, lpips_params)
          if lpips_params is not None else None)

    def step(state, imgs):
        return jfn(state, imgs, lp)

    return step


def build_trainer(cfg: VQConfig, loss_cfg: VQLossConfig, mesh: Mesh, *,
                  lr: float = 1e-4, beta1: float = 0.9, beta2: float = 0.95,
                  max_grad_norm: float = 1.0, use_ema: bool = False,
                  ema_decay: float = 0.999, seed: int = 0,
                  lpips_params=None, use_disc: bool = True,
                  compute_dtype=jnp.float32, remat: bool = False):
    """Mesh-sharded (data-parallel) VQ-GAN trainer: `(state, step_fn)`.

    Replaces the reference's DDP stage-1 driver
    (`/root/reference/tokenizer/tokenizer_image/vq_train.py:169-216`: DDP
    wrap of model AND discriminator, torchrun-launched). TPU-native design:
    the 72M generator + discriminator + both Adam states + the EMA all
    REPLICATE (P()); the image batch splits over (dp, fsdp); XLA inserts the
    gradient all-reduces from the sharding annotations — including the
    discriminator's BatchNorm batch statistics, whose batch-mean reductions
    become global psums, so the sharded step computes exactly the
    single-device math (parity-tested on the virtual 8-device mesh). The
    rolling 65536-entry usage window stays replicated: its append reads the
    (sharded) index grid, which XLA all-gathers — 64 KB/step, noise.
    """
    tx_g = make_vq_optimizer(lr, beta1, beta2, max_grad_norm)
    tx_d = make_vq_optimizer(lr, beta1, beta2, max_grad_norm)
    repl = NamedSharding(mesh, P())

    def init_fn(rng):
        return init_vq_train_state(rng, cfg, loss_cfg, tx_g, tx_d,
                                   use_ema=use_ema)

    abstract = jax.eval_shape(init_fn, jax.random.PRNGKey(seed))
    out_shardings = jax.tree.map(lambda _: repl, abstract)
    state = jax.jit(init_fn, out_shardings=out_shardings)(
        jax.random.PRNGKey(seed))

    lp = (jax.device_put(lpips_params, repl)
          if lpips_params is not None else None)
    fn = make_train_step_fn(cfg, loss_cfg, tx_g, tx_d,
                            use_lpips=lpips_params is not None,
                            use_disc=use_disc,
                            ema_decay=ema_decay if use_ema else None,
                            compute_dtype=compute_dtype, remat=remat)
    jfn = jax.jit(fn, donate_argnums=(0,))

    def step_fn(state, imgs):
        return jfn(state, imgs, lp)

    return state, step_fn


def shard_vq_batch(imgs, mesh: Mesh):
    """Split an image batch [B, H, W, 3] across (dp, fsdp) — see
    parallel.mesh.put_batch (the reference's DistributedSampler
    semantics, vq_train.py:120-133, without any gather)."""
    from llamagen_tpu.parallel.mesh import put_batch

    return put_batch(imgs, mesh)


def codebook_usage(indices: jnp.ndarray, codebook_size: int) -> jnp.ndarray:
    """Fraction of codebook entries hit in this batch (windowless variant
    for callers that don't carry state)."""
    hist = jnp.zeros((codebook_size,), jnp.int32).at[indices.reshape(-1)].add(1)
    return jnp.sum(hist > 0) / codebook_size


def rolling_codebook_usage(window: jnp.ndarray, indices: jnp.ndarray,
                           codebook_size: int):
    """Exact reference usage metric (vq_model.py:241-245): shift the
    rolling 65536-entry buffer left by this batch's token count, append
    the new indices, report unique(buffer)/codebook_size. Returns
    (new_window, usage). Buffer ops are static-shape (batch token count
    is known at trace time), so this runs inside jit."""
    idx = indices.reshape(-1).astype(window.dtype)
    w = window.shape[0]
    if idx.shape[0] >= w:
        window = idx[-w:]
    else:
        window = jnp.concatenate([window[idx.shape[0]:], idx])
    hist = jnp.zeros((codebook_size,), jnp.int32).at[window].add(1)
    return window, jnp.sum(hist > 0) / codebook_size


def make_vq_optimizer(lr: float = 1e-4, beta1: float = 0.9,
                      beta2: float = 0.95, max_grad_norm: float = 1.0):
    """Adam (no weight decay), as vq_train.py:110-111."""
    return optax.chain(optax.clip_by_global_norm(max_grad_norm),
                       optax.adam(lr, b1=beta1, b2=beta2))
