"""Class-conditional GPT training CLI (DP/FSDP over a TPU mesh).

Equivalent of `/root/reference/autoregressive/train/train_c2i.py` and
`train_c2i_fsdp.py` — one driver covers both: set --fsdp > 1 for
parameter sharding (FULL_SHARD semantics) and/or --dp for data parallel.

  python -m llamagen_tpu.cli.train_c2i --code-path /data/codes \
      --gpt-model GPT-B --image-size 256 --epochs 300
"""

from __future__ import annotations

import argparse
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from llamagen_tpu.cli.common import load_gpt
from llamagen_tpu.config import gpt_config
from llamagen_tpu.data.codes import (NpyCodeDataset, PackedCodeDataset,
                                     SyntheticCodeDataset, pack_shards)
from llamagen_tpu.parallel.mesh import make_mesh
from llamagen_tpu.train import c2i
from llamagen_tpu.utils import checkpoint
from llamagen_tpu.utils.logger import create_logger


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--code-path", default=None,
                   help="packed shard dir, or reference-layout code dir")
    p.add_argument("--label-path", default=None,
                   help="labels dir for reference npy layout")
    p.add_argument("--synthetic-steps", type=int, default=0,
                   help="train on synthetic data for N steps (smoke mode)")
    p.add_argument("--gpt-model", default="GPT-B")
    p.add_argument("--image-size", type=int, default=256)
    p.add_argument("--downsample-size", type=int, default=16)
    p.add_argument("--class-dropout-prob", type=float, default=0.1)
    p.add_argument("--dropout-p", type=float, default=0.1,
                   help="resid/ffn dropout (ref train_c2i.py:271)")
    p.add_argument("--token-dropout-p", type=float, default=0.1)
    p.add_argument("--drop-path-rate", type=float, default=0.0,
                   help="stochastic depth; >0 zeroes dropout-p (ref :97-100)")
    p.add_argument("--global-batch-size", type=int, default=256)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--weight-decay", type=float, default=5e-2)
    p.add_argument("--beta1", type=float, default=0.9)
    p.add_argument("--beta2", type=float, default=0.95)
    p.add_argument("--max-grad-norm", type=float, default=1.0)
    p.add_argument("--warmup-steps", type=int, default=0)
    p.add_argument("--epochs", type=int, default=300)
    p.add_argument("--max-steps", type=int, default=-1)
    p.add_argument("--no-ema", action="store_true")
    p.add_argument("--dp", type=int, default=1)
    p.add_argument("--fsdp", type=int, default=-1)
    p.add_argument("--tp", type=int, default=1)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--log-every", type=int, default=100)
    p.add_argument("--ckpt-every", type=int, default=5000)
    p.add_argument("--results-dir", default="results")
    p.add_argument("--resume", default=None)
    p.add_argument("--exp-auto", action="store_true",
                   help="create an auto-numbered {index:03d}-{model} "
                        "experiment subdir (ref train_c2i.py:71-84)")
    p.add_argument("--profile-dir", default=None,
                   help="capture a jax.profiler trace of steps 2..4 here")
    p.add_argument("--memory-analysis", action="store_true",
                   help="log the compiler's memory breakdown of the step")
    p.add_argument("--wandb", action="store_true",
                   help="mirror metrics.jsonl to wandb when importable "
                        "(ref train_c2i_fsdp.py:148-154)")
    p.add_argument("--remat", default="full",
                   choices=["full", "save_attn", "none"],
                   help="rematerialization policy: full layer remat "
                        "(default), save_attn (selective — save each "
                        "layer's attention output, recompute the rest), "
                        "or none (needs activation memory headroom)")
    args = p.parse_args(argv)

    latent = args.image_size // args.downsample_size
    # drop-path replaces resid/ffn dropout (ref train_c2i.py:97-100)
    dropout_p = 0.0 if args.drop_path_rate > 0.0 else args.dropout_p
    cfg = gpt_config(args.gpt_model, block_size=latent * latent,
                     cls_token_num=1,
                     class_dropout_prob=args.class_dropout_prob,
                     resid_dropout_p=dropout_p, ffn_dropout_p=dropout_p,
                     token_dropout_p=args.token_dropout_p,
                     drop_path_rate=args.drop_path_rate)

    mesh = make_mesh(args.dp, args.fsdp, args.tp)
    if args.exp_auto:
        from llamagen_tpu.utils.logger import create_experiment_dir
        args.results_dir = create_experiment_dir(args.results_dir,
                                                 args.gpt_model)
    os.makedirs(args.results_dir, exist_ok=True)
    logger = create_logger(args.results_dir)
    logger.info(f"mesh: {mesh}; model {args.gpt_model} "
                f"({latent}x{latent} tokens)")
    from llamagen_tpu.utils.metrics import MetricsLogger
    mlog = MetricsLogger(args.results_dir, use_wandb=args.wandb,
                         config=vars(args),
                         is_main=jax.process_index() == 0)

    state, step_fn = c2i.build_trainer(
        cfg, mesh, lr=args.lr, weight_decay=args.weight_decay,
        beta1=args.beta1, beta2=args.beta2,
        max_grad_norm=args.max_grad_norm, warmup_steps=args.warmup_steps,
        use_ema=not args.no_ema, seed=args.seed,
        remat={"full": True, "save_attn": "save_attn",
               "none": False}[args.remat])

    start_step = 0
    if args.resume:
        step, restored = checkpoint.restore_latest(
            args.resume, checkpoint.as_abstract(state))
        if restored is not None:
            state, start_step = restored, step
            logger.info(f"resumed from step {start_step}")

    num_hosts, host_id = jax.process_count(), jax.process_index()
    host_batch = args.global_batch_size // num_hosts
    it = None
    if args.synthetic_steps > 0:
        ds = SyntheticCodeDataset(args.global_batch_size * 4,
                                  cfg.block_size, cfg.vocab_size,
                                  cfg.num_classes, seed=args.seed)
        max_steps = args.synthetic_steps
    elif args.code_path and os.path.isdir(args.code_path) and any(
            f.endswith(".codes") for f in os.listdir(args.code_path)):
        # raw shards -> threaded C++ loader (preferred input path)
        from llamagen_tpu.data.native import NativeCodeLoader
        it = NativeCodeLoader(args.code_path, host_batch, seed=args.seed,
                              num_hosts=num_hosts, host_id=host_id)
        # the loader reshuffles forever, so honor --epochs by converting
        # it to a step bound (the other branches bound their iterators)
        max_steps = args.max_steps
        if max_steps <= 0 and args.epochs > 0:
            # num_samples counts THIS host's shard subset
            steps_per_epoch = it.num_samples // host_batch
            max_steps = args.epochs * max(steps_per_epoch, 1)
    elif args.code_path and os.path.isdir(args.code_path) and any(
            f.endswith((".npz", ".codes.npy"))
            for f in os.listdir(args.code_path)):
        ds = PackedCodeDataset(args.code_path, num_hosts=num_hosts,
                               host_id=host_id)
        max_steps = args.max_steps
    elif args.code_path:
        # reference {i}.npy micro-file layout: repack once (cached next to
        # the source dir), then memmap the packed shards
        packed = args.code_path.rstrip("/") + "_packed"
        src = NpyCodeDataset(args.code_path,
                             args.label_path or args.code_path)
        if not (os.path.isdir(packed) and any(
                f.endswith(".codes.npy") for f in os.listdir(packed))):
            logger.info(f"repacking {len(src)} npy micro-files -> {packed}")
            pack_shards(src, packed)
        ds = PackedCodeDataset(packed, num_hosts=num_hosts, host_id=host_id)
        max_steps = args.max_steps
    else:
        raise SystemExit("need --code-path or --synthetic-steps")

    if it is None:
        it = ds.batches(host_batch, seed=args.seed, epochs=args.epochs)
    rng = jax.random.PRNGKey(args.seed)
    t0, last_log = time.time(), start_step
    running_loss = 0.0
    step = start_step
    profiling = None
    for codes, labels in it:
        if max_steps > 0 and step >= max_steps:
            break
        batch = c2i.shard_batch(
            c2i.Batch(labels=jnp.asarray(labels), tokens=jnp.asarray(codes)),
            mesh)
        if args.memory_analysis and step == start_step:
            from llamagen_tpu.utils import profiling as prof
            logger.info(prof.format_memory(prof.memory_analysis(
                lambda s, b, r: step_fn(s, b, r)[1], state, batch, rng)))
        if args.profile_dir and step == start_step + 2 and profiling is None:
            jax.profiler.start_trace(args.profile_dir)
            profiling = True
            logger.info(f"profiler trace -> {args.profile_dir}")
        state, metrics = step_fn(state, batch, rng)
        step += 1
        if profiling and step >= start_step + 5:
            jax.profiler.stop_trace()
            profiling = False
        running_loss += float(metrics["loss"])
        if step % args.log_every == 0:
            dt = time.time() - t0
            sps = (step - last_log) / dt
            avg_loss = running_loss / (step - last_log)
            logger.info(f"step {step}: loss {avg_loss:.4f} "
                        f"({sps:.2f} steps/s, "
                        f"{sps * args.global_batch_size:.0f} samples/s)")
            mlog.log(step, {"loss": avg_loss, "steps_per_sec": sps,
                            "samples_per_sec": sps * args.global_batch_size,
                            "grad_norm": float(metrics["grad_norm"])
                            if "grad_norm" in metrics else None})
            running_loss, t0, last_log = 0.0, time.time(), step
        if step % args.ckpt_every == 0:
            path = checkpoint.save_step(
                os.path.join(args.results_dir, "checkpoints"), step, state)
            logger.info(f"saved checkpoint {path}")

    path = checkpoint.save_step(
        os.path.join(args.results_dir, "checkpoints"), step, state)
    logger.info(f"done at step {step}; final checkpoint {path}")
    mlog.close()


if __name__ == "__main__":
    main()
