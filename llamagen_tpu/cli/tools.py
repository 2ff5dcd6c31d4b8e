"""Utility tools CLI (equivalents of the reference's `tools/`).

Subcommands:
  convert-ckpt      torch .pt -> orbax params directory
                    (tools/convert_pytorch_lightning_to_torch.py equivalent
                    for our runtime: one-time conversion so serving/training
                    never needs torch)
  quantize-ckpt     pre-quantize a GPT checkpoint for serving (W8A16 or
                    the W4A16 kernel layout; 2x / 4x smaller, loads into
                    every decode path unchanged)
  check-codes       decode dumped code shards back to images for visual
                    validation (tools/check_image_codes.py)
  class-name        look up ImageNet class names (tools/imagenet_en_cn.py)
  index-images      scan a dataset tree, drop unreadable images, write
                    image_paths.json — the `tools/openimage_json.py`
                    equivalent (alias: `openimage-json`); generalizes the
                    reference's hard-coded openimages_0001..0047 folder
                    walk to any tree and its 47-process pool to --workers
  plot-metrics      plot loss/throughput curves from an experiment's
                    metrics.jsonl (tools/draw_figure.py, pointed at live
                    training data instead of hard-coded paper numbers)

  python -m llamagen_tpu.cli.tools convert-ckpt --kind gpt \
      --in c2i_B_256.pt --out ./c2i_B_256_orbax --gpt-model GPT-B
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np


def cmd_convert_ckpt(args):
    import jax.numpy as jnp

    from llamagen_tpu.utils import checkpoint

    if args.kind == "gpt":
        from llamagen_tpu.cli.common import load_gpt
        params, _ = load_gpt(args.input, args.gpt_model, args.image_size,
                             args.downsample_size, model_type=args.model_type,
                             dtype=jnp.float32)
    else:
        from llamagen_tpu.cli.common import load_vq
        params, _ = load_vq(args.input, args.vq_model, args.codebook_size,
                            args.codebook_embed_dim, dtype=jnp.float32)
    checkpoint.save(args.output, params)
    print(f"converted {args.input} -> {args.output}")


def cmd_quantize_ckpt(args):
    """Pre-quantize a GPT checkpoint for serving (no reference analogue —
    the reference serves fp16 and relies on A100 bandwidth).

    int8 = W8A16 (near-exact, the quality serving default); w4 / w4-pc =
    the W4A16 Pallas-kernel layout (faster on weights-bound models, see
    BENCH.md numerics). The output is an ordinary orbax params dir whose
    key layout (`*_q` / `*_w4b`) every decode path dispatches on — load
    it with the usual --gpt-ckpt flags; storage drops 2x / 4x."""
    import jax.numpy as jnp

    from llamagen_tpu.cli.common import load_gpt
    from llamagen_tpu.utils import checkpoint

    params, cfg = load_gpt(args.input, args.gpt_model, args.image_size,
                           args.downsample_size, model_type=args.model_type,
                           dtype=jnp.bfloat16)

    def calib():
        # Calibration tokens: VQ codes from --calib-codes (.npy [N, L]
        # dump, cli/extract_codes.py layout) or random (the honest
        # fallback; fine for smoke, use real codes for released
        # checkpoints — BENCH.md W4 quality study)
        rng = np.random.RandomState(args.calib_seed)
        n = args.calib_samples
        if args.calib_codes:
            codes = np.load(args.calib_codes, mmap_mode="r")
            codes = np.asarray(codes[:n]).reshape(n, -1)[:, :cfg.block_size]
            tokens = jnp.asarray(codes.astype(np.int32))
        else:
            tokens = jnp.asarray(rng.randint(
                0, cfg.vocab_size, size=(n, cfg.block_size)))
        labels = jnp.asarray(rng.randint(0, cfg.num_classes, size=(n,)))
        return labels, tokens

    if args.mode != "int8" and args.awq:
        # activation-aware equalization pre-pass (ops/awq.py): exact
        # rescale of the param tree that shifts the int4 grid toward the
        # salient input channels; composes with rtn and gptq
        from llamagen_tpu.ops.awq import awq_equalize_gpt_params
        labels, tokens = calib()
        params = awq_equalize_gpt_params(
            params, cfg, labels, tokens,
            per_channel=args.mode == "w4-pc", group_size=args.group,
            verbose=True)

    if args.mode == "int8":
        from llamagen_tpu.ops.quant_matmul import quantize_gpt_params
        params = quantize_gpt_params(params,
                                     quantize_head=args.quantize_head)
    elif args.method == "gptq":
        # calibrated GPTQ (ops/gptq.py): error-compensated int4 levels
        # in the same kernel layout
        from llamagen_tpu.ops.gptq import gptq_quantize_gpt_params

        labels, tokens = calib()
        params = gptq_quantize_gpt_params(
            params, cfg, labels, tokens,
            per_channel=args.mode == "w4-pc", group_size=args.group,
            int8_head=args.quantize_head, verbose=True)
    else:
        from llamagen_tpu.ops.w4_matmul import quantize_gpt_params_w4k
        params = quantize_gpt_params_w4k(
            params, per_channel=args.mode == "w4-pc",
            int8_head=args.quantize_head, group_size=args.group)
    checkpoint.save(args.output, params)
    print(f"quantized ({args.mode}) {args.input} -> {args.output}")


def cmd_validate_release(args):
    """Released-weights runbook: one command from the published `.pt`
    files to a validated, converted, sample-producing setup.

    Steps (each prints PASS/SKIP):
      1. convert   — GPT + VQ `.pt` -> orbax dirs under --out (all four
                     reference dict layouts accepted, utils/convert.py)
      2. oracle    — load the SAME state dicts into the reference torch
                     models (ref sample_c2i.py:40-63) and gate the
                     conversion: teacher-forced GPT logits, greedy CFG
                     token parity, VQ encode token ids, decode_code
                     reconstruction. This is the gate that catches
                     converter key-layout bugs on REAL files — every
                     in-repo parity test runs on synthetic state dicts.
                     Needs torch + --reference (skipped cleanly if absent).
      3. sample    — an 8-image CFG sample grid through the converted
                     pair (bf16, kernel path on TPU), saved as PNG
      4. protocol  — prints the exact 50k-FID commands
                     (sample_c2i_fid + evaluate) for the converted dirs

    Smoke-tested end-to-end with synthetic stand-in weights in
    tests/test_cli_smoke.py::test_validate_release_runbook, so the day
    real weights are available nothing new needs writing
    (VERDICT r3 "real-weights runbook").
    """
    import jax
    import jax.numpy as jnp

    from llamagen_tpu.cli.common import load_gpt, load_vq, save_image_grid
    from llamagen_tpu.utils import checkpoint

    os.makedirs(args.out, exist_ok=True)
    oracle_n = args.oracle_tokens

    # -- 1. convert (f32 master copies; serving casts down at load) ------
    gpt_params, gcfg = load_gpt(args.gpt_pt, args.gpt_model,
                                args.image_size, args.downsample_size,
                                model_type=args.gpt_type,
                                dtype=jnp.float32)
    vq_params, vcfg = load_vq(args.vq_pt, args.vq_model,
                              args.codebook_size, args.codebook_embed_dim,
                              dtype=jnp.float32)
    gpt_dir = os.path.join(args.out, "gpt")
    vq_dir = os.path.join(args.out, "vq")
    checkpoint.save(gpt_dir, gpt_params)
    checkpoint.save(vq_dir, vq_params)
    print(f"[1/4 convert] PASS  {args.gpt_pt} -> {gpt_dir}, "
          f"{args.vq_pt} -> {vq_dir}")

    # -- 2. oracle gate ---------------------------------------------------
    ran_oracle = False
    if not args.skip_oracle:
        try:
            import sys

            import torch

            if args.reference not in sys.path:
                sys.path.insert(0, args.reference)
            from autoregressive.models import generate as ref_generate
            from autoregressive.models.gpt import GPT_models
            from tokenizer.tokenizer_image.vq_model import VQ_models

            from llamagen_tpu.models import gpt as gpt_lib
            from llamagen_tpu.models import vq as vq_lib
            from llamagen_tpu.ops.generate import generate
            from llamagen_tpu.utils.convert import load_torch_state_dict

            torch.set_grad_enabled(False)
            cpu = jax.devices("cpu")[0]

            ref = GPT_models[args.gpt_model](
                vocab_size=gcfg.vocab_size, block_size=gcfg.block_size,
                num_classes=gcfg.num_classes,
                cls_token_num=gcfg.cls_token_num, model_type=args.gpt_type)
            # strict=False only to tolerate derived buffers (freqs_cis,
            # causal_mask); a MISSING model weight would silently fall back
            # to random init and surface as a confusing logits divergence,
            # so fail fast on anything unexpected (ADVICE r4)
            inc = ref.load_state_dict(
                {k: torch.from_numpy(np.asarray(v)) for k, v in
                 load_torch_state_dict(args.gpt_pt).items()}, strict=False)
            _derived = ("freqs_cis", "causal_mask")
            bad = [k for k in inc.missing_keys
                   if not k.endswith(_derived)]
            assert not bad and not inc.unexpected_keys, (
                f"reference GPT state dict mismatch: missing={bad} "
                f"unexpected={inc.unexpected_keys} — the oracle would run "
                f"on random init for those weights")
            ref = ref.eval().float()

            rng = np.random.RandomState(0)
            b = 2
            labels = rng.randint(0, gcfg.num_classes, size=(b,))
            tokens = rng.randint(0, gcfg.vocab_size, size=(b, oracle_n))
            seqlen = gcfg.cls_token_num + oracle_n - 1
            ref_logits, _ = ref(
                torch.from_numpy(tokens[:, :-1]).long(),
                torch.from_numpy(labels).long(),
                input_pos=torch.arange(seqlen),
                targets=torch.from_numpy(tokens).long())
            ref_logits = ref_logits[:, gcfg.cls_token_num - 1:]
            with jax.default_device(cpu):
                ours, _ = gpt_lib.forward_train(
                    gpt_params, gcfg, jnp.asarray(labels),
                    jnp.asarray(tokens[:, :-1]),
                    targets=jnp.asarray(tokens), train=False)
            err = np.abs(np.asarray(ours)[:, :oracle_n]
                         - ref_logits[:, :oracle_n].numpy()).max()
            assert err < args.oracle_atol, (
                f"teacher-forced GPT logits diverge: max|err|={err:.2e} "
                f"(converter layout bug?)")

            ref_seq = ref_generate.generate(
                ref, torch.from_numpy(labels).long(), oracle_n,
                cfg_scale=2.0, sample_logits=False)
            with jax.default_device(cpu):
                seq = generate(gpt_params, jax.random.PRNGKey(0),
                               jnp.asarray(labels), cfg=gcfg,
                               max_new_tokens=oracle_n, cfg_scale=2.0,
                               sample_logits=False, use_kernel=False,
                               compute_dtype=jnp.float32,
                               cache_dtype=jnp.float32)
            match = (np.asarray(seq) == ref_seq.numpy()).mean()
            assert match == 1.0, f"greedy CFG token parity {match} != 1.0"

            ref_vq = VQ_models[args.vq_model](
                codebook_size=args.codebook_size,
                codebook_embed_dim=args.codebook_embed_dim)
            inc_vq = ref_vq.load_state_dict(
                {k: torch.from_numpy(np.asarray(v)) for k, v in
                 load_torch_state_dict(args.vq_pt).items()}, strict=False)
            assert not inc_vq.missing_keys and not inc_vq.unexpected_keys, (
                f"reference VQ state dict mismatch: "
                f"missing={inc_vq.missing_keys} "
                f"unexpected={inc_vq.unexpected_keys} — the oracle would "
                f"run on random init for those weights")
            ref_vq = ref_vq.eval().float()
            x = np.random.RandomState(42).uniform(
                -1, 1, size=(2, 64, 64, 3)).astype(np.float32)
            _, _, (_, _, ref_idx) = ref_vq.encode(
                torch.from_numpy(x).permute(0, 3, 1, 2))
            with jax.default_device(cpu):
                _, _, idx = vq_lib.encode(vq_params, jnp.asarray(x), vcfg)
            grid = x.shape[1] // vcfg.downsample_factor
            ids_match = (np.asarray(idx).reshape(2, -1)
                         == ref_idx.numpy().reshape(2, -1)).mean()
            assert ids_match == 1.0, (
                f"VQ encode token-id parity {ids_match} != 1.0")
            ref_img = ref_vq.decode_code(
                ref_idx.reshape(2, -1).long(),
                shape=(2, vcfg.codebook_embed_dim, grid, grid))
            with jax.default_device(cpu):
                img = vq_lib.decode_code(vq_params, jnp.asarray(idx), vcfg)
            rec_err = np.abs(np.asarray(img)
                             - ref_img.permute(0, 2, 3, 1).numpy()).max()
            assert rec_err < args.oracle_atol * 10, (
                f"VQ decode_code diverges: max|err|={rec_err:.2e}")
            print(f"[2/4 oracle ] PASS  gpt logits max|err| {err:.1e}; "
                  f"greedy tokens 100%; vq ids 100%; "
                  f"decode max|err| {rec_err:.1e}")
            ran_oracle = True
        except ImportError as e:
            print(f"[2/4 oracle ] SKIP  ({e}; install torch and point "
                  f"--reference at the LlamaGen repo to gate conversion)")
    else:
        print("[2/4 oracle ] SKIP  (--skip-oracle)")

    # -- 3. sample grid ---------------------------------------------------
    from llamagen_tpu.models import vq as vq_lib
    from llamagen_tpu.ops.generate import generate

    panel = [int(c) for c in args.classes.split(",")]
    gp = jax.tree.map(lambda a: jnp.asarray(a, jnp.bfloat16), gpt_params)
    seq = generate(gp, jax.random.PRNGKey(args.seed),
                   jnp.asarray(panel), cfg=gcfg,
                   max_new_tokens=gcfg.block_size, cfg_scale=args.cfg_scale,
                   temperature=1.0, top_k=0, top_p=1.0)
    latent = args.image_size // args.downsample_size
    imgs = vq_lib.decode_code(
        jax.tree.map(lambda a: jnp.asarray(a, jnp.bfloat16), vq_params),
        jnp.asarray(seq).reshape(len(panel), latent, latent), vcfg)
    png = os.path.join(args.out, "sample_grid.png")
    save_image_grid(np.asarray(imgs, np.float32), png, nrow=4)
    print(f"[3/4 sample ] PASS  {png}")

    # -- 4. FID protocol --------------------------------------------------
    # the printed commands must match sample_c2i_fid's REAL interface:
    # --npz is a store_true flag and the sampler names its own output
    # {sample_dir}/{model}-{size}-size-{eval}-cfg-{cfg}-seed-{seed}.npy/.npz
    sample_name = (f"{args.gpt_model}-{args.image_size}-size-256"
                   f"-cfg-{args.cfg_scale}-seed-0")
    print("[4/4 FID protocol] run:")
    print(f"  python -m llamagen_tpu.cli.sample_c2i_fid \\\n"
          f"      --vq-ckpt {vq_dir} --gpt-ckpt {gpt_dir} "
          f"--gpt-model {args.gpt_model} \\\n"
          f"      --image-size {args.image_size} --image-size-eval 256 "
          f"--cfg-scale {args.cfg_scale} \\\n"
          f"      --num-samples 50000 --sample-dir {args.out} --npz")
    print(f"  python -m llamagen_tpu.cli.evaluate "
          f"VIRTUAL_imagenet256_labeled.npz \\\n"
          f"      {args.out}/{sample_name}.npz")
    if not ran_oracle and not args.skip_oracle:
        print("NOTE: oracle gate did not run — conversion is UNGATED "
              "against the reference implementation.")


def cmd_check_codes(args):
    import jax.numpy as jnp

    from llamagen_tpu.cli.common import load_vq, save_image_grid
    from llamagen_tpu.models import vq as vq_lib

    vq_params, vq_cfg = load_vq(args.vq_ckpt, args.vq_model,
                                args.codebook_size, args.codebook_embed_dim)
    if args.codes.endswith(".npy"):
        codes = np.load(args.codes)
    else:
        with np.load(args.codes) as z:
            codes = z["codes"][:args.num]
    codes = codes.reshape(-1, codes.shape[-1])[:args.num]
    grid = int(codes.shape[-1] ** 0.5)
    imgs = vq_lib.decode_code(
        vq_params, jnp.asarray(codes.astype(np.int32)).reshape(-1, grid, grid),
        vq_cfg)
    save_image_grid(np.asarray(imgs.astype(jnp.float32)), args.out, nrow=4)
    print(f"decoded {codes.shape[0]} code grids -> {args.out}")


def class_names():
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "data", "imagenet_classes.json")
    with open(path) as f:
        return json.load(f)


def cmd_export_hub(args):
    """Convert a .pt / orbax checkpoint into a hub-layout directory
    (config.json + model.safetensors), optionally pushing it
    (ref: vq_model_hf.py / gpt_hf.py hub mixins)."""
    from llamagen_tpu.cli.common import load_gpt, load_vq
    from llamagen_tpu.utils import hub

    if args.kind == "gpt":
        params, cfg = load_gpt(args.ckpt, args.model,
                               image_size=args.image_size,
                               model_type=args.model_type)
    else:
        params, cfg = load_vq(args.ckpt, args.model)
    d = hub.save_pretrained(args.out, params, cfg, model_kind=args.kind)
    print(f"saved hub layout to {d}")
    if args.push:
        url = hub.push_to_hub(d, args.push)
        print(f"pushed to {url}")


def _check_images(data_path, chunk):
    """Pool worker for cmd_index_images — module-level so it pickles
    (a local closure crashes mp.Pool with 'Can't get local object')."""
    from PIL import Image

    good = []
    for rel in chunk:
        try:
            with Image.open(os.path.join(data_path, rel)) as im:
                im.verify()
            good.append(rel)
        except Exception:
            pass
    return good


def cmd_index_images(args):
    """Validated image index for folder datasets (openimage_json.py:44-69):
    walk the tree, keep paths whose images actually open, dump json."""
    import multiprocessing as mp

    exts = {".jpg", ".jpeg", ".png", ".gif", ".bmp", ".tiff", ".webp"}
    paths = []
    for root, _, files in os.walk(args.data_path):
        rel_root = os.path.relpath(root, args.data_path)
        for f in sorted(files):
            if os.path.splitext(f)[1].lower() in exts:
                paths.append(f if rel_root == "." else
                             os.path.join(rel_root, f))
    paths.sort()

    workers = args.workers or max(mp.cpu_count() // 2, 4)
    if workers > 1 and len(paths) > 64:
        units = [(args.data_path, paths[i::workers]) for i in range(workers)]
        with mp.Pool(processes=workers) as pool:
            valid = sorted(
                p for sub in pool.starmap(_check_images, units) for p in sub)
    else:
        valid = _check_images(args.data_path, paths)
    out = args.out or os.path.join(args.data_path, "image_paths.json")
    with open(out, "w") as fh:
        json.dump(valid, fh, indent=4)
    print(f"{len(valid)}/{len(paths)} valid image paths -> {out}")


def cmd_plot_metrics(args):
    """Training-curve figures from metrics.jsonl (draw_figure.py rendered
    from recorded runs; matplotlib gated)."""
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError:
        raise SystemExit("plot-metrics needs matplotlib")

    fig, axes = plt.subplots(1, 2, figsize=(11, 4))
    for exp_dir in args.exp_dirs:
        path = (exp_dir if exp_dir.endswith(".jsonl")
                else os.path.join(exp_dir, "metrics.jsonl"))
        steps, losses, sps = [], [], []
        with open(path) as fh:
            for line in fh:
                rec = json.loads(line)
                if "loss" in rec:
                    steps.append(rec["step"])
                    losses.append(rec["loss"])
                    sps.append(rec.get("samples_per_sec"))
        label = os.path.basename(os.path.normpath(exp_dir))
        axes[0].plot(steps, losses, label=label)
        if any(v is not None for v in sps):
            axes[1].plot(steps, sps, label=label)
    axes[0].set_xlabel("step"), axes[0].set_ylabel("loss")
    axes[1].set_xlabel("step"), axes[1].set_ylabel("samples/s")
    for ax in axes:
        ax.legend(framealpha=0.5)
    fig.tight_layout()
    fig.savefig(args.out, dpi=args.dpi)
    print(f"figure -> {args.out}")


def cmd_class_name(args):
    names = class_names()
    for cid in args.ids:
        print(f"{cid}: {names[str(cid)]}")


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)

    c = sub.add_parser("convert-ckpt")
    c.add_argument("--kind", choices=["gpt", "vq"], required=True)
    c.add_argument("--in", dest="input", required=True)
    c.add_argument("--out", dest="output", required=True)
    c.add_argument("--gpt-model", default="GPT-B")
    c.add_argument("--vq-model", default="VQ-16")
    c.add_argument("--model-type", default="c2i")
    c.add_argument("--image-size", type=int, default=256)
    c.add_argument("--downsample-size", type=int, default=16)
    c.add_argument("--codebook-size", type=int, default=16384)
    c.add_argument("--codebook-embed-dim", type=int, default=8)
    c.set_defaults(fn=cmd_convert_ckpt)

    q = sub.add_parser("quantize-ckpt")
    q.add_argument("--in", dest="input", required=True)
    q.add_argument("--out", dest="output", required=True)
    q.add_argument("--mode", default="int8", choices=["int8", "w4", "w4-pc"])
    q.add_argument("--gpt-model", default="GPT-B")
    q.add_argument("--model-type", default="c2i", choices=["c2i", "t2i"])
    q.add_argument("--image-size", type=int, default=256)
    q.add_argument("--downsample-size", type=int, default=16)
    q.add_argument("--quantize-head", action="store_true")
    q.add_argument("--method", default="rtn", choices=["rtn", "gptq"],
                   help="w4 level chooser: rtn (default) or calibrated "
                        "gptq error compensation (recommended for real "
                        "checkpoints; see BENCH.md W4 quality study)")
    q.add_argument("--awq", action="store_true",
                   help="AWQ activation-aware equalization pre-pass "
                        "(ops/awq.py); composes with either --method")
    q.add_argument("--group", type=int, default=128,
                   help="w4 group-scale rows (64/128/256)")
    q.add_argument("--calib-codes", default=None,
                   help="gptq calibration: .npy code dump [N, L]")
    q.add_argument("--calib-samples", type=int, default=128)
    q.add_argument("--calib-seed", type=int, default=0)
    q.set_defaults(fn=cmd_quantize_ckpt)

    v = sub.add_parser("validate-release",
                       help="released-weights runbook: convert + oracle "
                            "parity gate + sample grid + FID protocol")
    v.add_argument("--gpt-pt", required=True,
                   help="released GPT checkpoint (.pt) or orbax dir")
    v.add_argument("--vq-pt", required=True,
                   help="released VQ checkpoint (.pt) or orbax dir")
    v.add_argument("--out", required=True, help="output directory")
    v.add_argument("--gpt-model", default="GPT-B")
    v.add_argument("--vq-model", default="VQ-16")
    v.add_argument("--gpt-type", default="c2i", choices=["c2i"])
    v.add_argument("--image-size", type=int, default=384)
    v.add_argument("--downsample-size", type=int, default=16)
    v.add_argument("--codebook-size", type=int, default=16384)
    v.add_argument("--codebook-embed-dim", type=int, default=8)
    v.add_argument("--cfg-scale", type=float, default=2.0)
    v.add_argument("--seed", type=int, default=0)
    v.add_argument("--classes", default="207,360,387,974,88,979,417,279",
                   help="sample-grid class panel (ref demo classes)")
    v.add_argument("--reference", default="/root/reference",
                   help="LlamaGen repo path for the torch oracle gate")
    v.add_argument("--skip-oracle", action="store_true")
    v.add_argument("--oracle-tokens", type=int, default=16,
                   help="teacher-forced/greedy positions for the gate "
                        "(larger = stronger gate, slower torch-CPU pass)")
    v.add_argument("--oracle-atol", type=float, default=5e-3,
                   help="max abs logits error allowed at f32 "
                        "(trained-checkpoint logits are O(10); the "
                        "in-repo synthetic gate passes at 2e-4)")
    v.set_defaults(fn=cmd_validate_release)

    k = sub.add_parser("check-codes")
    k.add_argument("--codes", required=True, help=".npy or packed .npz")
    k.add_argument("--vq-ckpt", default=None)
    k.add_argument("--vq-model", default="VQ-16")
    k.add_argument("--codebook-size", type=int, default=16384)
    k.add_argument("--codebook-embed-dim", type=int, default=8)
    k.add_argument("--num", type=int, default=16)
    k.add_argument("--out", default="check_codes.png")
    k.set_defaults(fn=cmd_check_codes)

    h = sub.add_parser("export-hub")
    h.add_argument("--kind", choices=["gpt", "vq"], required=True)
    h.add_argument("--model", required=True)
    h.add_argument("--ckpt", default=None)
    h.add_argument("--image-size", type=int, default=256)
    h.add_argument("--model-type", default="c2i")
    h.add_argument("--out", required=True)
    h.add_argument("--push", default=None,
                   help="hub repo id (requires egress + HF credentials)")
    h.set_defaults(fn=cmd_export_hub)

    n = sub.add_parser("class-name")
    n.add_argument("ids", type=int, nargs="+")
    n.set_defaults(fn=cmd_class_name)

    # "openimage-json" is an alias: this IS the openimage_json.py
    # equivalent (same output file consumed by data.t2i's json datasets)
    for alias in ("index-images", "openimage-json"):
        ii = sub.add_parser(alias)
        ii.add_argument("--data-path", required=True)
        ii.add_argument("--out", default=None,
                        help="default: <data-path>/image_paths.json")
        ii.add_argument("--workers", type=int, default=0)
        ii.set_defaults(fn=cmd_index_images)

    pm = sub.add_parser("plot-metrics")
    pm.add_argument("exp_dirs", nargs="+",
                    help="experiment dirs (or metrics.jsonl paths)")
    pm.add_argument("--out", default="metrics.png")
    pm.add_argument("--dpi", type=int, default=200)
    pm.set_defaults(fn=cmd_plot_metrics)

    args = p.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
