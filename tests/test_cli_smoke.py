"""End-to-end CLI smoke tests with tiny models on CPU.

Drives the actual argparse entry points (the surfaces a user runs), not
internal functions — catches wiring bugs the unit tests can't.
"""

import os

import numpy as np
import pytest

import conftest  # noqa: F401

import pytest as _pytest

pytestmark = _pytest.mark.slow  # engine/e2e tier (pyproject markers)


def _make_tiny_image_folder(root, n=6, size=32):
    from PIL import Image

    rng = np.random.RandomState(0)
    for cls in ["class_a", "class_b"]:
        d = os.path.join(root, cls)
        os.makedirs(d, exist_ok=True)
        for i in range(n // 2):
            arr = rng.randint(0, 255, (size, size, 3), dtype=np.uint8)
            Image.fromarray(arr).save(os.path.join(d, f"{i}.png"))


def test_sample_c2i_cli(tmp_path):
    from llamagen_tpu.cli import sample_c2i

    out = str(tmp_path / "grid.png")
    sample_c2i.main([
        "--gpt-model", "GPT-nano", "--vq-model", "VQ-8",
        "--codebook-size", "64", "--codebook-embed-dim", "4",
        "--image-size", "256", "--downsample-size", "8",
        "--classes", "1", "2", "--cfg-scale", "1.5",
        "--precision", "f32", "--out", out])
    assert os.path.exists(out)


def test_sample_c2i_cli_speculative(tmp_path):
    from llamagen_tpu.cli import sample_c2i

    out = str(tmp_path / "grid_spec.png")
    sample_c2i.main([
        "--gpt-model", "GPT-nano", "--vq-model", "VQ-16",
        "--codebook-size", "64", "--codebook-embed-dim", "4",
        "--image-size", "256", "--downsample-size", "16",
        "--classes", "1", "2", "--cfg-scale", "1.5",
        "--draft-gpt-model", "GPT-nano", "--spec-k", "3",
        "--precision", "f32", "--out", out])
    assert os.path.exists(out)


def test_train_c2i_cli_synthetic(tmp_path):
    from llamagen_tpu.cli import train_c2i

    train_c2i.main([
        "--synthetic-steps", "3", "--gpt-model", "GPT-nano",
        "--image-size", "128", "--downsample-size", "16",
        "--global-batch-size", "8", "--log-every", "1",
        "--ckpt-every", "1000", "--results-dir", str(tmp_path)])
    assert os.path.exists(str(tmp_path / "checkpoints"))
    # metrics stream (ref wandb hookup -> metrics.jsonl + opt-in mirror)
    import json
    recs = [json.loads(l) for l in open(tmp_path / "metrics.jsonl")]
    steps = [r["step"] for r in recs if "loss" in r]
    assert steps == [1, 2, 3]
    assert all(np.isfinite(r["loss"]) for r in recs if "loss" in r)


def test_train_vq_cli_synthetic(tmp_path):
    from llamagen_tpu.cli import train_vq

    train_vq.main([
        "--synthetic-steps", "2", "--vq-model", "VQ-8",
        "--codebook-size", "32", "--codebook-embed-dim", "4",
        "--image-size", "32", "--global-batch-size", "2",
        "--disc-start", "1", "--log-every", "1",
        "--ckpt-every", "1000", "--results-dir", str(tmp_path)])
    assert os.path.exists(str(tmp_path / "checkpoints"))


def test_extract_and_reconstruct_cli(tmp_path):
    from llamagen_tpu.cli import extract_codes, reconstruction_vq

    data_dir = str(tmp_path / "imgs")
    _make_tiny_image_folder(data_dir)
    out_dir = str(tmp_path / "codes")
    extract_codes.main([
        "--data-path", data_dir, "--out-dir", out_dir,
        "--vq-model", "VQ-8", "--codebook-size", "64",
        "--codebook-embed-dim", "4", "--image-size", "32",
        "--batch-size", "4"])
    shards = [f for f in os.listdir(out_dir) if f.endswith(".codes.npy")]
    assert shards
    codes = np.load(os.path.join(out_dir, shards[0]))
    assert codes.shape[1] == 16  # 32/8 = 4x4 grid

    # ten-crop augmentation (ref extract_codes_c2i.py:55-62): 10 per image
    tc_dir = str(tmp_path / "codes_tc")
    extract_codes.main([
        "--data-path", data_dir, "--out-dir", tc_dir,
        "--vq-model", "VQ-8", "--codebook-size", "64",
        "--codebook-embed-dim", "4", "--image-size", "32",
        "--ten-crop", "--batch-size", "20"])
    tc = [f for f in os.listdir(tc_dir) if f.endswith(".codes.npy")]
    tc_codes = np.load(os.path.join(tc_dir, tc[0]))
    assert tc_codes.shape[1:] == (10, 16)

    reconstruction_vq.main([
        "--data-path", data_dir, "--vq-model", "VQ-8",
        "--codebook-size", "64", "--codebook-embed-dim", "4",
        "--image-size", "32", "--batch-size", "4", "--max-images", "4"])


def test_extract_codes_jsonl(tmp_path):
    """t2i jsonl extraction end-to-end: codes keyed by caption_idx."""
    import json

    from llamagen_tpu.cli import extract_codes
    from llamagen_tpu.data.codes import PackedCodeDataset

    data_dir = str(tmp_path / "imgs")
    _make_tiny_image_folder(data_dir)
    paths = []
    for root, _, files in os.walk(data_dir):
        paths += [os.path.join(root, f) for f in files]
    jsonl = str(tmp_path / "items.jsonl")
    with open(jsonl, "w") as f:
        for i, p in enumerate(sorted(paths)):
            f.write(json.dumps({"image_path": p, "caption_idx": i}) + "\n")

    out_dir = str(tmp_path / "codes_t2i")
    extract_codes.main([
        "--jsonl", jsonl, "--out-dir", out_dir,
        "--vq-model", "VQ-8", "--codebook-size", "64",
        "--codebook-embed-dim", "4", "--image-size", "32",
        "--batch-size", "4"])
    ds = PackedCodeDataset(out_dir)
    codes, caption_idx = next(ds.batches(len(paths), epochs=1))
    assert sorted(caption_idx.tolist()) == list(range(len(paths)))
    assert codes.shape == (len(paths), 16)


def test_tools_check_codes_cli(tmp_path):
    from llamagen_tpu.cli import tools

    codes = np.random.RandomState(0).randint(0, 64, (4, 16)).astype(np.int16)
    np.savez(str(tmp_path / "shard.npz"), codes=codes,
             labels=np.zeros(4, np.int16))
    out = str(tmp_path / "decoded.png")
    tools.main(["check-codes", "--codes", str(tmp_path / "shard.npz"),
                "--vq-model", "VQ-8", "--codebook-size", "64",
                "--codebook-embed-dim", "4", "--num", "4", "--out", out])
    assert os.path.exists(out)


def test_tools_quantize_ckpt_cli(tmp_path):
    """quantize-ckpt produces an orbax dir whose key layout every decode
    path dispatches on; a round-trip restore must generate."""
    import jax
    import jax.numpy as jnp

    from llamagen_tpu.cli import tools
    from llamagen_tpu.cli.common import load_gpt
    from llamagen_tpu.models import gpt as gpt_lib
    from llamagen_tpu.ops.generate import generate
    from llamagen_tpu.utils import checkpoint

    cfg_kw = dict(image_size=64, downsample_size=16)  # 4x4 grid
    params, cfg = load_gpt(None, "GPT-nano", **cfg_kw)
    src = str(tmp_path / "src_ckpt")
    checkpoint.save(src, params)

    for mode, key in (("int8", "wqkv_q"), ("w4", "wqkv_w4b")):
        out = str(tmp_path / f"ckpt_{mode}")
        tools.main(["quantize-ckpt", "--in", src, "--out", out,
                    "--mode", mode, "--gpt-model", "GPT-nano",
                    "--image-size", "64"])
        qp, qcfg = load_gpt(out, "GPT-nano", **cfg_kw)
        assert key in qp["layers"], sorted(qp["layers"])
        seq = np.asarray(generate(
            qp, jax.random.PRNGKey(0), jnp.asarray([1, 2]), cfg=qcfg,
            max_new_tokens=qcfg.block_size, cfg_scale=2.0,
            compute_dtype=jnp.float32, cache_dtype=jnp.float32))
        assert seq.shape == (2, qcfg.block_size)


def test_tools_index_images_and_plot_metrics(tmp_path):
    """index-images drops unreadable files (openimage_json.py:44-69);
    plot-metrics renders training curves from metrics.jsonl."""
    import json

    from PIL import Image

    from llamagen_tpu.cli import tools

    d = tmp_path / "imgs"
    (d / "sub").mkdir(parents=True)
    img = Image.fromarray(np.zeros((8, 8, 3), np.uint8))
    img.save(d / "a.png")
    img.save(d / "sub" / "b.jpg")
    (d / "bad.png").write_text("not an image")
    tools.main(["index-images", "--data-path", str(d), "--workers", "1"])
    idx = json.load(open(d / "image_paths.json"))
    assert idx == ["a.png", os.path.join("sub", "b.jpg")]

    with open(tmp_path / "metrics.jsonl", "w") as fh:
        for s in range(1, 4):
            fh.write(json.dumps({"step": s, "loss": 5.0 / s,
                                 "samples_per_sec": 100.0}) + "\n")
    out = str(tmp_path / "fig.png")
    tools.main(["plot-metrics", str(tmp_path / "metrics.jsonl"),
                "--out", out])
    assert os.path.getsize(out) > 1000


def test_sample_t2i_cli_random_embeddings(tmp_path):
    from llamagen_tpu.cli import sample_t2i

    out = str(tmp_path / "t2i.png")
    sample_t2i.main([
        "--gpt-model", "GPT-nano", "--vq-model", "VQ-8",
        "--codebook-size", "64", "--codebook-embed-dim", "4",
        "--image-size", "256", "--downsample-size", "8",
        "--prompts", "a cat", "--cls-token-num", "8",
        "--cfg-scale", "1.5", "--top-k", "10",
        "--precision", "f32", "--out", out])
    assert os.path.exists(out)


def test_sample_t2i_cli_speculative(tmp_path):
    from llamagen_tpu.cli import sample_t2i

    out = str(tmp_path / "t2i_spec.png")
    sample_t2i.main([
        "--gpt-model", "GPT-nano", "--vq-model", "VQ-16",
        "--codebook-size", "64", "--codebook-embed-dim", "4",
        "--image-size", "256", "--downsample-size", "16",
        "--prompts", "a cat", "--cls-token-num", "8",
        "--cfg-scale", "1.5", "--top-k", "10",
        "--draft-gpt-model", "GPT-nano", "--spec-k", "3",
        "--precision", "f32", "--out", out])
    assert os.path.exists(out)


def test_train_t2i_cli_synthetic(tmp_path):
    from llamagen_tpu.cli import train_t2i

    train_t2i.main([
        "--synthetic-steps", "2", "--gpt-model", "GPT-nano",
        "--vq-model", "VQ-8", "--image-size", "32",
        "--downsample-size", "8", "--global-batch-size", "8",
        "--log-every", "1", "--ckpt-every", "1000",
        "--results-dir", str(tmp_path)])
    assert os.path.exists(str(tmp_path / "checkpoints"))


def test_train_t2i_cli_jsonl(tmp_path):
    """End-to-end over a real jsonl + T5-feature dir (ref t2i data layout),
    including one corrupt sample exercising the valid-mask path."""
    import json

    import numpy as np
    from PIL import Image

    from llamagen_tpu.cli import train_t2i

    feat_dir = tmp_path / "t5"
    feat_dir.mkdir()
    rows = []
    rng = np.random.RandomState(0)
    for i in range(8):
        img_path = str(tmp_path / f"img_{i}.png")
        if i != 2:  # sample 2: missing image -> dummy_data + valid=0
            Image.fromarray(
                rng.randint(0, 255, (40, 40, 3), dtype=np.uint8)
            ).save(img_path)
        np.savez(str(feat_dir / f"{i}.npz"),
                 feature=rng.randn(5, 64).astype(np.float16),
                 mask=np.ones(5, np.int32))
        rows.append({"image_path": img_path, "caption_idx": i})
    jsonl = str(tmp_path / "items.jsonl")
    with open(jsonl, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")

    train_t2i.main([
        "--jsonl", jsonl, "--t5-feature-dir", str(feat_dir),
        "--gpt-model", "GPT-nano", "--vq-model", "VQ-8",
        "--image-size", "32", "--downsample-size", "8",
        "--cls-token-num", "8", "--caption-dim", "64",
        "--global-batch-size", "8", "--max-steps", "2", "--epochs", "2",
        "--log-every", "1", "--ckpt-every", "1000",
        "--results-dir", str(tmp_path / "out")])
    assert os.path.exists(str(tmp_path / "out" / "checkpoints"))


def test_sample_t2i_fid_and_evaluate_t2i_cli(tmp_path):
    """Full t2i eval loop: prompt file -> sampled images + result.jsonl ->
    evaluate_t2i FID (random weights end to end)."""
    import numpy as np

    from llamagen_tpu.cli import evaluate_t2i, sample_t2i_fid

    prompts = tmp_path / "prompts.txt"
    prompts.write_text("a red square\na blue circle\nthree green dots\n")
    sample_dir = str(tmp_path / "out")
    sample_t2i_fid.main([
        "--prompt-file", str(prompts), "--random-t5",
        "--gpt-model", "GPT-nano", "--vq-model", "VQ-8",
        "--codebook-size", "64", "--codebook-embed-dim", "4",
        "--image-size", "32", "--downsample-size", "8",
        "--cls-token-num", "8", "--per-proc-batch-size", "2",
        "--sample-dir", sample_dir])
    assert os.path.exists(os.path.join(sample_dir, "result.jsonl"))

    ref = str(tmp_path / "ref.npz")
    rng = np.random.RandomState(0)
    np.savez(ref, arr_0=rng.randint(0, 255, (4, 32, 32, 3), dtype=np.uint8))
    evaluate_t2i.main(["--result", os.path.join(sample_dir, "result.jsonl"),
                       "--ref-batch", ref, "--batch-size", "2"])
    assert os.path.exists(os.path.join(sample_dir, "result_eval.txt"))


def test_validate_release_runbook(tmp_path, capsys):
    """Drives `tools validate-release` end-to-end on synthetic stand-in
    "released" checkpoints saved in the reference's .pt dict layout,
    INCLUDING the torch oracle gate — so the day real weights land, the
    validated command path already exists (VERDICT r3 item 7). A tiny
    GPT config stands in for the zoo names (same code path); the VQ is
    the real VQ-16 architecture."""
    torch = pytest.importorskip("torch")
    conftest.add_reference_to_path()
    from autoregressive.models.gpt import GPT_models, ModelArgs, Transformer
    from tokenizer.tokenizer_image.vq_model import VQ_models

    from llamagen_tpu.cli import tools

    GPT_models["GPT-nano"] = lambda **kw: Transformer(
        ModelArgs(dim=128, n_layer=2, n_head=2, **kw))
    torch.manual_seed(0)
    latent = 32 // 16
    ref_gpt = GPT_models["GPT-nano"](
        vocab_size=16384, block_size=latent * latent, num_classes=1000,
        cls_token_num=1, model_type="c2i")
    torch.nn.init.normal_(ref_gpt.output.weight, std=0.02)
    gpt_pt = str(tmp_path / "c2i_nano_32.pt")
    torch.save({"model": ref_gpt.state_dict()}, gpt_pt)

    torch.manual_seed(1)
    ref_vq = VQ_models["VQ-16"]()
    vq_pt = str(tmp_path / "vq_ds16_c2i.pt")
    torch.save({"model": ref_vq.state_dict()}, vq_pt)

    out = str(tmp_path / "release")
    tools.main(["validate-release", "--gpt-pt", gpt_pt, "--vq-pt", vq_pt,
                "--out", out, "--gpt-model", "GPT-nano",
                "--image-size", "32", "--oracle-tokens", "4",
                "--classes", "1,2,3,4"])
    text = capsys.readouterr().out
    assert "[2/4 oracle ] PASS" in text, text   # the gate actually ran
    assert os.path.exists(os.path.join(out, "sample_grid.png"))
    # converted dirs restore into the normal loaders
    from llamagen_tpu.cli.common import load_gpt, load_vq
    load_gpt(os.path.join(out, "gpt"), "GPT-nano", 32, 16)
    load_vq(os.path.join(out, "vq"), "VQ-16")
