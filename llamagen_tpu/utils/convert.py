"""PyTorch checkpoint -> llamagen_tpu params conversion.

Converts the released LlamaGen `.pt` state dicts (layouts documented at
`/root/reference/autoregressive/sample/sample_c2i.py:48-58`: raw fsdp dict,
{"model"}, {"module"}, {"state_dict"}) into this framework's param pytrees.

Layout transforms:
  - Conv2d weight  [O, I, kh, kw]  -> HWIO [kh, kw, I, O]
  - 1x1 convs used as pointwise layers (attn q/k/v/proj, nin_shortcut)
                                    -> dense kernel [I, O]
  - Linear weight  [O, I]          -> dense kernel [I, O]
  - per-layer GPT tensors          -> stacked [L, ...] for scan-over-layers

torch is only imported lazily; conversion also accepts a plain
{name: np.ndarray} mapping.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import numpy as np

from llamagen_tpu.config import GPTConfig, VQConfig


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a .pt checkpoint into numpy arrays, unwrapping trainer dicts."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    for key in ("model", "module", "state_dict", "ema"):
        if isinstance(ckpt, dict) and key in ckpt and isinstance(ckpt[key], dict):
            ckpt = ckpt[key]
            break
    out = {}
    for k, v in ckpt.items():
        if hasattr(v, "detach"):
            out[k] = v.detach().to(torch.float32).cpu().numpy()
    return out


def _strip_prefixes(sd: Mapping[str, np.ndarray]) -> Dict[str, np.ndarray]:
    out = {}
    for k, v in sd.items():
        for prefix in ("module.", "_orig_mod."):
            if k.startswith(prefix):
                k = k[len(prefix):]
        out[k] = np.asarray(v)
    return out


def _conv(sd, name) -> Dict[str, np.ndarray]:
    w = sd[f"{name}.weight"]  # [O, I, kh, kw]
    return {"kernel": np.transpose(w, (2, 3, 1, 0)), "bias": sd[f"{name}.bias"]}


def _pointwise(sd, name) -> Dict[str, np.ndarray]:
    """1x1 conv -> dense [I, O]."""
    w = sd[f"{name}.weight"]
    if w.ndim == 4:
        w = w[:, :, 0, 0]
    p = {"kernel": np.transpose(w, (1, 0))}
    if f"{name}.bias" in sd:
        p["bias"] = sd[f"{name}.bias"]
    return p


def _linear(sd, name) -> Dict[str, np.ndarray]:
    p = {"kernel": np.transpose(sd[f"{name}.weight"], (1, 0))}
    if f"{name}.bias" in sd:
        p["bias"] = sd[f"{name}.bias"]
    return p


def _gn(sd, name) -> Dict[str, np.ndarray]:
    return {"scale": sd[f"{name}.weight"], "bias": sd[f"{name}.bias"]}


def _res(sd, name) -> Dict[str, np.ndarray]:
    p = {
        "norm1": _gn(sd, f"{name}.norm1"),
        "conv1": _conv(sd, f"{name}.conv1"),
        "norm2": _gn(sd, f"{name}.norm2"),
        "conv2": _conv(sd, f"{name}.conv2"),
    }
    if f"{name}.nin_shortcut.weight" in sd:
        p["nin_shortcut"] = _pointwise(sd, f"{name}.nin_shortcut")
    return p


def _attn(sd, name) -> Dict[str, np.ndarray]:
    return {
        "norm": _gn(sd, f"{name}.norm"),
        "q": _pointwise(sd, f"{name}.q"),
        "k": _pointwise(sd, f"{name}.k"),
        "v": _pointwise(sd, f"{name}.v"),
        "proj_out": _pointwise(sd, f"{name}.proj_out"),
    }


# ---------------------------------------------------------------------------
# VQ-VAE
# ---------------------------------------------------------------------------


def convert_vq(sd: Mapping[str, np.ndarray], cfg: VQConfig) -> Dict[str, Any]:
    """Reference VQModel state dict -> llamagen_tpu.models.vq params."""
    sd = _strip_prefixes(sd)
    num_res_e = len(cfg.encoder_ch_mult)
    num_res_d = len(cfg.decoder_ch_mult)

    enc: Dict[str, Any] = {"conv_in": _conv(sd, "encoder.conv_in"), "down": []}
    for i in range(num_res_e):
        base = f"encoder.conv_blocks.{i}"
        level: Dict[str, Any] = {"res": [], "attn": []}
        for j in range(cfg.num_res_blocks):
            level["res"].append(_res(sd, f"{base}.res.{j}"))
            if i == num_res_e - 1:
                level["attn"].append(_attn(sd, f"{base}.attn.{j}"))
        if i != num_res_e - 1:
            level["downsample"] = {"conv": _conv(sd, f"{base}.downsample.conv")}
        enc["down"].append(level)
    enc["mid"] = [_res(sd, "encoder.mid.0"), _attn(sd, "encoder.mid.1"),
                  _res(sd, "encoder.mid.2")]
    enc["norm_out"] = _gn(sd, "encoder.norm_out")
    enc["conv_out"] = _conv(sd, "encoder.conv_out")

    dec: Dict[str, Any] = {"conv_in": _conv(sd, "decoder.conv_in")}
    dec["mid"] = [_res(sd, "decoder.mid.0"), _attn(sd, "decoder.mid.1"),
                  _res(sd, "decoder.mid.2")]
    dec["up"] = []
    # decoder conv_blocks are built for reversed(range(num_res)) and applied
    # in list order (ref: vq_model.py:146-163,182-188) — list index i is the
    # i-th applied level, which is what our decoder_apply expects.
    for i in range(num_res_d):
        base = f"decoder.conv_blocks.{i}"
        level: Dict[str, Any] = {"res": [], "attn": []}
        for j in range(cfg.num_res_blocks + 1):
            level["res"].append(_res(sd, f"{base}.res.{j}"))
            if i == 0:
                level["attn"].append(_attn(sd, f"{base}.attn.{j}"))
        if i != num_res_d - 1:
            level["upsample"] = {"conv": _conv(sd, f"{base}.upsample.conv")}
        dec["up"].append(level)
    dec["norm_out"] = _gn(sd, "decoder.norm_out")
    dec["conv_out"] = _conv(sd, "decoder.conv_out")

    return {
        "encoder": enc,
        "decoder": dec,
        "quant_conv": _conv(sd, "quant_conv"),
        "post_quant_conv": _conv(sd, "post_quant_conv"),
        "quantize": {"codebook": sd["quantize.embedding.weight"]},
    }


# ---------------------------------------------------------------------------
# GPT
# ---------------------------------------------------------------------------


def convert_gpt(sd: Mapping[str, np.ndarray], cfg: GPTConfig) -> Dict[str, Any]:
    """Reference Transformer state dict -> llamagen_tpu.models.gpt params.

    Per-layer weights are stacked along a leading layer axis for
    lax.scan-over-layers. Linear kernels transposed to [in, out].
    """
    sd = _strip_prefixes(sd)
    L = cfg.n_layer

    def stack_linear(fmt: str) -> np.ndarray:
        return np.stack([np.transpose(sd[fmt.format(i)], (1, 0)) for i in range(L)])

    def stack_raw(fmt: str) -> np.ndarray:
        return np.stack([sd[fmt.format(i)] for i in range(L)])

    layers = {
        "attention_norm": stack_raw("layers.{}.attention_norm.weight"),
        "ffn_norm": stack_raw("layers.{}.ffn_norm.weight"),
        "wqkv": stack_linear("layers.{}.attention.wqkv.weight"),
        "wo": stack_linear("layers.{}.attention.wo.weight"),
        "w1": stack_linear("layers.{}.feed_forward.w1.weight"),
        "w2": stack_linear("layers.{}.feed_forward.w2.weight"),
        "w3": stack_linear("layers.{}.feed_forward.w3.weight"),
    }

    params: Dict[str, Any] = {
        "tok_embeddings": sd["tok_embeddings.weight"],
        "layers": layers,
        "norm": sd["norm.weight"],
        "output": np.transpose(sd["output.weight"], (1, 0)),
    }

    if cfg.model_type == "c2i":
        params["cls_embedding"] = {
            "embedding_table": sd["cls_embedding.embedding_table.weight"]}
    else:  # t2i
        params["cls_embedding"] = {
            "fc1": {"kernel": np.transpose(sd["cls_embedding.cap_proj.fc1.weight"], (1, 0))},
            "fc2": {"kernel": np.transpose(sd["cls_embedding.cap_proj.fc2.weight"], (1, 0))},
            "uncond_embedding": sd["cls_embedding.uncond_embedding"],
        }
    return params


# ---------------------------------------------------------------------------
# Taming-transformers VQGAN checkpoints (baseline-tokenizer compat;
# ref: /root/reference/tokenizer/vqgan/{model,layer,quantize}.py)
# ---------------------------------------------------------------------------


def convert_taming_vq(sd: Mapping[str, np.ndarray], cfg: VQConfig) -> Dict[str, Any]:
    """CompVis taming VQModel state dict -> llamagen_tpu.models.vq params.

    Valid for the configs the reference ships (vqgan_imagenet_f16_*,
    vqgan_openimage_f8_*): their attn_resolutions place attention exactly at
    the lowest level, matching our architecture; the codebook is NOT
    l2-normalized (use VQConfig(codebook_l2_norm=False)).

    Key-layout differences vs the reference's own VQModel:
      encoder down.{i}.block.{j} / attn.{j} / downsample.conv;
      mid.block_1 / attn_1 / block_2; decoder up.{i} indexed by LEVEL
      (applied in reversed order) instead of application order.
    """
    sd = _strip_prefixes(sd)
    num_res_e = len(cfg.encoder_ch_mult)
    num_res_d = len(cfg.decoder_ch_mult)

    enc: Dict[str, Any] = {"conv_in": _conv(sd, "encoder.conv_in"), "down": []}
    for i in range(num_res_e):
        level: Dict[str, Any] = {"res": [], "attn": []}
        for j in range(cfg.num_res_blocks):
            level["res"].append(_res(sd, f"encoder.down.{i}.block.{j}"))
            if f"encoder.down.{i}.attn.{j}.norm.weight" in sd:
                level["attn"].append(_attn(sd, f"encoder.down.{i}.attn.{j}"))
        if i != num_res_e - 1:
            level["downsample"] = {
                "conv": _conv(sd, f"encoder.down.{i}.downsample.conv")}
        enc["down"].append(level)
    assert len(enc["down"][-1]["attn"]) == cfg.num_res_blocks, (
        "taming checkpoint places attention away from the lowest level — "
        "unsupported architecture")
    enc["mid"] = [_res(sd, "encoder.mid.block_1"),
                  _attn(sd, "encoder.mid.attn_1"),
                  _res(sd, "encoder.mid.block_2")]
    enc["norm_out"] = _gn(sd, "encoder.norm_out")
    enc["conv_out"] = _conv(sd, "encoder.conv_out")

    dec: Dict[str, Any] = {"conv_in": _conv(sd, "decoder.conv_in")}
    dec["mid"] = [_res(sd, "decoder.mid.block_1"),
                  _attn(sd, "decoder.mid.attn_1"),
                  _res(sd, "decoder.mid.block_2")]
    dec["up"] = []
    # taming stores up.{level} and applies reversed; ours is application order
    for applied, level_idx in enumerate(reversed(range(num_res_d))):
        base = f"decoder.up.{level_idx}"
        level = {"res": [], "attn": []}
        for j in range(cfg.num_res_blocks + 1):
            level["res"].append(_res(sd, f"{base}.block.{j}"))
            if f"{base}.attn.{j}.norm.weight" in sd:
                level["attn"].append(_attn(sd, f"{base}.attn.{j}"))
        if level_idx != 0:
            level["upsample"] = {"conv": _conv(sd, f"{base}.upsample.conv")}
        dec["up"].append(level)
    dec["norm_out"] = _gn(sd, "decoder.norm_out")
    dec["conv_out"] = _conv(sd, "decoder.conv_out")

    return {
        "encoder": enc,
        "decoder": dec,
        "quant_conv": _conv(sd, "quant_conv"),
        "post_quant_conv": _conv(sd, "post_quant_conv"),
        "quantize": {"codebook": sd["quantize.embedding.weight"]},
    }


# taming config presets (yaml params in tokenizer/vqgan/configs/*.yaml)
def taming_vq_config(name: str) -> VQConfig:
    presets = {
        "vqgan_imagenet_f16_1024": dict(
            codebook_size=1024, codebook_embed_dim=256,
            encoder_ch_mult=(1, 1, 2, 2, 4), decoder_ch_mult=(1, 1, 2, 2, 4)),
        "vqgan_imagenet_f16_16384": dict(
            codebook_size=16384, codebook_embed_dim=256,
            encoder_ch_mult=(1, 1, 2, 2, 4), decoder_ch_mult=(1, 1, 2, 2, 4)),
        "vqgan_openimage_f8_256": dict(
            codebook_size=256, codebook_embed_dim=4,
            encoder_ch_mult=(1, 2, 2, 4), decoder_ch_mult=(1, 2, 2, 4)),
        "vqgan_openimage_f8_16384": dict(
            codebook_size=16384, codebook_embed_dim=4,
            encoder_ch_mult=(1, 2, 2, 4), decoder_ch_mult=(1, 2, 2, 4)),
    }
    return VQConfig(codebook_l2_norm=False, **presets[name])


# ---------------------------------------------------------------------------
# Discriminators (for VQ-GAN checkpoint resume)
# ---------------------------------------------------------------------------


def convert_patchgan(sd: Mapping[str, np.ndarray], n_layers: int = 3) -> Dict[str, Any]:
    """Reference NLayerDiscriminator state dict -> our patchgan params.

    Sequential layout (ref discriminator_patchgan.py:30-54): conv@0, then
    (conv, norm, leaky) triplets, final 1-channel conv at the end.
    """
    sd = _strip_prefixes(sd)
    convs = [_conv(sd, "main.0")]
    norms = []
    for i in range(n_layers):
        conv_idx = 2 + 3 * i
        name = f"main.{conv_idx}"
        w = sd[f"{name}.weight"]
        convs.append({"kernel": np.transpose(w, (2, 3, 1, 0))})
        norms.append({"scale": sd[f"main.{conv_idx + 1}.weight"],
                      "bias": sd[f"main.{conv_idx + 1}.bias"]})
    convs.append(_conv(sd, f"main.{2 + 3 * n_layers}"))
    return {"convs": convs, "norms": norms}


def convert_stylegan(sd: Mapping[str, np.ndarray]) -> Dict[str, Any]:
    """Reference StyleGAN Discriminator state dict -> our params."""
    sd = _strip_prefixes(sd)
    params: Dict[str, Any] = {"conv_in": _conv(sd, "blocks.0"), "blocks": []}
    i = 2
    while f"blocks.{i}.conv_res.weight" in sd:
        params["blocks"].append({
            "conv_res": _conv(sd, f"blocks.{i}.conv_res"),
            "conv1": _conv(sd, f"blocks.{i}.net.0"),
            "conv2": _conv(sd, f"blocks.{i}.net.2"),
            "down": _conv(sd, f"blocks.{i}.downsample.1"),
        })
        i += 1
    params["final_conv"] = _conv(sd, "final_conv.0")
    params["fc1"] = _linear(sd, "final_linear.0")
    params["fc2"] = _linear(sd, "final_linear.2")
    return params


def convert_vq_file(path: str, cfg: VQConfig) -> Dict[str, Any]:
    return convert_vq(load_torch_state_dict(path), cfg)


def convert_gpt_file(path: str, cfg: GPTConfig) -> Dict[str, Any]:
    return convert_gpt(load_torch_state_dict(path), cfg)


# ---------------------------------------------------------------------------
# SD-VAE (AutoencoderKL) — baseline-tokenizer comparison rig
# ---------------------------------------------------------------------------


def _diffusers_vae_to_ldm_keys(sd: Mapping[str, np.ndarray],
                               ) -> Dict[str, np.ndarray]:
    """Rename a diffusers AutoencoderKL state dict into the LDM layout
    (the inverse of diffusers' own `convert_ldm_vae_checkpoint` mapping)
    so one converter body serves both layouts."""
    import re

    # count decoder up levels to reverse the block index (diffusers
    # up_blocks[0] is the LOWEST resolution; ldm up.{level} indexes by
    # level with 0 = highest)
    ups = {int(m.group(1)) for k in sd
           if (m := re.match(r"decoder\.up_blocks\.(\d+)\.", k))}
    nlev = (max(ups) + 1) if ups else 0

    out = {}
    for k, v in sd.items():
        k = k.replace("mid_block.resnets.0.", "mid.block_1.")
        k = k.replace("mid_block.resnets.1.", "mid.block_2.")
        k = k.replace("mid_block.attentions.0.group_norm.",
                      "mid.attn_1.norm.")
        k = k.replace("mid_block.attentions.0.to_q.", "mid.attn_1.q.")
        k = k.replace("mid_block.attentions.0.to_k.", "mid.attn_1.k.")
        k = k.replace("mid_block.attentions.0.to_v.", "mid.attn_1.v.")
        k = k.replace("mid_block.attentions.0.to_out.0.",
                      "mid.attn_1.proj_out.")
        k = k.replace("conv_norm_out.", "norm_out.")
        k = k.replace(".conv_shortcut.", ".nin_shortcut.")
        m = re.match(r"encoder\.down_blocks\.(\d+)\.resnets\.(\d+)\.(.*)", k)
        if m:
            k = f"encoder.down.{m.group(1)}.block.{m.group(2)}.{m.group(3)}"
        m = re.match(r"encoder\.down_blocks\.(\d+)\.downsamplers\.0\.conv\.(.*)", k)
        if m:
            k = f"encoder.down.{m.group(1)}.downsample.conv.{m.group(2)}"
        m = re.match(r"decoder\.up_blocks\.(\d+)\.resnets\.(\d+)\.(.*)", k)
        if m:
            lev = nlev - 1 - int(m.group(1))
            k = f"decoder.up.{lev}.block.{m.group(2)}.{m.group(3)}"
        m = re.match(r"decoder\.up_blocks\.(\d+)\.upsamplers\.0\.conv\.(.*)", k)
        if m:
            lev = nlev - 1 - int(m.group(1))
            k = f"decoder.up.{lev}.upsample.conv.{m.group(2)}"
        out[k] = np.asarray(v)
    return out


def convert_sd_vae(sd: Mapping[str, np.ndarray], cfg) -> Dict[str, Any]:
    """SD-VAE (AutoencoderKL) state dict -> llamagen_tpu.models.klvae
    params. Accepts the diffusers layout (down_blocks/up_blocks/
    mid_block, attention as Linear) or the LDM layout (down/up/mid,
    attention as 1x1 conv) — the two releases of the same weights.

    Ref rig: /root/reference/tokenizer/vae/reconstruction_vae_ddp.py
    (diffusers AutoencoderKL); cfg: models.klvae.KLVAEConfig.
    """
    sd = _strip_prefixes(sd)
    if any(k.startswith("encoder.down_blocks.") for k in sd):
        sd = _diffusers_vae_to_ldm_keys(sd)
    num_res = len(cfg.ch_mult)

    def attn_levels(prefix, nblocks):
        def level(i):
            out = {"res": [], "attn": []}
            for j in range(nblocks):
                out["res"].append(_res(sd, f"{prefix}.{i}.block.{j}"))
                if f"{prefix}.{i}.attn.{j}.norm.weight" in sd:
                    out["attn"].append(_attn(sd, f"{prefix}.{i}.attn.{j}"))
            return out
        return level

    enc: Dict[str, Any] = {"conv_in": _conv(sd, "encoder.conv_in"),
                           "down": []}
    mk = attn_levels("encoder.down", cfg.num_res_blocks)
    for i in range(num_res):
        level = mk(i)
        if i != num_res - 1:
            level["downsample"] = {
                "conv": _conv(sd, f"encoder.down.{i}.downsample.conv")}
        enc["down"].append(level)
    enc["mid"] = [_res(sd, "encoder.mid.block_1"),
                  _attn(sd, "encoder.mid.attn_1"),
                  _res(sd, "encoder.mid.block_2")]
    enc["norm_out"] = _gn(sd, "encoder.norm_out")
    enc["conv_out"] = _conv(sd, "encoder.conv_out")

    dec: Dict[str, Any] = {"conv_in": _conv(sd, "decoder.conv_in")}
    dec["mid"] = [_res(sd, "decoder.mid.block_1"),
                  _attn(sd, "decoder.mid.attn_1"),
                  _res(sd, "decoder.mid.block_2")]
    dec["up"] = []
    mk = attn_levels("decoder.up", cfg.num_res_blocks + 1)
    # ldm stores up.{level} (0 = highest res) and applies reversed; ours
    # is application order
    for applied, level_idx in enumerate(reversed(range(num_res))):
        level = mk(level_idx)
        if level_idx != 0:
            level["upsample"] = {
                "conv": _conv(sd, f"decoder.up.{level_idx}.upsample.conv")}
        dec["up"].append(level)
    dec["norm_out"] = _gn(sd, "decoder.norm_out")
    dec["conv_out"] = _conv(sd, "decoder.conv_out")

    return {
        "encoder": enc,
        "decoder": dec,
        "quant_conv": _conv(sd, "quant_conv"),
        "post_quant_conv": _conv(sd, "post_quant_conv"),
    }


# ---------------------------------------------------------------------------
# Consistency decoder (openai/consistency-decoder ConvUNetVAE layout)
# ---------------------------------------------------------------------------


def convert_consistency_decoder(sd: Mapping[str, np.ndarray],
                                cfg) -> Dict[str, Any]:
    """openai ConvUNetVAE state dict -> models.consistency_decoder params.

    Layout: embed_image.f, embed_time.{emb,f_1,f_2},
    down.{i}.{j}.{f_t,gn_1,f_1,gn_2,f_2[,f_s]} with a trailing
    Downsample(.f) per non-last stage, mid.{0,1}, up.{i}.{j} (reversed
    stage order, layers_per_block+1 blocks) with trailing Upsample(.f),
    output.{gn,f}. The converter asserts FULL key coverage so a layout
    drift in real released weights fails loudly instead of silently
    mis-mapping (cfg: models.consistency_decoder.CDConfig).
    """
    sd = _strip_prefixes(sd)
    used = set()

    def take(fn, name):
        for suffix in (".weight", ".bias"):
            if f"{name}{suffix}" in sd:
                used.add(f"{name}{suffix}")
        return fn(sd, name)

    def res(base):
        p = {
            "f_t": take(_linear, f"{base}.f_t"),
            "gn1": take(_gn, f"{base}.gn_1"),
            "conv1": take(_conv, f"{base}.f_1"),
            "gn2": take(_gn, f"{base}.gn_2"),
            "conv2": take(_conv, f"{base}.f_2"),
        }
        if f"{base}.f_s.weight" in sd:
            p["skip"] = take(_conv, f"{base}.f_s")
        return p

    nstage = len(cfg.ch_mult)
    lpb = cfg.layers_per_block
    params: Dict[str, Any] = {
        "embed_image": take(_conv, "embed_image.f"),
        "embed_time": {
            "table": sd["embed_time.emb.weight"],
            "f1": take(_linear, "embed_time.f_1"),
            "f2": take(_linear, "embed_time.f_2"),
        },
    }
    used.add("embed_time.emb.weight")
    down = []
    for i in range(nstage):
        level = {"res": [res(f"down.{i}.{j}") for j in range(lpb)]}
        if i != nstage - 1:
            level["down"] = take(_conv, f"down.{i}.{lpb}.f")
        down.append(level)
    params["down"] = down
    params["mid"] = [res("mid.0"), res("mid.1")]
    up = []
    for k in range(nstage):  # up.{k} stored in application order
        level = {"res": [res(f"up.{k}.{j}") for j in range(lpb + 1)]}
        if k != nstage - 1:
            level["up"] = take(_conv, f"up.{k}.{lpb + 1}.f")
        up.append(level)
    params["up"] = up
    params["output"] = {"gn": take(_gn, "output.gn"),
                        "f": take(_conv, "output.f")}
    missing = set(sd) - used
    assert not missing, f"unmapped checkpoint keys: {sorted(missing)[:8]}"
    return params
