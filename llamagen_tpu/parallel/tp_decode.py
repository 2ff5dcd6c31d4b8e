"""Tensor-parallel decode with the Pallas kernel via shard_map.

Multi-chip serving path for large models (GPT-XXL/3B-class): attention
heads and the FFN hidden dim are sharded over the mesh's `tp` axis —
what the reference plumbs through vLLM but never enables
(`/root/reference/autoregressive/serve/gpu_executor.py:61-62` asserts
world_size==1; here it is real).

Parallel decomposition (standard Megatron-style TP, decode specialized):
  - wqkv column-parallel: each chip computes its local heads' q/k/v
  - decode attention is PER HEAD -> fully local to each chip, so the
    Pallas kernel runs unmodified on the local [B, S, F/ntp] cache shard
    with zero attention-time collectives
  - wo row-parallel: partial [B, D] outputs -> psum over `tp`
  - w1/w3 column-parallel, w2 row-parallel -> one psum per FFN
  - output head column-parallel over vocab -> logits all-gathered
    (16384 f32 per sample — negligible)

Two psums + one (tiny) all-gather per layer-stack step ride the ICI.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map  # jax >= 0.8 top-level API

from llamagen_tpu.config import GPTConfig
from llamagen_tpu.models import gpt


def tp_param_specs(cfg: GPTConfig, quantized: bool = False):
    """PartitionSpecs for decode-time TP (heads / ffn-hidden over `tp`).

    quantized=True describes a `quantize_gpt_params` pytree (W8A16 layer
    weights): int8 tensors shard like their bf16 counterparts; per-output-
    channel scales shard with the OUTPUT dim — over `tp` for column-
    parallel weights, replicated for row-parallel ones (the scale commutes
    with the psum: it is K-independent).
    """
    layers = {
        "attention_norm": P(),
        "ffn_norm": P(),
    }
    col, row = P(None, None, "tp"), P(None, "tp", None)
    if quantized:
        layers.update({
            "wqkv_q": col, "wqkv_scale": P(None, "tp"),
            "wo_q": row, "wo_scale": P(),
            "w1_q": col, "w1_scale": P(None, "tp"),
            "w3_q": col, "w3_scale": P(None, "tp"),
            "w2_q": row, "w2_scale": P(),
        })
    else:
        layers.update({
            "wqkv": col,   # column-parallel (head-major layout)
            "wo": row,     # row-parallel
            "w1": col,
            "w3": col,
            "w2": row,
        })
    if cfg.model_type == "c2i":
        cls_spec = {"embedding_table": P()}
    else:  # t2i caption embedder: tiny MLP, replicated
        cls_spec = {"fc1": {"kernel": P()}, "fc2": {"kernel": P()},
                    "uncond_embedding": P()}
    return {
        "tok_embeddings": P(),
        "cls_embedding": cls_spec,
        "layers": layers,
        "norm": P(),
        # W8A16 keeps the head bf16 (quant_matmul.quantize_gpt_params)
        "output": P(None, "tp"),       # vocab-parallel logits
    }


def make_tp_decode_step(cfg: GPTConfig, mesh: Mesh, ntp: int,
                        compute_dtype=jnp.bfloat16,
                        quantized_weights: bool = False,
                        param_specs=None):
    """Build a shard_map'd single-token decode step.

    Expects params placed with tp_param_specs and wqkv already head-major
    per shard (each chip's wqkv shard = its heads' q|k|v concatenated —
    see shard_tp_params). Cache shards: per-layer [B, S, F/ntp].
    quantized_weights: params carry W8A16 layer weights (int8 + scales);
    pass param_specs=tp_param_specs_for(params, cfg) for pre-sharded W4
    pytrees (quantize_gpt_params_w4k_tp).
    """
    from llamagen_tpu.ops.quant_matmul import matmul_any

    assert cfg.n_head % ntp == 0, "heads must divide tp"
    assert cfg.kv_heads % ntp == 0, (
        "GQA TP requires kv_heads % tp == 0 (each shard owns whole kv "
        "heads; query head h reads kv head h // rep shard-locally)")
    h_local = cfg.n_head // ntp
    kv_local = cfg.kv_heads // ntp

    def local_step(params, token, pos, cache_kv, recent):
        params = squeeze_tp_w4(params)
        # runs per-chip on local shards; params['layers']['wqkv'] shard is
        # [L, D, (h_local+2*kv_local)*head_dim] laid out q|k|v of the
        # LOCAL heads; gpt.decode_stack handles the row-parallel psums +
        # vocab-parallel logits all-gather via tp_axis
        h = params["tok_embeddings"][token].astype(compute_dtype)
        freqs = jax.lax.dynamic_slice_in_dim(
            gpt.freqs_cis_2d(cfg), pos, 1, axis=0)[0]

        acc = gpt.CacheAccum()
        attend = gpt.attend_cache_pallas(
            cfg, gpt.KVCache(kv=cache_kv), recent, pos, freqs, acc,
            n_local_heads=h_local, n_local_kv_heads=kv_local)
        logits = gpt.decode_stack(params, cfg, h, attend, tp_axis="tp")
        return logits, tuple(acc.kv), tuple(acc.recent)

    pspec = (param_specs if param_specs is not None
             else tp_param_specs(cfg, quantized=quantized_weights))
    kv_spec = tuple(P(None, None, "tp") for _ in range(cfg.n_layer))
    return shard_map(
        local_step, mesh=mesh,
        in_specs=(pspec, P(), P(), kv_spec, kv_spec),
        out_specs=(P(), kv_spec, kv_spec),
        check_vma=False)


def tp_param_specs_for(params, cfg: GPTConfig):
    """PartitionSpecs matching an ACTUAL param pytree (plain, W8A16, or
    pre-sharded W4 incl. mixed W4/W8A16 fallback keys)."""
    layers = params["layers"]
    if not any(k.endswith("_w4b") for k in layers):
        return tp_param_specs(cfg, quantized="wqkv_q" in layers)
    specs = tp_param_specs(cfg, quantized=True)
    lspecs = dict(specs["layers"])
    for k in layers:
        if k.endswith(("_w4b", "_w4s")):
            lspecs[k] = P(None, "tp", None, None, None)
    for key in ("wqkv", "w1", "w3", "wo", "w2"):
        if key + "_q" not in layers:  # replaced by w4 blocks
            lspecs.pop(key + "_q", None)
            lspecs.pop(key + "_scale", None)
    return dict(specs, layers=lspecs)


def squeeze_tp_w4(params):
    """Inside shard_map: collapse the sharded ntp axis of pre-sharded W4
    arrays ([L, 1, NB, ...] local shard -> [L, NB, ...], the layout
    layer_params/w4_matmul consume). No-op for non-W4 pytrees."""
    layers = params["layers"]
    if not any(k.endswith("_w4b") for k in layers):
        return params
    layers = {k: (v.reshape(v.shape[0], *v.shape[2:])
                  if k.endswith(("_w4b", "_w4s")) else v)
              for k, v in layers.items()}
    return dict(params, layers=layers)


def _head_major(arr: jnp.ndarray, cfg: GPTConfig, ntp: int) -> jnp.ndarray:
    """Permute a [..., qs+2*ks] last dim from [Q | K | V] to per-head-group
    [(q|k|v) of group 0 | group 1 | ...] so a plain `tp` column shard gives
    each chip whole heads of q, k AND v. GQA (r5): shard i gets query
    heads [i*hpg, (i+1)*hpg) and kv heads [i*kv_hpg, (i+1)*kv_hpg) —
    query head h reads kv head h // rep, so shard-local q heads map
    exactly onto shard-local kv heads (requires kv_heads % ntp == 0).
    Column permutations commute with per-output-channel quantization, so
    this applies unchanged to w_q and to the scale rows."""
    qs = cfg.n_head * cfg.head_dim
    ks = cfg.kv_heads * cfg.head_dim
    hpg = cfg.n_head // ntp
    kv_hpg = cfg.kv_heads // ntp
    lead = arr.shape[:-1]
    q = arr[..., :qs].reshape(lead + (ntp, hpg * cfg.head_dim))
    k = arr[..., qs:qs + ks].reshape(lead + (ntp, kv_hpg * cfg.head_dim))
    v = arr[..., qs + ks:].reshape(lead + (ntp, kv_hpg * cfg.head_dim))
    return jnp.concatenate([q, k, v], axis=-1).reshape(lead + (qs + 2 * ks,))


def quantize_gpt_params_w4k_tp(params, cfg: GPTConfig, ntp: int, *,
                               per_channel: bool = False,
                               group_size: int = 128):
    """W4-kernel quantization PRE-SHARDED for TP decode.

    The single-chip W4 layout ([L, NB, K2, BN] nibble blocks) cannot be
    sliced along heads/hidden, so each TP shard is packed SEPARATELY:
      - column-parallel weights (wqkv head-major, w1, w3) split along N
        into ntp groups, each packed to its own blocks
      - row-parallel weights (wo, w2) split along K (the K-half nibble
        pairing and the group-scale segments live INSIDE each shard's
        K_local, matching the chip-local activations)
    yielding [L, ntp, NB_l, K2_l, BN_l] arrays that shard with
    P(None, 'tp', ...) — each chip's slice is exactly the layout
    `ops.w4_matmul` consumes.

    Keys whose per-shard N_local is not 128-lane alignable (GPT-3B's
    head_dim=100 wqkv at most tp degrees) FALL BACK to W8A16 for that
    key — matmul_any dispatches per key, so mixed pytrees are fine.
    Row-shard packing changes group boundaries vs the single-chip
    packing, so dequantized values differ numerically from
    `quantize_gpt_params_w4k` output (parity is tested against a
    reference model built from THESE shards' dequantization).
    """
    from llamagen_tpu.ops.quant_matmul import quantize_weight
    from llamagen_tpu.ops.w4_matmul import _pick_bn, pack_w4

    def n_alignable(n):
        try:
            _pick_bn(n)
            return True
        except ValueError:
            return False

    layers = dict(params["layers"])
    assert not any(k.endswith(("_q", "_w4b")) for k in layers), (
        "pass UNQUANTIZED params; this function quantizes per shard")
    col_keys = ("wqkv", "w1", "w3")
    row_keys = ("wo", "w2")
    out_layers = {k: v for k, v in layers.items()
                  if k not in col_keys + row_keys}
    for key in col_keys:
        w = layers[key]  # [L, K, N]
        if key == "wqkv":
            w = _head_major(w, cfg, ntp)
        nl = w.shape[-1] // ntp
        if w.shape[-1] % ntp or not n_alignable(nl) or w.shape[-2] % 2:
            q, s = quantize_weight(w)  # W8A16 fallback, shards by column
            out_layers[key + "_q"] = q
            out_layers[key + "_scale"] = s
            continue
        shards = [w[..., i * nl:(i + 1) * nl] for i in range(ntp)]
        packed = [pack_w4(sh, per_channel=per_channel,
                          group_size=group_size) for sh in shards]
        out_layers[key + "_w4b"] = jnp.stack([b for b, _ in packed], axis=1)
        out_layers[key + "_w4s"] = jnp.stack([s for _, s in packed], axis=1)
    for key in row_keys:
        w = layers[key]  # [L, K, N]
        kl = w.shape[-2] // ntp
        if w.shape[-2] % ntp or kl % 2 or not n_alignable(w.shape[-1]):
            q, s = quantize_weight(w)
            out_layers[key + "_q"] = q
            out_layers[key + "_scale"] = s
            continue
        shards = [w[..., i * kl:(i + 1) * kl, :] for i in range(ntp)]
        packed = [pack_w4(sh, per_channel=per_channel,
                          group_size=group_size) for sh in shards]
        out_layers[key + "_w4b"] = jnp.stack([b for b, _ in packed], axis=1)
        out_layers[key + "_w4s"] = jnp.stack([s for _, s in packed], axis=1)
    return dict(params, layers=out_layers)


def _head_major_inv(arr: jnp.ndarray, cfg: GPTConfig,
                    ntp: int) -> jnp.ndarray:
    """Inverse of _head_major: per-head-group [(q|k|v) of group i] back
    to the plain [Q | K | V] column order."""
    qs = cfg.n_head * cfg.head_dim
    ks = cfg.kv_heads * cfg.head_dim
    hq = qs // ntp
    hk = ks // ntp
    lead = arr.shape[:-1]
    grp = arr.reshape(*lead, ntp, hq + 2 * hk)
    q = grp[..., :hq].reshape(*lead, qs)
    k = grp[..., hq:hq + hk].reshape(*lead, ks)
    v = grp[..., hq + hk:].reshape(*lead, ks)
    return jnp.concatenate([q, k, v], axis=-1)


def unshard_w4_tp_for_reference(qparams, cfg: GPTConfig, ntp: int):
    """Dequantize a `quantize_gpt_params_w4k_tp` pytree back to FULL
    plain-layout f32 weights (numerics oracle for TP parity tests —
    per-shard group boundaries preserved exactly, head-major wqkv
    permuted back to Q|K|V)."""
    from llamagen_tpu.ops.w4_matmul import w4_dequant

    layers = dict(qparams["layers"])
    out = {k: v for k, v in layers.items()
           if not k.endswith(("_w4b", "_w4s", "_q", "_scale"))}
    col_keys, row_keys = ("wqkv", "w1", "w3"), ("wo", "w2")
    for key in col_keys + row_keys:
        if key + "_w4b" in layers:
            blocks = layers[key + "_w4b"]   # [L, ntp, NB, K2, BN]
            scales = layers[key + "_w4s"]
            L = blocks.shape[0]
            axis = -1 if key in col_keys else -2
            full = jnp.stack([
                jnp.concatenate([w4_dequant(blocks[l, i], scales[l, i])
                                 for i in range(ntp)], axis=axis)
                for l in range(L)])
        elif key + "_q" in layers:  # W8A16 fallback key
            full = (layers[key + "_q"].astype(jnp.float32)
                    * layers[key + "_scale"][:, None, :])
        else:
            continue
        if key == "wqkv":
            full = _head_major_inv(full, cfg, ntp)
        out[key] = full.astype(jnp.float32)
    return dict(qparams, layers=out)


def shard_tp_params(params, cfg: GPTConfig, mesh: Mesh):
    """Place params for TP decode: wqkv reshaped head-major then sharded.

    Accepts plain (bf16/f32) params, a `quantize_gpt_params` W8A16
    pytree, or a `quantize_gpt_params_w4k_tp` pytree (pre-sharded W4
    blocks with the ntp axis second; mixed W4/W8A16 keys allowed)."""
    ntp = mesh.shape["tp"]
    layers = dict(params["layers"])
    has_w4 = any(k.endswith("_w4b") for k in layers)
    if has_w4:
        w4b = next(v for k, v in layers.items() if k.endswith("_w4b"))
        if w4b.ndim != 5:
            raise NotImplementedError(
                "single-chip W4-kernel params cannot be TP-sharded (the "
                "nibble-packed block layout does not slice along heads/"
                "hidden); quantize per shard with "
                "parallel.tp_decode.quantize_gpt_params_w4k_tp instead")
        # pre-sharded W4 pytree: [L, ntp, ...] arrays shard on axis 1;
        # any W8A16 fallback keys shard like the quantized case below
        specs = tp_param_specs_for(params, cfg)
        # (wqkv W8A16 fallback inside a w4 pytree is ALREADY head-major —
        # quantize_gpt_params_w4k_tp reorders before quantizing)
        params = dict(params, layers=layers)
        return jax.tree.map(
            lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
            params, specs, is_leaf=lambda x: x is None)
    quantized = "wqkv_q" in layers
    if quantized:
        layers["wqkv_q"] = _head_major(layers["wqkv_q"], cfg, ntp)
        layers["wqkv_scale"] = _head_major(layers["wqkv_scale"], cfg, ntp)
    else:
        layers["wqkv"] = _head_major(layers["wqkv"], cfg, ntp)
    params = dict(params, layers=layers)

    specs = tp_param_specs(cfg, quantized=quantized)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        params, specs, is_leaf=lambda x: x is None)
