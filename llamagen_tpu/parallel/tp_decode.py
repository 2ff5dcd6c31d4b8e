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


def reorder_wqkv_head_major(params, cfg: GPTConfig):
    """Rearrange wqkv columns from [Q | K | V] to per-head-group-contiguous
    [(q,k,v) of head-group 0 | head-group 1 | ...] so a plain `tp`-axis
    column shard gives each chip whole heads of q, k, AND v."""
    qs = cfg.n_head * cfg.head_dim
    w = params["layers"]["wqkv"]  # [L, D, 3*qs] (MHA)
    q, k, v = w[..., :qs], w[..., qs:2 * qs], w[..., 2 * qs:]
    return q, k, v


def make_tp_decode_step(cfg: GPTConfig, mesh: Mesh, ntp: int,
                        compute_dtype=jnp.bfloat16,
                        quantized_weights: bool = False):
    """Build a shard_map'd single-token decode step.

    Expects params placed with tp_param_specs and wqkv already head-major
    per shard (each chip's wqkv shard = its heads' q|k|v concatenated —
    see shard_tp_params). Cache shards: per-layer [B, S, F/ntp].
    quantized_weights: params carry W8A16 layer weights (int8 + scales).
    """
    from llamagen_tpu.ops.quant_matmul import matmul_any

    assert cfg.n_head % ntp == 0, "heads must divide tp"
    h_local = cfg.n_head // ntp

    def local_step(params, token, pos, cache_kv, recent):
        # runs per-chip on local shards; params['layers']['wqkv'] shard is
        # [L, D, 3*h_local*head_dim] laid out q|k|v of the LOCAL heads
        from llamagen_tpu.ops import attention as attn_lib

        b = token.shape[0]
        d_local = h_local * cfg.head_dim
        h = params["tok_embeddings"][token].astype(compute_dtype)
        freqs = jax.lax.dynamic_slice_in_dim(
            gpt.freqs_cis_2d(cfg), pos, 1, axis=0)[0]
        new_ckv, new_r = [], []
        for l in range(cfg.n_layer):
            p = gpt.layer_params(params, l)
            x = gpt.rms_norm(h, p["attention_norm"], cfg.norm_eps)
            qkv = matmul_any(p, "wqkv", x)  # [B, 3*d_local]
            q = qkv[:, :d_local].reshape(b, h_local, cfg.head_dim)
            k = qkv[:, d_local:2 * d_local].reshape(b, h_local, cfg.head_dim)
            v = qkv[:, 2 * d_local:]
            q = gpt._rope_single(q, freqs).reshape(b, d_local)
            k = gpt._rope_single(k, freqs).reshape(b, d_local)

            kv_new = jnp.concatenate([k, v], axis=-1)
            attn, ckv, r = attn_lib.decode_attention(
                q.astype(compute_dtype), kv_new, recent[l], cache_kv[l],
                pos, h_local)
            new_ckv.append(ckv)
            new_r.append(r)
            # row-parallel wo: partial sums reduced over tp
            part = matmul_any(p, "wo", attn.astype(x.dtype))
            h = h + jax.lax.psum(part, "tp")

            x = gpt.rms_norm(h, p["ffn_norm"], cfg.norm_eps)
            ffn = jax.nn.silu(matmul_any(p, "w1", x)) * matmul_any(p, "w3", x)
            h = h + jax.lax.psum(matmul_any(p, "w2", ffn), "tp")

        h = gpt.rms_norm(h, params["norm"], cfg.norm_eps)
        logits_local = (h @ params["output"].astype(h.dtype)
                        ).astype(jnp.float32)  # [B, V/ntp]
        logits = jax.lax.all_gather(logits_local, "tp", axis=1, tiled=True)
        return logits, tuple(new_ckv), tuple(new_r)

    pspec = tp_param_specs(cfg, quantized=quantized_weights)
    kv_spec = tuple(P(None, None, "tp") for _ in range(cfg.n_layer))
    return shard_map(
        local_step, mesh=mesh,
        in_specs=(pspec, P(), P(), kv_spec, kv_spec),
        out_specs=(P(), kv_spec, kv_spec),
        check_vma=False)


def _head_major(arr: jnp.ndarray, cfg: GPTConfig, ntp: int) -> jnp.ndarray:
    """Permute a [..., 3*qs] last dim from [Q | K | V] to per-head-group
    [(q|k|v) of group 0 | group 1 | ...] so a plain `tp` column shard gives
    each chip whole heads of q, k AND v. Column permutations commute with
    per-output-channel quantization, so this applies unchanged to w_q and
    to the [_, 3*qs] scale rows."""
    qs = cfg.n_head * cfg.head_dim
    hpg = cfg.n_head // ntp
    lead = arr.shape[:-1]
    grp = lead + (ntp, hpg * cfg.head_dim)
    q = arr[..., :qs].reshape(grp)
    k = arr[..., qs:2 * qs].reshape(grp)
    v = arr[..., 2 * qs:].reshape(grp)
    return jnp.concatenate([q, k, v], axis=-1).reshape(lead + (3 * qs,))


def shard_tp_params(params, cfg: GPTConfig, mesh: Mesh):
    """Place params for TP decode: wqkv reshaped head-major then sharded.

    Accepts either plain (bf16/f32) params or a `quantize_gpt_params`
    W8A16 pytree (int8 layer weights + scales; head bf16)."""
    ntp = mesh.shape["tp"]
    layers = dict(params["layers"])
    if any(k.endswith("_w4b") for k in layers):
        raise NotImplementedError(
            "TP decode does not take W4-kernel params: the nibble-packed "
            "block layout would need per-shard repacking (and N/tp is not "
            "128-aligned for every zoo size). Use quantize_gpt_params "
            "(W8A16) for TP — it shards transparently.")
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
