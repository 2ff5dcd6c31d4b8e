"""Tensor-parallel continuous-batching engine step (multi-chip serving).

Composes the two proven pieces that were previously only tested apart:
the slot-based serving engine (`serve.engine`: paired CFG slots, chunked
compiled steps, admission at chunk boundaries) and Megatron-style decode
TP (`parallel.tp_decode`: heads + FFN hidden sharded over the mesh `tp`
axis, attention fully chip-local, two psums per layer + one tiny logits
all-gather riding the ICI).

The reference plumbs tensor_parallel_size through vLLM but never enables
it (`/root/reference/autoregressive/serve/gpu_executor.py:61-62` asserts
world_size == 1); here multi-chip serving is real: a GPT-3B engine spreads
its 6.2 GB of weights and its KV cache over a v5e slice.

Layout conventions:
  - engine slots exactly as `serve.engine` ([cond ‖ uncond] halves,
    per-slot positions, chunked host loop) — the host-side ServeEngine
    class drives this step unchanged;
  - per-layer cache/window/scale buffers sharded on their LANE dim with
    the per-shard-local k|v convention of `parallel.tp_decode` (each
    chip's lane slice holds ITS heads' k|v — produced locally, consumed
    locally, never resharded);
  - everything else (slot bookkeeping, rng, sampled tokens) is replicated;
    sampling runs identically on every chip so no collective is needed
    after the logits all-gather.

Weights: bf16, W8A16 (shard_tp_params head-major wqkv; matmul_any
dequantizes each chip's int8 shard in its fused weight stream), or W4
via PER-SHARD repacking (parallel.tp_decode.quantize_gpt_params_w4k_tp:
each chip's nibble blocks packed against its own column/K slice, with
W8A16 fallback for keys whose shard is not 128-lane alignable — e.g.
GPT-3B's head_dim=100 wqkv). Single-chip W4 pytrees are still rejected
(the pre-blocked layout does not slice along heads/hidden).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map  # jax >= 0.8 top-level API

from llamagen_tpu.config import GPTConfig, find_multiple
from llamagen_tpu.models import gpt
from llamagen_tpu.ops import sampling
from llamagen_tpu.parallel.tp_decode import shard_tp_params, tp_param_specs
from llamagen_tpu.serve.engine import (EngineState, SamplingParams,
                                       SlotSampling, apply_admission,
                                       build_step_embeddings,
                                       sample_and_advance,
                                       slot_sampling_full)


def _slot_sp_specs() -> SlotSampling:
    return SlotSampling(*(P() for _ in SlotSampling._fields))


def _state_specs(cfg: GPTConfig, quantized: bool,
                 track_counts: bool) -> EngineState:
    """PartitionSpec pytree matching EngineState (kernel path)."""
    lane = tuple(P(None, None, "tp") for _ in range(cfg.n_layer))
    return EngineState(
        cache=gpt.KVCache(kv=lane, kv_scale=lane if quantized else None),
        pos=P(), active=P(), cur_token=P(), labels=P(), n_generated=P(),
        tokens_out=P(), rng=P(),
        recent=lane,
        prefix_pad=P() if cfg.model_type == "t2i" else None,
        output_counts=P() if track_counts else None,
        sp_slots=_slot_sp_specs())


def init_tp_engine_state(cfg: GPTConfig, num_pairs: int,
                         max_new_tokens: int, rng: jax.Array, mesh: Mesh,
                         ntp: int, cache_dtype=jnp.bfloat16,
                         track_counts: bool = False,
                         sp: Optional[SamplingParams] = None) -> EngineState:
    """Sharded engine state: cache/scale/window lane dims carry `tp`.

    The int8 scale buffer is [B, S, 128*ntp] globally so each chip's shard
    is the [B, S, 128] layout `ops.attention` expects (k scale in local
    lane 0, v in 64).
    """
    from llamagen_tpu.ops.attention import recent_window

    b = 2 * num_pairs
    smax = find_multiple(cfg.cls_token_num + max_new_tokens, 128)
    f2 = 2 * cfg.kv_heads * cfg.head_dim
    quantized = cache_dtype == jnp.int8
    w = recent_window(cache_dtype)
    win_dtype = jnp.bfloat16 if quantized else cache_dtype

    lane = NamedSharding(mesh, P(None, None, "tp"))
    repl = NamedSharding(mesh, P())

    def mk(shape, dtype, shard, fill=0):
        return jax.device_put(jnp.full(shape, fill, dtype), shard)

    kv = tuple(mk((b, smax, f2), cache_dtype, lane)
               for _ in range(cfg.n_layer))
    sc = (tuple(mk((b, smax, 128 * ntp), jnp.bfloat16, lane, 1)
                for _ in range(cfg.n_layer)) if quantized else None)
    recent = tuple(mk((b, w, f2), win_dtype, lane)
                   for _ in range(cfg.n_layer))
    return EngineState(
        cache=gpt.KVCache(kv=kv, kv_scale=sc),
        pos=mk((num_pairs,), jnp.int32, repl),
        active=mk((num_pairs,), bool, repl),
        cur_token=mk((num_pairs,), jnp.int32, repl),
        labels=mk((num_pairs,), jnp.int32, repl),
        n_generated=mk((num_pairs,), jnp.int32, repl),
        tokens_out=mk((num_pairs, max_new_tokens), jnp.int32, repl),
        rng=jax.device_put(rng, repl),
        recent=recent,
        output_counts=(mk((num_pairs, cfg.vocab_size), jnp.int32, repl)
                       if track_counts else None),
        prefix_pad=(mk((num_pairs,), jnp.int32, repl)
                    if cfg.model_type == "t2i" else None),
        sp_slots=jax.device_put(
            slot_sampling_full(sp or SamplingParams(), num_pairs), repl),
    )


def _local_decode_step(params, cfg: GPTConfig, h_local: int,
                       emb: jnp.ndarray, pos: jnp.ndarray,
                       cache: gpt.KVCache, recent, compute_dtype,
                       prefix_pad: Optional[jnp.ndarray] = None):
    """Per-chip slot decode: local heads through the Pallas kernel,
    row-parallel reductions over `tp` (gpt.decode_stack with tp_axis;
    per-slot positions and optional int8 cache); matmul_any transparently
    dequantizes W8A16 or pre-sharded W4 layer-weight shards. GQA (r5):
    attend_cache_pallas derives the local kv-head count from the global
    q:kv ratio (kv_heads % ntp == 0, asserted by make_tp_engine_step)."""
    from llamagen_tpu.parallel.tp_decode import squeeze_tp_w4

    params = squeeze_tp_w4(params)
    h = emb.astype(compute_dtype)
    freqs = gpt.freqs_cis_2d(cfg)[pos]  # [B, head_dim//2, 2]

    acc = gpt.CacheAccum()
    attend = gpt.attend_cache_pallas(cfg, cache, recent, pos, freqs, acc,
                                     prefix_pad=prefix_pad,
                                     n_local_heads=h_local)
    logits = gpt.decode_stack(params, cfg, h, attend, tp_axis="tp")
    return logits, acc.as_cache(cache.quantized), tuple(acc.recent)


def make_tp_engine_step(cfg: GPTConfig,
                        max_new_tokens: int, mesh: Mesh, ntp: int,
                        chunk: int = 64, compute_dtype=jnp.bfloat16,
                        quantized_cache: bool = False,
                        quantized_weights: bool = False,
                        track_counts: bool = False,
                        param_specs=None):
    """Compile the TP-sharded chunked engine step.

    Same contract as serve.engine.make_engine_step (c2i): the returned
    engine_step(params, state, admit_mask [P] bool, admit_labels [P],
    admit_sp SlotSampling, n_steps i32) runs `n_steps <= chunk` decode
    iterations with in-chunk admission prefill and per-slot traced
    sampling params. Params must be placed with
    parallel.tp_decode.shard_tp_params.
    """
    assert cfg.n_head % ntp == 0
    assert cfg.kv_heads % ntp == 0, (
        "GQA TP serving requires kv_heads % tp == 0 (each chip owns "
        "whole kv heads; the head-major wqkv shard keeps query head h "
        "with its kv head h // rep — parallel.tp_decode._head_major)")
    h_local = cfg.n_head // ntp
    assert (h_local * cfg.head_dim) % 128 == 0, (
        "per-chip flattened heads must stay 128-lane aligned")
    if cfg.kv_heads != cfg.n_head:
        assert (cfg.kv_heads // ntp * cfg.head_dim) % 128 == 0, (
            "per-chip GQA kv lanes must stay 128-lane aligned "
            "(ops.attention lane-tiling)")

    def one_step(params, state: EngineState) -> EngineState:
        # the engine step differs from serve.engine's ONLY in the decode
        # call (TP-local heads, row-parallel psums); prologue/tail shared
        emb, pad2 = build_step_embeddings(params, cfg, state, compute_dtype)
        pos2 = jnp.concatenate([state.pos, state.pos], axis=0)
        logits, cache, recent = _local_decode_step(
            params, cfg, h_local, emb, pos2, state.cache, state.recent,
            compute_dtype, prefix_pad=pad2)
        return sample_and_advance(state, logits, cache, recent,
                                  max_new_tokens)

    def local_chunk(params, state: EngineState, admit_mask, admit_labels,
                    admit_sp: SlotSampling, n_steps) -> EngineState:
        state = apply_admission(state, admit_mask, admit_labels, admit_sp)
        return jax.lax.fori_loop(0, jnp.minimum(n_steps, chunk),
                                 lambda i, s: one_step(params, s), state)

    sspec = _state_specs(cfg, quantized_cache, track_counts)
    sharded = shard_map(
        local_chunk, mesh=mesh,
        in_specs=(param_specs if param_specs is not None
                  else tp_param_specs(cfg, quantized=quantized_weights),
                  sspec, P(), P(), _slot_sp_specs(), P()),
        out_specs=sspec,
        check_vma=False)
    return jax.jit(sharded, donate_argnums=(1,))


def make_tp_admit_pair(cfg: GPTConfig, mesh: Mesh, ntp: int,
                       compute_dtype=jnp.bfloat16,
                       quantized_weights: bool = False,
                       param_specs=None):
    """TP t2i admission: the full cls_token_num caption prefill for ONE
    cond‖uncond pair, heads sharded over `tp`.

    Same contract as serve.engine.make_admit_pair but returns per-layer kv
    rows in each chip's LOCAL lane convention ([k_local | v_local],
    [2, T, 2*d_local] per shard — produced locally, consumed locally by
    the decode kernel, never resharded). The caption embedder (tiny MLP)
    and sampling run replicated; one all-gather for the last-position
    logits. This is the piece the reference's vLLM TP plumbing never
    exercised for t2i (gpu_executor.py:61-62)."""
    from llamagen_tpu.ops.quant_matmul import matmul_any
    from llamagen_tpu.ops import sampling as sampling_lib

    assert cfg.kv_heads % ntp == 0, "GQA TP: kv_heads % tp == 0"
    h_local_n = cfg.n_head // ntp
    kv_local_n = cfg.kv_heads // ntp
    rep = h_local_n // kv_local_n
    d_local = h_local_n * cfg.head_dim
    kd_local = kv_local_n * cfg.head_dim
    t = cfg.cls_token_num

    def local_admit(params, caption, emb_mask, rng, sp_row: SlotSampling):
        from llamagen_tpu.ops.generate import build_cfg_batch
        from llamagen_tpu.parallel.tp_decode import squeeze_tp_w4

        params = squeeze_tp_w4(params)

        cond = build_cfg_batch(params, cfg, caption.astype(compute_dtype),
                               True)  # [2, T, C]
        h = gpt.embed_condition(params, cfg, cond).astype(compute_dtype)
        m = emb_mask.astype(bool)
        m2 = jnp.concatenate([m, m], axis=0)  # [2, T]

        freqs = gpt.freqs_cis_2d(cfg)[:t]
        causal = jnp.tril(jnp.ones((t, t), bool))[None, None]
        allow = m2[:, None, None, :]
        eye = jnp.eye(t, dtype=bool)[None, None]
        mask = causal & (allow | eye)  # gpt.prefill's t2i mask semantics

        scale = cfg.head_dim ** -0.5
        rows = []
        for l in range(cfg.n_layer):
            p = gpt.layer_params(params, l)
            x = gpt.rms_norm(h, p["attention_norm"], cfg.norm_eps)
            # [2, T, d_local+2*kd_local] head-major (GQA: kv lanes narrower)
            qkv = matmul_any(p, "wqkv", x)
            q = qkv[..., :d_local].reshape(2, t, h_local_n, cfg.head_dim)
            k = qkv[..., d_local:d_local + kd_local].reshape(
                2, t, kv_local_n, cfg.head_dim)
            v = qkv[..., d_local + kd_local:].reshape(
                2, t, kv_local_n, cfg.head_dim)
            q = gpt.apply_rope(q, freqs)
            k = gpt.apply_rope(k, freqs)
            kk, vv = k, v
            if rep != 1:  # GQA: local query head h reads local kv h//rep
                kk = jnp.repeat(kk, rep, axis=2)
                vv = jnp.repeat(vv, rep, axis=2)
            scores = jnp.einsum("bqhd,bkhd->bhqk", q, kk,
                                preferred_element_type=jnp.float32) * scale
            scores = jnp.where(mask, scores, jnp.float32(-1e30))
            probs = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
            attn = jnp.einsum("bhqk,bkhd->bqhd", probs, vv
                              ).reshape(2, t, d_local)
            rows.append(jnp.concatenate(
                [k.reshape(2, t, kd_local), v.reshape(2, t, kd_local)],
                axis=-1).astype(jnp.bfloat16))
            part = matmul_any(p, "wo", attn)
            h = h + jax.lax.psum(part, "tp").astype(h.dtype)
            x = gpt.rms_norm(h, p["ffn_norm"], cfg.norm_eps)
            ffn = jax.nn.silu(matmul_any(p, "w1", x)) * matmul_any(p, "w3", x)
            h = h + jax.lax.psum(matmul_any(p, "w2", ffn), "tp").astype(h.dtype)

        hl = gpt.rms_norm(h[:, -1:, :], params["norm"], cfg.norm_eps)
        logits_local = (hl[:, 0] @ params["output"].astype(hl.dtype)
                        ).astype(jnp.float32)
        logits = jax.lax.all_gather(logits_local, "tp", axis=1, tiled=True)
        mixed = sampling_lib.cfg_mix_per_slot(
            logits, sp_row.cfg_scale.reshape(1))
        first = sampling_lib.sample_per_slot(
            rng, mixed, sp_row.temperature.reshape(1),
            sp_row.top_k.reshape(1), sp_row.top_p.reshape(1))[0]
        pad = (t - jnp.sum(m[0]).astype(jnp.int32))
        return first, tuple(rows), pad

    lane = tuple(P(None, None, "tp") for _ in range(cfg.n_layer))
    sharded = shard_map(
        local_admit, mesh=mesh,
        in_specs=(param_specs if param_specs is not None
                  else tp_param_specs(cfg, quantized=quantized_weights),
                  P(), P(), P(), _slot_sp_specs()),
        out_specs=(P(), lane, P()),
        check_vma=False)
    return jax.jit(sharded)


def make_tp_scatter_pair(cfg: GPTConfig, num_pairs: int, mesh: Mesh,
                         ntp: int, cache_dtype, track_counts: bool = False):
    """TP t2i slot installer: serve.engine's scatter body run per-chip on
    the lane-sharded cache/window/scale buffers (the int8 scale layout is
    per-chip [.., 128], so the single-chip body applies verbatim with the
    local lane width)."""
    from llamagen_tpu.serve.engine import scatter_pair_local

    f_local = cfg.kv_heads * cfg.head_dim // ntp
    body = scatter_pair_local(cfg, num_pairs, True, cache_dtype, f_local)
    quantized = cache_dtype == jnp.int8
    sspec = _state_specs(cfg, quantized, track_counts=track_counts)

    def local_scatter(state, slot, first_tok, rows, pad, sp_row):
        return body(state, slot, first_tok, rows, pad, sp_row)

    lane = tuple(P(None, None, "tp") for _ in range(cfg.n_layer))
    sharded = shard_map(
        local_scatter, mesh=mesh,
        in_specs=(sspec, P(), P(), lane, P(), _slot_sp_specs()),
        out_specs=sspec,
        check_vma=False)
    return jax.jit(sharded, donate_argnums=(0,))


__all__ = ["init_tp_engine_state", "make_tp_engine_step", "shard_tp_params",
           "make_tp_admit_pair", "make_tp_scatter_pair"]
