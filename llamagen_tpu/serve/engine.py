"""Slot-based continuous-batching serving engine for c2i generation.

TPU-idiomatic replacement for the reference's vLLM integration
(`/root/reference/autoregressive/serve/`): instead of paged KV blocks +
CUDA-graph capture + a scheduler/executor/worker stack, a single compiled
step function decodes ALL slots every iteration over a dense preallocated
KV cache; admission of new requests into free slots happens at chunk
boundaries (continuous batching without paging — on TPU, dense static-shape
caches + XLA beat paged gather).

Design mapping to the reference:
  - CFG request duplication (serve/sample_c2i.py:35-37) -> paired slot
    halves [cond ‖ uncond], mixed at the sampler (serve/sampler.py:54-58);
    both halves carry the same sampled token (sampler.py:106-108).
  - prefill/decode branchless embedding select (serve/gpt_model.py:284-286)
    -> jnp.where(is_new_slot, class_embedding, token_embedding); for c2i the
    condition is a single position so admission costs one ordinary step.
  - CUDA-graph capture per batch bucket (model_runner.py:981-1081) -> one
    jit-compiled chunk program (compilation IS graph capture on TPU).
  - per-slot positions via scatter updates into the dense cache.
"""

from __future__ import annotations

import queue
import threading
import time
from dataclasses import dataclass, field
from typing import Any, Dict, List, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from llamagen_tpu.config import GPTConfig, find_multiple
from llamagen_tpu.models import gpt
from llamagen_tpu.ops import sampling
from llamagen_tpu.ops.quant_matmul import matmul_any


class SlotSampling(NamedTuple):
    """Per-slot TRACED sampling parameters.

    The reference hot-swaps `Sampler(cfg_scale)` on the live model per
    request (`/root/reference/app.py:54`); on TPU a re-trace would
    recompile the chunk program (~minutes), so the parameters are data:
    [P] arrays carried in EngineState, written at admission.
    """
    cfg_scale: jnp.ndarray    # [P] f32 (1.0 = no guidance)
    temperature: jnp.ndarray  # [P] f32 (<= 0 = greedy argmax)
    top_k: jnp.ndarray        # [P] i32 (0 = off)
    top_p: jnp.ndarray        # [P] f32 (>= 1 = off)
    presence: jnp.ndarray     # [P] f32
    frequency: jnp.ndarray    # [P] f32
    repetition: jnp.ndarray   # [P] f32 (1.0 = off)


class EngineState(NamedTuple):
    cache: gpt.KVCache          # per-layer [2P, Smax, F]
    pos: jnp.ndarray            # [P] next write position (pair-shared)
    active: jnp.ndarray         # [P] bool
    cur_token: jnp.ndarray      # [P] last sampled token
    labels: jnp.ndarray         # [P] class label of the running request
    n_generated: jnp.ndarray    # [P] tokens produced so far
    tokens_out: jnp.ndarray     # [P, max_new] output buffer
    rng: jax.Array
    recent: Optional[tuple] = None  # kernel path: per-layer [2P, w, 2F]
    prefix_pad: Optional[jnp.ndarray] = None  # t2i: [P] left-pad counts
    output_counts: Optional[jnp.ndarray] = None  # [P, V] penalty counts
    sp_slots: Optional[SlotSampling] = None  # per-slot sampling params


@dataclass
class SamplingParams:
    """Per-engine sampling configuration (ref: serve/sampler.py + CLI
    flags; penalties follow the reference sampler's vLLM semantics,
    sampler.py:205-226)."""
    cfg_scale: float = 2.0
    temperature: float = 1.0
    top_k: int = 0
    top_p: float = 1.0
    presence_penalty: float = 0.0
    frequency_penalty: float = 0.0
    repetition_penalty: float = 1.0

    @property
    def uses_penalties(self) -> bool:
        return (self.presence_penalty != 0.0 or self.frequency_penalty != 0.0
                or self.repetition_penalty != 1.0)


def slot_sampling_full(sp: SamplingParams, num_pairs: int) -> SlotSampling:
    """Broadcast one SamplingParams to all slots."""
    f = lambda v, dt=jnp.float32: jnp.full((num_pairs,), v, dt)
    return SlotSampling(
        cfg_scale=f(sp.cfg_scale), temperature=f(sp.temperature),
        top_k=f(sp.top_k, jnp.int32), top_p=f(sp.top_p),
        presence=f(sp.presence_penalty), frequency=f(sp.frequency_penalty),
        repetition=f(sp.repetition_penalty))


def init_engine_state(cfg: GPTConfig, num_pairs: int, max_new_tokens: int,
                      rng: jax.Array, cache_dtype=jnp.bfloat16,
                      use_kernel: bool = False,
                      track_counts: bool = False,
                      sp: Optional[SamplingParams] = None) -> EngineState:
    smax = find_multiple(cfg.cls_token_num + max_new_tokens,
                         128 if use_kernel else 8)
    recent = None
    if use_kernel:
        from llamagen_tpu.ops.attention import recent_window
        w = recent_window(cache_dtype)
        # windows stay exact (bf16) even for int8 caches
        win_dtype = jnp.bfloat16 if cache_dtype == jnp.int8 else cache_dtype
        recent = gpt.init_recent(cfg, 2 * num_pairs, dtype=win_dtype,
                                 window=w)
    return EngineState(
        cache=gpt.init_cache(cfg, 2 * num_pairs, smax, dtype=cache_dtype),
        pos=jnp.zeros((num_pairs,), jnp.int32),
        active=jnp.zeros((num_pairs,), bool),
        cur_token=jnp.zeros((num_pairs,), jnp.int32),
        labels=jnp.zeros((num_pairs,), jnp.int32),
        n_generated=jnp.zeros((num_pairs,), jnp.int32),
        tokens_out=jnp.zeros((num_pairs, max_new_tokens), jnp.int32),
        rng=rng,
        recent=recent,
        prefix_pad=(jnp.zeros((num_pairs,), jnp.int32)
                    if cfg.model_type == "t2i" else None),
        output_counts=(jnp.zeros((num_pairs, cfg.vocab_size), jnp.int32)
                       if track_counts else None),
        sp_slots=slot_sampling_full(sp or SamplingParams(), num_pairs),
    )


def _decode_step_slots(params, cfg: GPTConfig, emb: jnp.ndarray,
                       pos: jnp.ndarray, cache: gpt.KVCache,
                       compute_dtype=jnp.bfloat16,
                       prefix_pad: Optional[jnp.ndarray] = None):
    """One decode step with per-slot positions.

    emb: [B, D] input embeddings (token or condition); pos: [B] positions.
    Returns (logits [B, vocab], new cache). gpt.decode_stack with batched
    scatter cache writes at (b, pos[b]).
    """
    smax = cache.max_seq_len
    h = emb.astype(compute_dtype)
    freqs = gpt.freqs_cis_2d(cfg)[pos]  # [B, D//2, 2]
    mask = jnp.arange(smax)[None, None, :] <= pos[:, None, None]  # [B,1,S]
    if prefix_pad is not None:
        # t2i left-padded caption prefix: positions < pad are masked
        mask = mask & (jnp.arange(smax)[None, None, :]
                       >= prefix_pad[:, None, None])

    acc = gpt.CacheAccum()
    attend = gpt.attend_cache_xla(cfg, cache, pos, mask, freqs, acc)
    logits = gpt.decode_stack(params, cfg, h, attend)
    return logits, acc.as_cache(quantized=False)


def _decode_step_slots_pallas(params, cfg: GPTConfig, emb: jnp.ndarray,
                              pos: jnp.ndarray, cache: gpt.KVCache,
                              recent, compute_dtype=jnp.bfloat16,
                              prefix_pad: Optional[jnp.ndarray] = None):
    """Kernel-path slot decode: per-slot positions, in-place HBM cache."""
    h = emb.astype(compute_dtype)
    freqs = gpt.freqs_cis_2d(cfg)[pos]  # [B, D//2, 2]

    acc = gpt.CacheAccum()
    attend = gpt.attend_cache_pallas(cfg, cache, recent, pos, freqs, acc,
                                     prefix_pad=prefix_pad)
    logits = gpt.decode_stack(params, cfg, h, attend)
    return logits, acc.as_cache(cache.quantized), tuple(acc.recent)


def build_step_embeddings(params, cfg: GPTConfig, state: "EngineState",
                          compute_dtype):
    """Per-slot input embeddings for one engine decode step.

    c2i: branchless prefill-vs-decode select (the reference's
    `pos.max()==0` embedding trick, serve/gpt_model.py:284-286) — new
    slots (pos==0) read their class/null embeddings, everyone else the
    sampled token's. t2i: caption prefill happened at admission, so every
    step is token decode. Returns (emb [2P, D], pad2) — cond half
    stacked on uncond half. Shared by the single-chip and TP engines
    (their steps differ only in the decode call)."""
    tok_emb = params["tok_embeddings"][state.cur_token].astype(compute_dtype)
    if cfg.model_type == "t2i":
        emb = jnp.concatenate([tok_emb, tok_emb], axis=0)  # [2P, D]
        pad2 = jnp.concatenate([state.prefix_pad, state.prefix_pad])
    else:
        is_prefill = state.active & (state.pos == 0)
        emb_table = params["cls_embedding"]["embedding_table"]
        cond_emb = emb_table[state.labels].astype(compute_dtype)
        null_emb = emb_table[jnp.full_like(state.labels, cfg.num_classes)
                             ].astype(compute_dtype)
        emb_cond = jnp.where(is_prefill[:, None], cond_emb, tok_emb)
        emb_uncond = jnp.where(is_prefill[:, None], null_emb, tok_emb)
        emb = jnp.concatenate([emb_cond, emb_uncond], axis=0)  # [2P, D]
        pad2 = None
    return emb, pad2


def sample_and_advance(state: "EngineState", logits, cache, recent,
                       max_new_tokens: int) -> "EngineState":
    """Post-decode tail of one engine step: CFG-mix with per-slot traced
    params, penalties, sample, and slot bookkeeping (write the token for
    active unfinished slots, advance pos/n_generated, retire finished
    slots). Shared by the single-chip and TP engines."""
    ss = state.sp_slots
    mixed = sampling.cfg_mix_per_slot(logits, ss.cfg_scale)
    counts = state.output_counts
    if counts is not None:
        mixed = sampling.apply_penalties_per_slot(
            mixed, counts, presence=ss.presence,
            frequency=ss.frequency, repetition=ss.repetition)

    rng, step_rng = jax.random.split(state.rng)
    nxt = sampling.sample_per_slot(step_rng, mixed, ss.temperature,
                                   ss.top_k, ss.top_p)  # [P]

    still_going = state.active & (state.n_generated < max_new_tokens)
    write_idx = jnp.clip(state.n_generated, 0, max_new_tokens - 1)
    tokens_out = jnp.where(
        still_going[:, None]
        & (jnp.arange(max_new_tokens)[None, :] == write_idx[:, None]),
        nxt[:, None], state.tokens_out)
    n_generated = jnp.where(still_going, state.n_generated + 1,
                            state.n_generated)
    cur_token = jnp.where(still_going, nxt, state.cur_token)
    pos = jnp.where(state.active, state.pos + 1, state.pos)
    active = state.active & (n_generated < max_new_tokens)

    if counts is not None:
        counts = jnp.where(
            still_going[:, None],
            sampling.update_output_counts(counts, nxt), counts)
    return state._replace(cache=cache, pos=pos, active=active,
                          cur_token=cur_token, n_generated=n_generated,
                          tokens_out=tokens_out, rng=rng, recent=recent,
                          output_counts=counts)


def apply_admission(state: "EngineState", admit_mask, admit_labels,
                    admit_sp: SlotSampling) -> "EngineState":
    """Reset admitted slots' bookkeeping (cache rows get overwritten by
    their prefill); per-request sampling params land in the traced
    per-slot arrays. Shared by the single-chip and TP engine chunks."""
    pos = jnp.where(admit_mask, 0, state.pos)
    active = state.active | admit_mask
    labels = jnp.where(admit_mask, admit_labels, state.labels)
    n_generated = jnp.where(admit_mask, 0, state.n_generated)
    sp_slots = SlotSampling(*(jnp.where(admit_mask, a, s) for a, s
                              in zip(admit_sp, state.sp_slots)))
    counts = state.output_counts
    if counts is not None:
        counts = jnp.where(admit_mask[:, None], 0, counts)
    return state._replace(pos=pos, active=active, labels=labels,
                          n_generated=n_generated, output_counts=counts,
                          sp_slots=sp_slots)


def make_engine_step(params, cfg: GPTConfig, max_new_tokens: int,
                     chunk: int = 64, compute_dtype=jnp.bfloat16,
                     use_kernel: bool = False, track_counts: bool = False):
    """Compile the chunked engine step.

    engine_step(state, admit_mask [P] bool, admit_labels [P],
    admit_sp SlotSampling, n_steps i32) runs `n_steps <= chunk` decode
    iterations (the loop bound is TRACED — one compiled program serves any
    chunk length, so the host can stop exactly when the next slot
    finishes; no finished slot idles through the rest of a fixed chunk).
    Newly admitted slots take their per-request sampling params from
    `admit_sp` and go through their condition prefill (one step for c2i),
    then decode along with everyone else. t2i slots are admitted OUT of
    band (make_admit_pair + make_scatter_pair run the 120-token caption
    prefill once per request) so every in-chunk step is pure decode.
    """
    def one_step(params, state: EngineState) -> EngineState:
        emb, pad2 = build_step_embeddings(params, cfg, state, compute_dtype)
        pos2 = jnp.concatenate([state.pos, state.pos], axis=0)
        if use_kernel:
            logits, cache, recent = _decode_step_slots_pallas(
                params, cfg, emb, pos2, state.cache, state.recent,
                compute_dtype, prefix_pad=pad2)
        else:
            logits, cache = _decode_step_slots(params, cfg, emb, pos2,
                                               state.cache, compute_dtype,
                                               prefix_pad=pad2)
            recent = state.recent
        return sample_and_advance(state, logits, cache, recent,
                                  max_new_tokens)

    def engine_chunk(params, state: EngineState, admit_mask, admit_labels,
                     admit_sp: SlotSampling, n_steps) -> EngineState:
        state = apply_admission(state, admit_mask, admit_labels, admit_sp)
        state = jax.lax.fori_loop(0, jnp.minimum(n_steps, chunk),
                                  lambda i, s: one_step(params, s), state)
        return state

    return jax.jit(engine_chunk, donate_argnums=(1,))


def make_admit_batch(cfg: GPTConfig, abatch: int,
                     compute_dtype=jnp.bfloat16):
    """Compile the t2i admission prefill for UP TO `abatch` pairs at once.

    One forward runs all pending pairs' caption prefills ([2A, T] batch:
    cond rows first, uncond rows second), CFG-mixes per pair with traced
    per-request params, samples each first token. Unused slots are padded
    (callers ignore their outputs). Replaces the serial one-pair-per-call
    admission (the reference's prefill batching,
    serve/model_runner.py:248-446, batches exactly like this).

    Returns (firsts [A], per-layer rows [A, 2, T, 2F], pads [A]).
    """
    t = cfg.cls_token_num

    @jax.jit
    def admit(params, captions, emb_masks, rng, sp_rows: SlotSampling):
        # captions [A, T, caption_dim]; emb_masks [A, T] bool
        from llamagen_tpu.ops.generate import build_cfg_batch

        cond = build_cfg_batch(params, cfg,
                               captions.astype(compute_dtype),
                               True)  # [2A, T, C]
        m = emb_masks.astype(bool)
        m2 = jnp.concatenate([m, m], axis=0)
        stage = gpt.init_cache(cfg, 2 * abatch, find_multiple(t, 8),
                               dtype=compute_dtype)
        logits, stage = gpt.prefill(params, cfg, cond, stage,
                                    prefix_mask=m2,
                                    compute_dtype=compute_dtype)
        mixed = sampling.cfg_mix_per_slot(logits, sp_rows.cfg_scale)
        firsts = sampling.sample_per_slot(rng, mixed, sp_rows.temperature,
                                          sp_rows.top_k, sp_rows.top_p)
        rows = tuple(
            jnp.stack([ckv[:abatch, :t], ckv[abatch:, :t]], axis=1)
            for ckv in stage.kv)  # [A, 2, T, 2F] each
        pads = (t - jnp.sum(m, axis=1)).astype(jnp.int32)
        return firsts, rows, pads

    return admit


def make_admit_pair(cfg: GPTConfig, compute_dtype=jnp.bfloat16):
    """Compile the t2i admission prefill for ONE cond‖uncond pair.

    Runs the full cls_token_num-long caption prefill in a single forward
    (vs 120 in-loop steps), CFG-mixes the last-position logits with the
    request's TRACED cfg_scale, samples the first grid token with its
    traced temperature/top-k/top-p. Returns (first_token, per-layer kv
    rows [2, T, 2F] bf16, prefix_pad scalar). Ref: the reference's prefill
    batching (serve/model_runner.py:248-446) — a pair-granular compiled
    program whose sampling params are data, not constants.
    """
    t = cfg.cls_token_num

    @jax.jit
    def admit(params, caption, emb_mask, rng, sp_row: SlotSampling):
        # caption [1, T, caption_dim]; emb_mask [1, T] bool (left-padded)
        from llamagen_tpu.ops.generate import build_cfg_batch

        cond = build_cfg_batch(params, cfg, caption.astype(compute_dtype),
                               True)  # [2, T, C]
        m = emb_mask.astype(bool)
        m2 = jnp.concatenate([m, m], axis=0)
        stage = gpt.init_cache(cfg, 2, find_multiple(t, 8),
                               dtype=compute_dtype)
        logits, stage = gpt.prefill(params, cfg, cond, stage,
                                    prefix_mask=m2,
                                    compute_dtype=compute_dtype)
        mixed = sampling.cfg_mix_per_slot(
            logits, sp_row.cfg_scale.reshape(1))
        first = sampling.sample_per_slot(
            rng, mixed, sp_row.temperature.reshape(1),
            sp_row.top_k.reshape(1), sp_row.top_p.reshape(1))[0]
        rows = tuple(ckv[:, :t] for ckv in stage.kv)  # [2, T, 2F] each
        pad = (t - jnp.sum(m[0]).astype(jnp.int32))
        return first, rows, pad

    return admit


def scatter_pair_local(cfg: GPTConfig, num_pairs: int, use_kernel: bool,
                       cache_dtype, f: int):
    """t2i slot-installer body, parameterized by the per-device lane width
    `f` of the k half (= kv_heads*head_dim single-chip; /ntp per TP shard
    — the int8 scale layout [.., 128] with k scales in lanes [0,64) and v
    in [64,128) is per-chip, so the same body serves both)."""
    t = cfg.cls_token_num

    def scatter(state: EngineState, slot, first_tok, rows, pad,
                sp_row: SlotSampling) -> EngineState:
        idx = jnp.stack([slot, slot + num_pairs])  # [2]
        if use_kernel:
            from llamagen_tpu.ops.attention import recent_window
            w = recent_window(cache_dtype)
        else:
            w = None
        base = (t // w) * w if use_kernel else t

        new_kv, new_sc, new_recent = [], [], []
        for l in range(cfg.n_layer):
            r = rows[l]  # [2, T, 2F] bf16
            if cache_dtype == jnp.int8:
                head = r[:, :base].astype(jnp.float32)
                ks = jnp.max(jnp.abs(head[..., :f]), axis=-1,
                             keepdims=True) / 127.0 + 1e-8
                vs = jnp.max(jnp.abs(head[..., f:]), axis=-1,
                             keepdims=True) / 127.0 + 1e-8
                q8 = jnp.concatenate(
                    [jnp.clip(jnp.round(head[..., :f] / ks), -127, 127),
                     jnp.clip(jnp.round(head[..., f:] / vs), -127, 127)],
                    axis=-1).astype(jnp.int8)
                sc = jnp.concatenate(
                    [jnp.broadcast_to(ks, (2, base, 64)),
                     jnp.broadcast_to(vs, (2, base, 64))],
                    axis=-1).astype(state.cache.kv_scale[l].dtype)
                new_kv.append(state.cache.kv[l].at[idx, :base].set(q8))
                new_sc.append(
                    state.cache.kv_scale[l].at[idx, :base].set(sc))
            else:
                new_kv.append(state.cache.kv[l].at[idx, :base].set(
                    r[:, :base].astype(state.cache.kv[l].dtype)))
            if use_kernel:
                rec = state.recent[l]
                if t > base:
                    rec = rec.at[idx, :t - base].set(
                        r[:, base:t].astype(rec.dtype))
                new_recent.append(rec)

        cache = gpt.KVCache(
            kv=tuple(new_kv),
            kv_scale=tuple(new_sc) if cache_dtype == jnp.int8 else None)
        max_new = state.tokens_out.shape[1]
        row = jnp.zeros((max_new,), jnp.int32).at[0].set(first_tok)
        counts = state.output_counts
        if counts is not None:
            counts = counts.at[slot].set(0).at[slot, first_tok].set(1)
        return state._replace(
            output_counts=counts,
            cache=cache,
            recent=tuple(new_recent) if use_kernel else state.recent,
            pos=state.pos.at[slot].set(t),
            active=state.active.at[slot].set(True),
            cur_token=state.cur_token.at[slot].set(first_tok),
            n_generated=state.n_generated.at[slot].set(1),
            tokens_out=state.tokens_out.at[slot].set(row),
            prefix_pad=state.prefix_pad.at[slot].set(pad),
            sp_slots=SlotSampling(*(a.at[slot].set(v) for a, v
                                    in zip(state.sp_slots, sp_row))))

    return scatter


def make_scatter_pair(cfg: GPTConfig, num_pairs: int, use_kernel: bool,
                      cache_dtype):
    """Compile the t2i slot installer: place one admitted pair's prefill KV
    into the engine cache at slots (i, P+i) and reset the bookkeeping.

    Kernel-path placement honors the recent-window convention
    (ops.attention docstring): rows [0, base) live in the (possibly int8-
    quantized) HBM cache, rows [base, T) in the bf16 window, where
    base = (T // w) * w.
    """
    f = cfg.kv_heads * cfg.head_dim
    scatter = scatter_pair_local(cfg, num_pairs, use_kernel, cache_dtype, f)
    return jax.jit(scatter, donate_argnums=(0,))


@dataclass
class Request:
    label: int
    request_id: int
    caption: Optional[np.ndarray] = None     # t2i: [T, caption_dim]
    emb_mask: Optional[np.ndarray] = None    # t2i: [T] bool
    sp: Optional[SamplingParams] = None      # per-request override
    result: Optional[np.ndarray] = None
    submitted_at: float = field(default_factory=time.time)
    admitted_at: Optional[float] = None      # host time of admission dispatch
    first_token_at: Optional[float] = None   # TTFT (sub-chunk, see _harvest)
    finished_at: Optional[float] = None


class ServeEngine:
    """Host-side request loop over the compiled chunk step.

    Equivalent surface to the reference's `LLM.generate` offline-batch API
    (serve/llm.py:138-219) plus incremental submit/poll for online serving.
    """

    def __init__(self, params, cfg: GPTConfig, *, num_pairs: int = 16,
                 max_new_tokens: int = 576,
                 sampling_params: Optional[SamplingParams] = None,
                 chunk: int = 64, seed: int = 0,
                 compute_dtype=jnp.bfloat16, cache_dtype=None,
                 use_kernel: Optional[bool] = None,
                 mesh=None, tp: int = 1, track_penalties: bool = False):
        from llamagen_tpu.ops.generate import _kernel_supported

        if use_kernel is None:
            use_kernel = (jax.default_backend() == "tpu"
                          and _kernel_supported(cfg))
        if cache_dtype is None:
            cache_dtype = compute_dtype
        assert cache_dtype != jnp.int8 or use_kernel or tp > 1
        self.cfg = cfg
        self.num_pairs = num_pairs
        self.max_new_tokens = max_new_tokens
        self.sp = sampling_params or SamplingParams()
        self.chunk = chunk
        self._params = params
        track_counts = self.sp.uses_penalties or track_penalties
        if tp > 1:
            # multi-chip tensor-parallel step (serve/tp_engine.py); params
            # must be placed with parallel.tp_decode.shard_tp_params(mesh)
            from llamagen_tpu.serve import tp_engine

            assert mesh is not None, "tp > 1 needs a mesh with a 'tp' axis"
            from llamagen_tpu.parallel.tp_decode import tp_param_specs_for

            pspecs = tp_param_specs_for(params, cfg)
            self.step_fn = tp_engine.make_tp_engine_step(
                cfg, max_new_tokens, mesh, tp, chunk,
                compute_dtype,
                quantized_cache=cache_dtype == jnp.int8,
                track_counts=track_counts, param_specs=pspecs)
            self.state = tp_engine.init_tp_engine_state(
                cfg, num_pairs, max_new_tokens, jax.random.PRNGKey(seed),
                mesh, tp, cache_dtype=cache_dtype,
                track_counts=track_counts, sp=self.sp)
        else:
            self.step_fn = make_engine_step(params, cfg,
                                            max_new_tokens, chunk,
                                            compute_dtype, use_kernel,
                                            track_counts=track_counts)
            self.state = init_engine_state(cfg, num_pairs, max_new_tokens,
                                           jax.random.PRNGKey(seed),
                                           cache_dtype=cache_dtype,
                                           use_kernel=use_kernel,
                                           track_counts=track_counts,
                                           sp=self.sp)
        self.slot_request: List[Optional[Request]] = [None] * num_pairs
        # host mirror of per-slot progress: lets the host compute the exact
        # number of steps until the next slot finishes WITHOUT a device
        # sync before each chunk (n_generated advances deterministically)
        self._slot_remaining = np.zeros((num_pairs,), np.int64)
        self.pending: "queue.Queue[Request]" = queue.Queue()
        self._next_id = 0
        self._latencies: List[float] = []
        self._ttfts: List[float] = []
        self._completed = 0
        self._started = time.time()
        self._admit_rng = jax.random.PRNGKey(seed + 1)
        self._t2i_tp = cfg.model_type == "t2i" and tp > 1
        if cfg.model_type == "t2i":
            if tp > 1:
                from llamagen_tpu.serve import tp_engine

                self._admit_fn = tp_engine.make_tp_admit_pair(
                    cfg, mesh, tp, compute_dtype, param_specs=pspecs)
                self._scatter_fn = tp_engine.make_tp_scatter_pair(
                    cfg, num_pairs, mesh, tp, cache_dtype,
                    track_counts=track_counts)
            else:
                # batched admission: one compiled prefill serves up to
                # _abatch pending pairs (vLLM batches prefills the same
                # way, model_runner.py:248-446)
                self._abatch = min(num_pairs, 8)
                self._admit_fn = make_admit_batch(cfg, self._abatch,
                                                  compute_dtype)
                self._scatter_fn = make_scatter_pair(cfg, num_pairs,
                                                     use_kernel, cache_dtype)

    def submit(self, label: int,
               sp: Optional[SamplingParams] = None) -> Request:
        """c2i request; `sp` optionally overrides the engine-default
        sampling params for THIS request only (traced per-slot — mixed
        cfg_scale/temperature/top-k/top-p batches run in one compiled
        program, no recompile; ref hot-swap: /root/reference/app.py:54).
        Per-request penalties additionally need the engine constructed
        with track_penalties=True (the counts buffer is structural)."""
        assert self.cfg.model_type == "c2i"
        req = Request(label=int(label), request_id=self._next_id, sp=sp)
        self._next_id += 1
        self.pending.put(req)
        return req

    def submit_caption(self, caption: np.ndarray, emb_mask: np.ndarray,
                       sp: Optional[SamplingParams] = None) -> Request:
        """t2i request: caption [T, caption_dim] T5 features (left-padded,
        text.t5.left_pad_embeddings) + [T] bool validity mask."""
        assert self.cfg.model_type == "t2i"
        req = Request(label=0, request_id=self._next_id,
                      caption=np.asarray(caption),
                      emb_mask=np.asarray(emb_mask, bool), sp=sp)
        self._next_id += 1
        self.pending.put(req)
        return req

    def _sp_row(self, req: Request) -> SlotSampling:
        sp = req.sp or self.sp
        if sp.uses_penalties and self.state.output_counts is None:
            raise ValueError(
                "per-request penalties need ServeEngine(track_penalties="
                "True) (or engine-default penalties) so the counts buffer "
                "exists in the compiled program")
        return SlotSampling(
            cfg_scale=jnp.float32(sp.cfg_scale),
            temperature=jnp.float32(sp.temperature),
            top_k=jnp.int32(sp.top_k), top_p=jnp.float32(sp.top_p),
            presence=jnp.float32(sp.presence_penalty),
            frequency=jnp.float32(sp.frequency_penalty),
            repetition=jnp.float32(sp.repetition_penalty))

    def _admit_and_step(self):
        admit_mask = np.zeros((self.num_pairs,), bool)
        admit_labels = np.zeros((self.num_pairs,), np.int32)
        admit_sp = {f: np.zeros((self.num_pairs,),
                                np.int32 if f == "top_k" else np.float32)
                    for f in SlotSampling._fields}
        newly_admitted: List[Request] = []
        if self.cfg.model_type == "t2i":
            taken: List[tuple] = []
            for i in range(self.num_pairs):
                if self.slot_request[i] is None and not self.pending.empty():
                    req = self.pending.get()
                    self.slot_request[i] = req
                    newly_admitted.append(req)
                    taken.append((i, req))
                    self._slot_remaining[i] = self.max_new_tokens - 1
            if self._t2i_tp:
                # TP admission stays pair-granular (sharded prefill)
                for i, req in taken:
                    self._admit_rng, r = jax.random.split(self._admit_rng)
                    row = self._sp_row(req)
                    first, rows, pad = self._admit_fn(
                        self._params, jnp.asarray(req.caption)[None],
                        jnp.asarray(req.emb_mask)[None], r, row)
                    self.state = self._scatter_fn(
                        self.state, jnp.int32(i), first, rows, pad, row)
            else:
                # batched admission: _abatch pairs per compiled prefill
                for start in range(0, len(taken), self._abatch):
                    grp = taken[start:start + self._abatch]
                    a = self._abatch
                    t = self.cfg.cls_token_num
                    caps = np.zeros((a, t, self.cfg.caption_dim),
                                    np.float32)
                    masks = np.ones((a, t), bool)
                    sp_rows = {f: np.zeros(
                        (a,), np.int32 if f == "top_k" else np.float32)
                        for f in SlotSampling._fields}
                    sp_rows["repetition"][:] = 1.0
                    sp_rows["top_p"][:] = 1.0
                    sp_rows["cfg_scale"][:] = 1.0
                    for j, (i, req) in enumerate(grp):
                        caps[j] = req.caption
                        masks[j] = req.emb_mask
                        row = self._sp_row(req)
                        for f in SlotSampling._fields:
                            sp_rows[f][j] = np.asarray(getattr(row, f))
                    self._admit_rng, r = jax.random.split(self._admit_rng)
                    firsts, rows, pads = self._admit_fn(
                        self._params, jnp.asarray(caps),
                        jnp.asarray(masks), r,
                        SlotSampling(**{f: jnp.asarray(v)
                                        for f, v in sp_rows.items()}))
                    for j, (i, req) in enumerate(grp):
                        self.state = self._scatter_fn(
                            self.state, jnp.int32(i), firsts[j],
                            tuple(rl[j] for rl in rows), pads[j],
                            SlotSampling(*(v[j] for v in
                                           SlotSampling(**sp_rows))))
        else:
            for i in range(self.num_pairs):
                if self.slot_request[i] is None and not self.pending.empty():
                    req = self.pending.get()
                    self.slot_request[i] = req
                    newly_admitted.append(req)
                    admit_mask[i] = True
                    admit_labels[i] = req.label
                    sp = req.sp or self.sp
                    if sp.uses_penalties and \
                            self.state.output_counts is None:
                        raise ValueError(
                            "per-request penalties need ServeEngine("
                            "track_penalties=True)")
                    for f in SlotSampling._fields:
                        admit_sp[f][i] = {
                            "cfg_scale": sp.cfg_scale,
                            "temperature": sp.temperature,
                            "top_k": sp.top_k, "top_p": sp.top_p,
                            "presence": sp.presence_penalty,
                            "frequency": sp.frequency_penalty,
                            "repetition": sp.repetition_penalty}[f]
                    self._slot_remaining[i] = self.max_new_tokens
        # exact-step chunking: run only until the next slot finishes (or
        # the chunk cap) so finished slots never idle-decode (the vLLM
        # engine harvests every step, llm_engine.py:511-581; here the
        # traced loop bound gives the same effect at compiled-step cost)
        busy = self._slot_remaining > 0
        n_steps = int(min(self._slot_remaining[busy].min(), self.chunk)) \
            if busy.any() else self.chunk
        now = time.time()
        for req in newly_admitted:
            # host time of the admission dispatch; _harvest interpolates the
            # actual first-token time from the measured per-step rate
            req.admitted_at = now
        self.state = self.step_fn(
            self._params, self.state, jnp.asarray(admit_mask),
            jnp.asarray(admit_labels),
            SlotSampling(**{f: jnp.asarray(v)
                            for f, v in admit_sp.items()}),
            jnp.int32(n_steps))
        self._slot_remaining = np.maximum(
            self._slot_remaining - (self._slot_remaining > 0) * n_steps, 0)

    def _harvest(self):
        if not any(self.slot_request):
            return
        # host bookkeeping says which slots are done; one sync for tokens
        done_slots = [i for i in range(self.num_pairs)
                      if self.slot_request[i] is not None
                      and self._slot_remaining[i] == 0]
        if done_slots:
            tokens = np.asarray(self.state.tokens_out)
            for i in done_slots:
                req = self.slot_request[i]
                req.result = tokens[i].copy()
                req.finished_at = time.time()
                self._latencies.append(req.finished_at - req.submitted_at)
                if req.admitted_at is not None:
                    # sub-chunk TTFT: the only true wall-clock observations
                    # are the admission dispatch and the harvest sync, so
                    # interpolate the first-token time at the measured
                    # per-step rate. c2i samples its first token on step 1
                    # of the admission chunk (`n_steps` known to the host);
                    # t2i samples it in the admission prefill (~one step).
                    # The admitted_at->finished_at window also includes
                    # async-dispatch backlog and host overhead between
                    # chunks, so the interpolation error is ~1 step in the
                    # uncontended case but can exceed that under load; it
                    # is still far below the <= 1 chunk bound of the
                    # pre-interpolation estimate (vLLM StatLogger records
                    # per-step, llm_engine.py:588-659).
                    steps = self.max_new_tokens \
                        if self.cfg.model_type == "c2i" \
                        else self.max_new_tokens - 1
                    per_step = (req.finished_at - req.admitted_at) \
                        / max(steps, 1)
                    req.first_token_at = req.admitted_at + per_step
                    self._ttfts.append(req.first_token_at - req.submitted_at)
                self._completed += 1
                self.slot_request[i] = None

    def run_until_idle(self) -> None:
        """Process everything in the queue to completion."""
        while (not self.pending.empty()
               or any(r is not None for r in self.slot_request)):
            self._admit_and_step()
            self._harvest()

    def generate(self, labels) -> np.ndarray:
        """Offline batch API: labels [N] -> token grids [N, max_new_tokens].

        Mirrors serve/sample_c2i.py: submit all, run to completion, return
        results in submission order.
        """
        reqs = [self.submit(l) for l in labels]
        self.run_until_idle()
        return np.stack([r.result for r in reqs])

    def generate_t2i(self, captions, emb_masks) -> np.ndarray:
        """Offline t2i batch API: captions [N, T, caption_dim] +
        emb_masks [N, T] -> token grids [N, max_new_tokens]."""
        reqs = [self.submit_caption(c, m) for c, m in zip(captions, emb_masks)]
        self.run_until_idle()
        return np.stack([r.result for r in reqs])

    def reset_stats(self) -> None:
        """Zero the stats() gauges (latency/TTFT samples, completion count,
        throughput clock). For benches that warm up/compile through the
        engine and then measure: keeps the gauge fields' names in ONE
        place instead of each bench poking the private attributes."""
        self._latencies = []
        self._ttfts = []
        self._completed = 0
        self._started = time.time()

    def stats(self) -> Dict[str, Any]:
        """Engine gauges (the reference reuses vLLM's StatLogger,
        llm_engine.py:588-659: running/waiting counts, e2e latency,
        throughput)."""
        active = np.asarray(self.state.active)
        lat = np.asarray(self._latencies) if self._latencies else None
        ttft = np.asarray(self._ttfts) if self._ttfts else None
        elapsed = max(time.time() - self._started, 1e-9)
        # TPOT (time per output token after the first), vLLM StatLogger
        # parity (llm_engine.py:588-659); TTFT is step-granular (see
        # _harvest interpolation), so TPOT inherits <=1-step error
        tpot = None
        if lat is not None and ttft is not None and len(lat) == len(ttft) \
                and self.max_new_tokens > 1:
            tpot = (lat - ttft) / (self.max_new_tokens - 1)
        return {
            "running": int(active.sum()),
            "waiting": self.pending.qsize(),
            "slots": self.num_pairs,
            "slot_occupancy": float(active.mean()),
            "completed": self._completed,
            "throughput_img_per_s": self._completed / elapsed,
            "e2e_latency_mean_s": float(lat.mean()) if lat is not None else None,
            "e2e_latency_p50_s": float(np.percentile(lat, 50))
            if lat is not None else None,
            "e2e_latency_p95_s": float(np.percentile(lat, 95))
            if lat is not None else None,
            "e2e_latency_p99_s": float(np.percentile(lat, 99))
            if lat is not None else None,
            "ttft_mean_s": float(ttft.mean()) if ttft is not None else None,
            "ttft_p50_s": float(np.percentile(ttft, 50))
            if ttft is not None else None,
            "ttft_p95_s": float(np.percentile(ttft, 95))
            if ttft is not None else None,
            "tpot_mean_s": float(tpot.mean()) if tpot is not None else None,
            "tpot_p50_s": float(np.percentile(tpot, 50))
            if tpot is not None else None,
            "tpot_p95_s": float(np.percentile(tpot, 95))
            if tpot is not None else None,
        }
