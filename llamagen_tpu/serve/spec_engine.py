"""Speculative-decoding serving engine: draft/verify continuous batching.

The reference retains vLLM's speculative-decoding scaffold in its engine
(`/root/reference/autoregressive/serve/gpu_executor.py:83-134`) but never
wires a draft model; this module makes the slot engine's serving path
actually speculative. Each engine ROUND (replacing `serve.engine`'s
per-token step) is:

    k+1 draft single-token steps  ->  k proposals (+1 to keep the draft
                                      cache complete in all-accept rounds)
    one C=k+1-token target verify ->  commit 1..C tokens per slot
                                      (ops/speculative.spec_accept)

so the big model streams its weights once per 1..C committed tokens —
the lever for the weights-bound tail (GPT-XXL/3B), where a decode step
is HBM-weight-stream-bound (BENCH.md step anatomies).

Differences vs the non-speculative `serve.engine.ServeEngine`:
  - slots advance a DATA-DEPENDENT number of tokens per round, so the
    host cannot mirror progress deterministically; after each compiled
    chunk of rounds the host syncs the tiny [P] `n_generated` vector and
    harvests/admits on that.
  - admission is out-of-band (like the t2i path of the plain engine): a
    compiled batched prefill fills BOTH models' condition rows, samples
    each request's first token from the TARGET's CFG-mixed logits —
    TTFT is therefore exact (the first token exists at admission time).
  - caches are bf16 and cache-resident (the chunk kernel's epoch-tile
    write-back survives the backward position jumps rejection causes;
    the int8 windowed kernel's monotonic-pos invariant does not), sized
    with the chunk + write-back margin and 128-aligned on the kernel
    path (see ops/chunk_attention.py docstring).
  - per-request cfg_scale / temperature / top-k / top-p are traced
    per-slot data, including greedy rows: temperature <= 0 rows run the
    EXACT argmax-chain acceptance (spec_accept's greedy branch,
    vectorized per row) — not the temperature -> 0 limit of the sampled
    acceptance, which differs under tied logits (the limit draws
    uniformly among ties; argmax deterministically picks the first).
  - penalties are NOT supported (their sequential count dependence
    breaks the parallel verify; `ops/speculative.py` module docstring).

Correctness contracts (tests/test_spec_engine.py): greedy output is
token-exact vs the non-speculative engine / `ops.generate` per request,
including mixed per-slot cfg_scale batches and t2i left-padded captions.
"""

from __future__ import annotations

import math
import queue
import time
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from llamagen_tpu.config import GPTConfig, find_multiple
from llamagen_tpu.models import gpt
from llamagen_tpu.ops import sampling
from llamagen_tpu.ops.generate import build_cfg_batch, _kernel_supported
from llamagen_tpu.ops.speculative import spec_accept, verify_step_slots
from llamagen_tpu.serve.engine import (Request, SamplingParams, SlotSampling,
                                       _decode_step_slots, slot_sampling_full)
from typing import NamedTuple  # noqa: E402  (grouped with its user below)


class SpecEngineState(NamedTuple):
    tcache: gpt.KVCache         # target per-layer [2P, Smax, 2F]
    dcache: gpt.KVCache         # draft  per-layer [2P, Smax, 2Fd]
    pos: jnp.ndarray            # [P] position of the uncommitted cur token
    active: jnp.ndarray         # [P] bool
    cur_token: jnp.ndarray      # [P] last committed (not yet cached) token
    n_generated: jnp.ndarray    # [P] tokens produced so far (incl. first)
    tokens_out: jnp.ndarray     # [P, max_new+1] output buffer (+trash col)
    rng: jax.Array
    sp_slots: SlotSampling
    prefix_pad: Optional[jnp.ndarray] = None  # t2i [P] left-pad counts


def warped_probs_per_slot(logits: jnp.ndarray, temperature: jnp.ndarray,
                          top_k: jnp.ndarray,
                          top_p: jnp.ndarray) -> jnp.ndarray:
    """Per-slot traced-parameter version of `ops.speculative.warped_probs`.

    logits [P, V] or [P, C, V]; params [P]. Must be EXACTLY the
    distribution `sampling.sample_per_slot` draws from (same temperature
    clamp, same filters) or the acceptance guarantee breaks. Greedy rows
    (temperature <= 0) produce a clamped-temperature softmax whose
    argmax (what the greedy acceptance path reads) matches the logits'.
    """
    shape = logits.shape
    v = shape[-1]
    logits = logits.astype(jnp.float32).reshape(shape[0], -1, v)
    c = logits.shape[1]
    logits = logits / jnp.maximum(temperature, 1e-5)[:, None, None]
    flat = logits.reshape(-1, v)
    filters_off = jnp.all((top_k <= 0) & (top_p >= 1.0))
    flat = jax.lax.cond(
        filters_off, lambda l: l,
        lambda l: sampling.filter_logits_per_slot(
            l, jnp.repeat(top_k, c), jnp.repeat(top_p, c)), flat)
    return jax.nn.softmax(flat, axis=-1).reshape(shape)


def spec_accept_per_slot(rng: jax.Array, proposals: jnp.ndarray,
                         q_probs: jnp.ndarray, p_probs: jnp.ndarray,
                         greedy: jnp.ndarray):
    """`ops.speculative.spec_accept` with a PER-ROW greedy flag.

    Sampled rows take the stochastic accept/resample path; greedy rows
    (temperature <= 0) take the argmax-chain path — accept while the
    proposal equals the target argmax, then commit the target argmax.
    Both are computed (cheap arithmetic next to the forwards) and
    selected per row, so one compiled program serves mixed batches.
    p_probs' argmax equals the mixed logits' argmax (softmax with any
    positive temperature is monotone and preserves tie order), so the
    greedy path needs no separate logits input.
    """
    tokens_s, n_s = spec_accept(rng, proposals, q_probs, p_probs,
                                sample_logits=True)
    tokens_g, n_g = spec_accept(rng, proposals, q_probs, p_probs,
                                sample_logits=False)
    return (jnp.where(greedy[:, None], tokens_g, tokens_s),
            jnp.where(greedy, n_g, n_s))


def make_spec_engine_step(cfg: GPTConfig, draft_cfg: GPTConfig,
                          max_new_tokens: int, k: int, chunk_rounds: int,
                          compute_dtype=jnp.bfloat16,
                          use_kernel: bool = False,
                          force_accept: Optional[int] = None):
    """Compile the chunked speculative step.

    spec_chunk(params, draft_params, state, n_rounds) runs
    `min(n_rounds, chunk_rounds)` draft+verify rounds (traced bound: the
    host picks the all-accept lower bound on rounds until the next slot
    can finish, then syncs). Finished/inactive slots keep stepping at a
    frozen position — SPMD-safe: their cache writes land on scratch rows
    above their committed prefix and their outputs are masked.
    """
    c = k + 1

    def one_round(params, draft_params, state: SpecEngineState):
        p = state.pos
        ss = state.sp_slots
        num_pairs = p.shape[0]
        rng, r_draft, r_acc = jax.random.split(state.rng, 3)

        def dbl(x):
            return jnp.concatenate([x, x], axis=0)

        pad2 = (dbl(state.prefix_pad)
                if state.prefix_pad is not None else None)

        def dstep(carry, j):
            dcache, cur_d, rng_d = carry
            if use_kernel:
                logits, dcache = verify_step_slots(
                    draft_params, draft_cfg, dbl(cur_d)[:, None],
                    dbl(p + j), dcache, compute_dtype=compute_dtype,
                    prefix_pad=pad2, use_kernel=True)
                logits = logits[:, 0]
            else:
                emb = draft_params["tok_embeddings"][dbl(cur_d)] \
                    .astype(compute_dtype)
                logits, dcache = _decode_step_slots(
                    draft_params, draft_cfg, emb, dbl(p + j), dcache,
                    compute_dtype=compute_dtype, prefix_pad=pad2)
            mixed = sampling.cfg_mix_per_slot(logits, ss.cfg_scale)
            qp = warped_probs_per_slot(mixed, ss.temperature, ss.top_k,
                                       ss.top_p)
            rng_d, r = jax.random.split(rng_d)
            nxt = sampling.sample_per_slot(r, mixed, ss.temperature,
                                           ss.top_k, ss.top_p)
            return (dcache, nxt, rng_d), (nxt, qp)

        # k+1 draft steps, k proposals (ops/speculative.py round_body: the
        # extra step keeps the draft cache complete in all-accept rounds)
        (dcache, _, _), (props, qps) = jax.lax.scan(
            dstep, (state.dcache, state.cur_token, r_draft),
            jnp.arange(k + 1))
        props = props.T[:, :k]                  # [P, k]
        qps = jnp.moveaxis(qps, 0, 1)[:, :k]    # [P, k, V]

        toks = jnp.concatenate([state.cur_token[:, None], props], axis=1)
        vlogits, tcache = verify_step_slots(
            params, cfg, dbl(toks), dbl(p), state.tcache,
            compute_dtype=compute_dtype, prefix_pad=pad2,
            use_kernel=use_kernel)
        cond_l, uncond_l = jnp.split(vlogits, 2, axis=0)
        vmixed = uncond_l + (cond_l - uncond_l) * ss.cfg_scale[:, None, None]
        pps = warped_probs_per_slot(vmixed, ss.temperature, ss.top_k,
                                    ss.top_p)   # [P, C, V]

        tokens, n_new = spec_accept_per_slot(r_acc, props, qps, pps,
                                             ss.temperature <= 0.0)
        if force_accept is not None:
            n_forced = min(force_accept, k) + 1
            final = jnp.take_along_axis(tokens, (n_new - 1)[:, None],
                                        1)[:, 0]
            tokens = jnp.where(jnp.arange(c)[None, :] < n_forced - 1,
                               jnp.pad(props, ((0, 0), (0, 1))),
                               final[:, None])
            n_new = jnp.full_like(n_new, n_forced)

        going = state.active & (state.n_generated < max_new_tokens)
        n_new = jnp.where(going, n_new, 0)
        # cap by the remaining quota BEFORE pos advances (the batch path
        # derives pos from the clamped n_out, ops/speculative.py:348,412 —
        # same invariant): an unclamped finishing slot would freeze at up
        # to pos = t+max_new+k, and its dead draft steps at pos..pos+k
        # would push the chunk kernel's aligned epoch-tile write-backs
        # past the smax = t+max_new+k+17 cache allocation at large k
        # (in-kernel DMA is not bounds-checked on TPU).
        n_new = jnp.minimum(n_new, max_new_tokens - state.n_generated)
        widx = state.n_generated[:, None] + jnp.arange(c)[None, :]
        valid = ((jnp.arange(c)[None, :] < n_new[:, None])
                 & (widx < max_new_tokens))
        widx = jnp.where(valid, widx, max_new_tokens)  # trash column
        tokens_out = state.tokens_out.at[
            jnp.arange(num_pairs)[:, None], widx].set(tokens)

        n_gen2 = jnp.minimum(state.n_generated + n_new, max_new_tokens)
        last = jnp.take_along_axis(
            tokens, jnp.maximum(n_new - 1, 0)[:, None], 1)[:, 0]
        cur2 = jnp.where(going, last, state.cur_token)
        pos2 = jnp.where(going, p + n_new, p)
        active2 = state.active & (n_gen2 < max_new_tokens)
        return state._replace(tcache=tcache, dcache=dcache, pos=pos2,
                              active=active2, cur_token=cur2,
                              n_generated=n_gen2, tokens_out=tokens_out,
                              rng=rng)

    def spec_chunk(params, draft_params, state: SpecEngineState, n_rounds):
        return jax.lax.fori_loop(
            0, jnp.minimum(n_rounds, chunk_rounds),
            lambda i, s: one_round(params, draft_params, s), state)

    return jax.jit(spec_chunk, donate_argnums=(2,))


def make_spec_admit_batch(cfg: GPTConfig, draft_cfg: GPTConfig, abatch: int,
                          compute_dtype=jnp.bfloat16):
    """Compile batched admission for up to `abatch` pairs: prefill the
    condition into BOTH models' staging caches, sample each request's
    first token from the TARGET's CFG-mixed last-position logits with its
    per-request traced params. Returns (firsts [A], target rows
    [A, 2, T, 2F], draft rows [A, 2, T, 2Fd], pads [A])."""
    t = cfg.cls_token_num
    is_t2i = cfg.model_type == "t2i"

    @jax.jit
    def admit(params, draft_params, cond, emb_masks, rng,
              sp_rows: SlotSampling):
        m2 = None
        pads = jnp.zeros((abatch,), jnp.int32)
        if is_t2i:
            m = emb_masks.astype(bool)
            m2 = jnp.concatenate([m, m], axis=0)
            pads = (t - jnp.sum(m, axis=1)).astype(jnp.int32)
            cond = cond.astype(compute_dtype)
        stage_t = gpt.init_cache(cfg, 2 * abatch, find_multiple(t, 8),
                                 dtype=compute_dtype)
        logits, stage_t = gpt.prefill(
            params, cfg, build_cfg_batch(params, cfg, cond, True),
            stage_t, prefix_mask=m2, compute_dtype=compute_dtype)
        stage_d = gpt.init_cache(draft_cfg, 2 * abatch, find_multiple(t, 8),
                                 dtype=compute_dtype)
        _, stage_d = gpt.prefill(
            draft_params, draft_cfg,
            build_cfg_batch(draft_params, draft_cfg, cond, True),
            stage_d, prefix_mask=m2, compute_dtype=compute_dtype)
        mixed = sampling.cfg_mix_per_slot(logits, sp_rows.cfg_scale)
        firsts = sampling.sample_per_slot(rng, mixed, sp_rows.temperature,
                                          sp_rows.top_k, sp_rows.top_p)
        rows_t = tuple(jnp.stack([ckv[:abatch, :t], ckv[abatch:, :t]], 1)
                       for ckv in stage_t.kv)
        rows_d = tuple(jnp.stack([ckv[:abatch, :t], ckv[abatch:, :t]], 1)
                       for ckv in stage_d.kv)
        return firsts, rows_t, rows_d, pads

    return admit


def make_spec_scatter(cfg: GPTConfig, draft_cfg: GPTConfig, num_pairs: int,
                      abatch: int):
    """Compile the batched slot installer: place `abatch` admitted pairs'
    prefill KV rows into both caches at slots (i, P+i), reset slot
    bookkeeping. Unused entries carry slot index 2P and are dropped by
    the scatter (mode='drop')."""
    t = cfg.cls_token_num

    def scatter(state: SpecEngineState, slots, firsts, rows_t, rows_d,
                pads, sp_rows: SlotSampling) -> SpecEngineState:
        # slots [A] int32 (2P = unused -> dropped); firsts [A];
        # rows_* per layer [A, 2, T, 2F]; pads [A]
        idx = jnp.concatenate([slots, jnp.where(slots < num_pairs,
                                                slots + num_pairs,
                                                2 * num_pairs)])
        tkv = tuple(
            state.tcache.kv[l].at[idx, :t].set(
                jnp.concatenate([rows_t[l][:, 0], rows_t[l][:, 1]], 0)
                .astype(state.tcache.kv[l].dtype), mode="drop")
            for l in range(cfg.n_layer))
        dkv = tuple(
            state.dcache.kv[l].at[idx, :t].set(
                jnp.concatenate([rows_d[l][:, 0], rows_d[l][:, 1]], 0)
                .astype(state.dcache.kv[l].dtype), mode="drop")
            for l in range(draft_cfg.n_layer))
        max_new1 = state.tokens_out.shape[1]
        rows = jnp.zeros((slots.shape[0], max_new1), jnp.int32) \
            .at[:, 0].set(firsts)
        return state._replace(
            tcache=gpt.KVCache(kv=tkv, kv_scale=None),
            dcache=gpt.KVCache(kv=dkv, kv_scale=None),
            pos=state.pos.at[slots].set(t, mode="drop"),
            active=state.active.at[slots].set(True, mode="drop"),
            cur_token=state.cur_token.at[slots].set(firsts, mode="drop"),
            n_generated=state.n_generated.at[slots].set(1, mode="drop"),
            tokens_out=state.tokens_out.at[slots].set(rows, mode="drop"),
            prefix_pad=(state.prefix_pad.at[slots].set(pads, mode="drop")
                        if state.prefix_pad is not None else None),
            sp_slots=SlotSampling(*(a.at[slots].set(v, mode="drop")
                                    for a, v in zip(state.sp_slots,
                                                    sp_rows))))

    return jax.jit(scatter, donate_argnums=(0,))


class SpecEngine:
    """Host-side speculative serving loop (draft/verify over slots).

    Same request surface as `serve.engine.ServeEngine` (submit /
    submit_caption / generate / generate_t2i / run_until_idle / stats),
    minus penalties. `draft_params`/`draft_cfg` must share vocabulary and
    conditioning geometry with the target (e.g. GPT-B drafting for
    GPT-XXL, or a W4-quantized pytree self-drafting its W8A16 parent).
    """

    def __init__(self, params, draft_params, cfg: GPTConfig,
                 draft_cfg: GPTConfig, *, num_pairs: int = 8,
                 max_new_tokens: int = 576, k: int = 4,
                 sampling_params: Optional[SamplingParams] = None,
                 chunk_rounds: int = 16, seed: int = 0,
                 compute_dtype=jnp.bfloat16,
                 use_kernel: Optional[bool] = None,
                 force_accept: Optional[int] = None,
                 mesh=None, tp: int = 1):
        if mesh is not None or tp != 1:
            # Documented won't-do (PARITY.md): TP composition requires
            # shard_mapping BOTH models' kernels (the target's chunk-verify
            # kernel AND the draft's decode kernel) over the tp axis — the
            # machinery exists per-kernel (parallel/tp_decode.py) but the
            # spec round interleaves them with host-side accept logic that
            # would serialize cross-chip. Speculation's win is weights-
            # bound single-chip decode; multi-chip serving of XXL/3B
            # should use ServeEngine(mesh=, tp=) whose TP stack already
            # beats the spec break-even there.
            raise NotImplementedError(
                "SpecEngine is single-chip by design: use ServeEngine with "
                "mesh=/tp= for multi-chip serving, or SpecEngine on one "
                "chip for the weights-bound tail (see PARITY.md, "
                "'speculative engine' section).")
        assert draft_cfg.vocab_size == cfg.vocab_size
        assert draft_cfg.cls_token_num == cfg.cls_token_num
        assert draft_cfg.model_type == cfg.model_type
        if use_kernel is None:
            # r5: the chunk verify kernel supports GQA (lane-tiled like
            # the decode kernel), so eligibility == _kernel_supported
            use_kernel = (jax.default_backend() == "tpu"
                          and _kernel_supported(cfg)
                          and _kernel_supported(draft_cfg))
        self.cfg = cfg
        self.draft_cfg = draft_cfg
        self.num_pairs = num_pairs
        self.max_new_tokens = max_new_tokens
        self.k = k
        self.sp = sampling_params or SamplingParams()
        assert not self.sp.uses_penalties, \
            "speculative serving does not support penalties " \
            "(ops/speculative.py module docstring)"
        self._params = params
        self._draft_params = draft_params
        c = k + 1
        smax = find_multiple(cfg.cls_token_num + max_new_tokens + c + 16,
                             128 if use_kernel else 8)
        self.state = SpecEngineState(
            tcache=gpt.init_cache(cfg, 2 * num_pairs, smax,
                                  dtype=compute_dtype),
            dcache=gpt.init_cache(draft_cfg, 2 * num_pairs, smax,
                                  dtype=compute_dtype),
            pos=jnp.zeros((num_pairs,), jnp.int32),
            active=jnp.zeros((num_pairs,), bool),
            cur_token=jnp.zeros((num_pairs,), jnp.int32),
            n_generated=jnp.zeros((num_pairs,), jnp.int32),
            tokens_out=jnp.zeros((num_pairs, max_new_tokens + 1), jnp.int32),
            rng=jax.random.PRNGKey(seed),
            sp_slots=slot_sampling_full(self.sp, num_pairs),
            prefix_pad=(jnp.zeros((num_pairs,), jnp.int32)
                        if cfg.model_type == "t2i" else None))
        self.step_fn = make_spec_engine_step(
            cfg, draft_cfg, max_new_tokens, k, chunk_rounds, compute_dtype,
            use_kernel, force_accept=force_accept)
        self.chunk_rounds = chunk_rounds
        self._abatch = min(num_pairs, 8)
        self._admit_fn = make_spec_admit_batch(cfg, draft_cfg, self._abatch,
                                               compute_dtype)
        self._scatter_fn = make_spec_scatter(cfg, draft_cfg, num_pairs,
                                             self._abatch)
        self.slot_request: List[Optional[Request]] = [None] * num_pairs
        self._n_gen_host = np.zeros((num_pairs,), np.int64)
        self.pending: "queue.Queue[Request]" = queue.Queue()
        self._next_id = 0
        self._latencies: List[float] = []
        self._ttfts: List[float] = []
        self._completed = 0
        self._rounds = 0
        self._slot_rounds = 0   # sum over chunks of busy_slots * n_rounds
        self._tokens_committed = 0
        self._started = time.time()
        self._admit_rng = jax.random.PRNGKey(seed + 1)

    # ---- request surface (mirrors ServeEngine) ----

    def submit(self, label: int,
               sp: Optional[SamplingParams] = None) -> Request:
        assert self.cfg.model_type == "c2i"
        if sp is not None:
            assert not sp.uses_penalties, \
                "speculative serving does not support penalties"
        req = Request(label=int(label), request_id=self._next_id, sp=sp)
        self._next_id += 1
        self.pending.put(req)
        return req

    def submit_caption(self, caption: np.ndarray, emb_mask: np.ndarray,
                       sp: Optional[SamplingParams] = None) -> Request:
        assert self.cfg.model_type == "t2i"
        if sp is not None:
            assert not sp.uses_penalties, \
                "speculative serving does not support penalties"
        req = Request(label=0, request_id=self._next_id,
                      caption=np.asarray(caption),
                      emb_mask=np.asarray(emb_mask, bool), sp=sp)
        self._next_id += 1
        self.pending.put(req)
        return req

    def _admit(self):
        taken: List[tuple] = []
        for i in range(self.num_pairs):
            if self.slot_request[i] is None and not self.pending.empty():
                req = self.pending.get()
                self.slot_request[i] = req
                taken.append((i, req))
        t = self.cfg.cls_token_num
        is_t2i = self.cfg.model_type == "t2i"
        for start in range(0, len(taken), self._abatch):
            grp = taken[start:start + self._abatch]
            a = self._abatch
            slots = np.full((a,), 2 * self.num_pairs, np.int32)  # dropped
            if is_t2i:
                cond = np.zeros((a, t, self.cfg.caption_dim), np.float32)
                masks = np.ones((a, t), bool)
            else:
                cond = np.zeros((a,), np.int32)
                masks = np.ones((a, 1), bool)
            sp_rows = {f: np.zeros((a,), np.int32 if f == "top_k"
                                   else np.float32)
                       for f in SlotSampling._fields}
            sp_rows["repetition"][:] = 1.0
            sp_rows["top_p"][:] = 1.0
            sp_rows["cfg_scale"][:] = 1.0
            for j, (i, req) in enumerate(grp):
                slots[j] = i
                if is_t2i:
                    cond[j] = req.caption
                    masks[j] = req.emb_mask
                else:
                    cond[j] = req.label
                sp = req.sp or self.sp
                vals = {"cfg_scale": sp.cfg_scale,
                        "temperature": sp.temperature,
                        "top_k": sp.top_k, "top_p": sp.top_p,
                        "presence": 0.0, "frequency": 0.0,
                        "repetition": 1.0}
                for f in SlotSampling._fields:
                    sp_rows[f][j] = vals[f]
            self._admit_rng, r = jax.random.split(self._admit_rng)
            rows = SlotSampling(**{f: jnp.asarray(v)
                                   for f, v in sp_rows.items()})
            firsts, rows_t, rows_d, pads = self._admit_fn(
                self._params, self._draft_params, jnp.asarray(cond),
                jnp.asarray(masks), r, rows)
            self.state = self._scatter_fn(self.state, jnp.asarray(slots),
                                          firsts, rows_t, rows_d, pads,
                                          rows)
            now = time.time()
            for i, req in grp:
                self._n_gen_host[i] = 1
                req.first_token_at = now  # exact: sampled in the admit call

    def _step_and_sync(self):
        busy = np.array([r is not None for r in self.slot_request])
        if not busy.any():
            return
        remaining = self.max_new_tokens - self._n_gen_host[busy]
        # all-accept lower bound on rounds until the NEXT slot can finish
        n_rounds = max(1, math.ceil(int(remaining.min()) / (self.k + 1)))
        n_rounds = min(n_rounds, self.chunk_rounds)
        self.state = self.step_fn(self._params, self._draft_params,
                                  self.state, jnp.int32(n_rounds))
        n_gen = np.asarray(self.state.n_generated)
        self._tokens_committed += int(
            (n_gen[busy] - self._n_gen_host[busy]).sum())
        self._rounds += n_rounds
        self._slot_rounds += int(busy.sum()) * n_rounds
        self._n_gen_host[:] = n_gen

    def _harvest(self):
        done = [i for i in range(self.num_pairs)
                if self.slot_request[i] is not None
                and self._n_gen_host[i] >= self.max_new_tokens]
        if not done:
            return
        tokens = np.asarray(self.state.tokens_out)
        for i in done:
            req = self.slot_request[i]
            req.result = tokens[i, :self.max_new_tokens].copy()
            req.finished_at = time.time()
            self._latencies.append(req.finished_at - req.submitted_at)
            if req.first_token_at is not None:
                self._ttfts.append(req.first_token_at - req.submitted_at)
            self._completed += 1
            self.slot_request[i] = None

    def run_until_idle(self) -> None:
        while (not self.pending.empty()
               or any(r is not None for r in self.slot_request)):
            self._admit()
            self._step_and_sync()
            self._harvest()

    def generate(self, labels) -> np.ndarray:
        reqs = [self.submit(l) for l in labels]
        self.run_until_idle()
        return np.stack([r.result for r in reqs])

    def generate_t2i(self, captions, emb_masks) -> np.ndarray:
        reqs = [self.submit_caption(cp, m)
                for cp, m in zip(captions, emb_masks)]
        self.run_until_idle()
        return np.stack([r.result for r in reqs])

    def stats(self) -> Dict[str, Any]:
        active = np.asarray(self.state.active)
        lat = np.asarray(self._latencies) if self._latencies else None
        ttft = np.asarray(self._ttfts) if self._ttfts else None
        elapsed = max(time.time() - self._started, 1e-9)
        # mean committed tokens per (slot, round); slots that finish inside
        # a chunk still count their frozen rounds, so this is a mild
        # underestimate at completion waves
        tpr = (self._tokens_committed / self._slot_rounds
               if self._slot_rounds else None)
        return {
            "running": int(active.sum()),
            "waiting": self.pending.qsize(),
            "slots": self.num_pairs,
            "completed": self._completed,
            "throughput_img_per_s": self._completed / elapsed,
            "rounds": self._rounds,
            "tokens_per_round_per_slot": tpr,
            # mean per-slot acceptance implied by tokens/round (k+1 max)
            "acceptance_rate": (None if tpr is None or self.k == 0
                                else max(0.0, min(1.0, (tpr - 1) / self.k))),
            "e2e_latency_mean_s": (float(lat.mean())
                                   if lat is not None else None),
            "ttft_mean_s": float(ttft.mean()) if ttft is not None else None,
        }
