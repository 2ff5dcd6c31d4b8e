"""Speculative decoding: draft-model proposals, k+1-token target verify.

Beyond-parity feature (the reference decodes one token per target forward
everywhere: `/root/reference/autoregressive/models/generate.py:105-123`,
`/root/reference/autoregressive/serve/llm_engine.py` step loop). On TPU
the large-model decode step is weight-stream-bound (BENCH.md: GPT-XXL/3B
matmul time ~= packed weight bytes / HBM bandwidth), so verifying C=k+1
tokens in ONE target forward amortizes the per-step HBM weight read
C-fold. With proposal acceptance rate `a`, the expected committed tokens
per target forward is (1-a^(k+1))/(1-a) >= 1, and standard speculative
sampling keeps the output distribution EXACTLY the target's
(Leviathan et al., arXiv 2211.17192; Chen et al., arXiv 2302.01318).

TPU-first design:
  - fixed round shape — k single-token draft steps + one C-token verify —
    inside `lax.while_loop`; all shapes static, no host round trips.
  - per-element positions (continuous-batching style): each batch element
    commits 1..C tokens per round, so position pointers diverge. Writes
    use batched scatters; finished elements keep stepping at a frozen
    position (SPMD-safe, their writes are idempotent and outputs masked).
  - the verify forward reshapes every matmul to [B*C, D] so the existing
    W8A16 / W4A16 quantized-weight dispatch (`matmul_any`) applies
    unchanged; attention is the einsum path over the dense cache
    (update-then-read, like `gpt.decode_step`).
  - the draft reuses the serving engine's per-slot single-token decode
    step (`serve.engine._decode_step_slots`).

Correctness contracts (tested in tests/test_speculative.py):
  - greedy mode (`sample_logits=False`) is token-exact vs `ops.generate`
    for ANY draft model;
  - `spec_accept` reproduces the target distribution empirically on a
    controlled toy distribution pair;
  - draft == target at greedy accepts everything: rounds =
    ceil(max_new / (k+1)).

Attention runs the Pallas chunk kernel (`ops/chunk_attention.py`) by
default on TPU: pos-bounded cache streaming (vs the XLA path's
full-extent reads) and cache-resident tail tiles. `use_kernel=False`
selects the XLA scatter+einsum path (always used off-TPU / GQA).

Not supported: repetition/presence/frequency penalties (sequential
count dependence breaks the parallel verify), cfg_interval, int8 KV
(speculative decoding runs the bf16 cache; the int8 path stays on the
single-token windowed kernel).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from llamagen_tpu.config import GPTConfig, find_multiple
from llamagen_tpu.models import gpt
from llamagen_tpu.ops import sampling
from llamagen_tpu.ops.generate import build_cfg_batch
from llamagen_tpu.ops.quant_matmul import matmul_any


def warped_probs(logits: jnp.ndarray, temperature: float, top_k: int,
                 top_p: float) -> jnp.ndarray:
    """The EXACT probability vector `sampling.sample` draws from.

    softmax(filter(logits / T)) — acceptance tests must use the same
    warped distribution the proposals were sampled from or the
    spec-sampling guarantee breaks.
    """
    logits = logits.astype(jnp.float32) / max(temperature, 1e-5)
    logits = sampling.filter_logits(logits, top_k=top_k, top_p=top_p)
    return jax.nn.softmax(logits, axis=-1)


def _attend_chunk_xla(cfg: GPTConfig, cache: gpt.KVCache,
                      posj: jnp.ndarray, mask: jnp.ndarray,
                      freqs: jnp.ndarray, accum: gpt.CacheAccum):
    """C-token chunk einsum attention (XLA fallback): scatter the chunk's
    K|V at (b, pos[b]+j), attend every query row over the full extent with
    the per-row causal bound in `mask` [B, 1, C, S]."""
    kv_size = cfg.kv_heads * cfg.head_dim
    rep = cfg.n_head // cfg.kv_heads
    scale = cfg.head_dim ** -0.5

    def attend(l, p, qkv):
        b, c = qkv.shape[:2]
        smax = cache.max_seq_len
        q, k, v = gpt.split_heads(qkv, cfg.n_head, cfg.kv_heads,
                                  cfg.head_dim)
        q = gpt.rope_heads(q, freqs)
        k = gpt.rope_heads(k, freqs)
        kv_new = jnp.concatenate(
            [k.reshape(b, c, kv_size), v], axis=-1).astype(cache.kv[l].dtype)
        ckv = cache.kv[l].at[jnp.arange(b)[:, None], posj].set(kv_new)
        accum.kv.append(ckv)
        keys = ckv[:, :, :kv_size].reshape(b, smax, cfg.kv_heads,
                                           cfg.head_dim)
        vals = ckv[:, :, kv_size:].reshape(b, smax, cfg.kv_heads,
                                           cfg.head_dim)
        if rep != 1:
            keys = jnp.repeat(keys, rep, axis=2)
            vals = jnp.repeat(vals, rep, axis=2)
        scores = jnp.einsum("bchd,bshd->bhcs", q, keys.astype(q.dtype),
                            preferred_element_type=jnp.float32) * scale
        scores = jnp.where(mask, scores, jnp.float32(-1e30))
        probs = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
        attn = jnp.einsum("bhcs,bshd->bchd", probs, vals.astype(q.dtype))
        return attn.reshape(b, c, cfg.n_head * cfg.head_dim)

    return attend


def _attend_chunk_pallas(cfg: GPTConfig, cache: gpt.KVCache,
                         pos: jnp.ndarray, freqs: jnp.ndarray,
                         accum: gpt.CacheAccum,
                         prefix_pad: Optional[jnp.ndarray] = None):
    """C-token chunk attention via the Pallas kernel
    (ops/chunk_attention.py): pos-bounded cache streaming + aligned epoch
    tile write-backs instead of the full-extent XLA read + scatter."""
    from llamagen_tpu.ops.chunk_attention import chunk_decode_attention

    q_size = cfg.n_head * cfg.head_dim
    kv_size = cfg.kv_heads * cfg.head_dim

    def attend(l, p, qkv):
        b, c = qkv.shape[:2]
        q, k, v = gpt.split_heads(qkv, cfg.n_head, cfg.kv_heads,
                                  cfg.head_dim)
        q = gpt.rope_heads(q, freqs).reshape(b, c, q_size)
        k = gpt.rope_heads(k, freqs).reshape(b, c, kv_size)
        kv_new = jnp.concatenate([k, v], axis=-1).astype(cache.kv[l].dtype)
        attn, ckv = chunk_decode_attention(q, kv_new, cache.kv[l], pos,
                                           cfg.n_head,
                                           prefix_pad=prefix_pad)
        accum.kv.append(ckv)
        return attn

    return attend


def verify_step_slots(params, cfg: GPTConfig, toks: jnp.ndarray,
                      pos: jnp.ndarray, cache: gpt.KVCache,
                      compute_dtype=jnp.bfloat16,
                      prefix_pad: Optional[jnp.ndarray] = None,
                      use_kernel: bool = False):
    """C-token chunk forward with per-element positions.

    toks: [B, C] token ids occupying positions pos[b] .. pos[b]+C-1.
    Returns (logits [B, C, vocab] f32, new cache). Row j's logits are the
    target distribution for the token at position pos[b]+j+1.

    Same math as `gpt.decode_step` per position — causal within the chunk
    via the per-row position bound (update-then-read: the chunk's own K/V
    land in the cache before attending, so row j sees rows 0..pos+j
    including this chunk's prefix). The layer body is gpt.decode_stack
    ([B, C] lead shape: matmuls run at [B*C, D], so the W8A16/W4
    quantized-weight dispatch applies unchanged).

    use_kernel: route attention through the Pallas chunk kernel
    (ops/chunk_attention.py).
    """
    b, c = toks.shape
    h = params["tok_embeddings"][toks].astype(compute_dtype)  # [B, C, D]
    posj = pos[:, None] + jnp.arange(c)[None, :]              # [B, C]
    freqs = gpt.freqs_cis_2d(cfg)[posj]                       # [B,C,half,2]

    acc = gpt.CacheAccum()
    if use_kernel:
        gqa = cfg.kv_heads != cfg.n_head
        lanes_ok = ((cfg.kv_heads * cfg.head_dim) % 128 == 0 if gqa
                    else (cfg.n_head * cfg.head_dim) % 128 == 0)
        assert cfg.n_head % cfg.kv_heads == 0 and lanes_ok, \
            "chunk kernel: 128-aligned features (GQA r5: 128-aligned " \
            "kv lanes, mirroring ops.attention.decode_attention)"
        attend = _attend_chunk_pallas(cfg, cache, pos, freqs, acc,
                                      prefix_pad=prefix_pad)
    else:
        smax = cache.max_seq_len
        # [B, 1, C, S]: query row j attends columns <= pos[b]+j
        mask = (jnp.arange(smax)[None, None, None, :]
                <= posj[:, None, :, None])
        if prefix_pad is not None:
            mask = mask & (jnp.arange(smax)[None, None, None, :]
                           >= prefix_pad[:, None, None, None])
        attend = _attend_chunk_xla(cfg, cache, posj, mask, freqs, acc)
    logits = gpt.decode_stack(params, cfg, h, attend)
    return logits, acc.as_cache(quantized=False)


def spec_accept(rng: jax.Array, proposals: jnp.ndarray,
                q_probs: jnp.ndarray, p_probs: jnp.ndarray, *,
                sample_logits: bool = True
                ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Speculative acceptance + residual resampling.

    proposals [B, k] (drawn from q_probs), q_probs [B, k, V] (draft
    distribution at each proposal), p_probs [B, k+1, V] (target
    distribution at the k proposal slots plus the bonus slot).

    Returns (tokens [B, k+1], n_new [B] in 1..k+1): tokens[:, :n_new-1]
    are accepted proposals, tokens[:, n_new-1] is the residual resample
    (on first rejection) or the bonus draw (all accepted); entries past
    n_new are garbage. Greedy mode accepts while the proposal equals the
    target argmax — the committed chain is exactly the target's greedy
    sequence.
    """
    b, k = proposals.shape
    jpos = jnp.arange(k + 1)[None, :]
    if not sample_logits:
        tgt = jnp.argmax(p_probs, axis=-1)                    # [B, k+1]
        acc = tgt[:, :k] == proposals
        n_acc = jnp.sum(jnp.cumprod(acc.astype(jnp.int32), axis=1), axis=1)
        final = jnp.take_along_axis(tgt, n_acc[:, None], axis=1)[:, 0]
        prop_pad = jnp.pad(proposals, ((0, 0), (0, 1)))
        tokens = jnp.where(jpos < n_acc[:, None], prop_pad, final[:, None])
        return tokens, n_acc + 1

    r_u, r_res = jax.random.split(rng)
    u = jax.random.uniform(r_u, (b, k))
    q_at = jnp.take_along_axis(q_probs, proposals[..., None], -1)[..., 0]
    p_at = jnp.take_along_axis(p_probs[:, :k], proposals[..., None],
                               -1)[..., 0]
    # accept iff u < p/q  (q_at > 0: the proposal was drawn from q)
    acc = u * q_at < p_at
    n_acc = jnp.sum(jnp.cumprod(acc.astype(jnp.int32), axis=1), axis=1)
    # residual at the first rejected slot: normalize(max(p - q, 0));
    # all-accepted: bonus draw from p_probs[:, k] (q := 0 makes the same
    # formula exact)
    p_sel = jnp.take_along_axis(p_probs, n_acc[:, None, None], 1)[:, 0]
    q_sel = jnp.take_along_axis(q_probs,
                                jnp.minimum(n_acc, k - 1)[:, None, None],
                                1)[:, 0]
    q_sel = jnp.where((n_acc < k)[:, None], q_sel, 0.0)
    res = jnp.maximum(p_sel - q_sel, 0.0)
    tot = jnp.sum(res, axis=-1, keepdims=True)
    res = jnp.where(tot > 0, res / jnp.maximum(tot, 1e-20), p_sel)
    final = jax.random.categorical(
        r_res, jnp.where(res > 0, jnp.log(jnp.maximum(res, 1e-30)),
                         -jnp.inf), axis=-1)
    prop_pad = jnp.pad(proposals, ((0, 0), (0, 1)))
    tokens = jnp.where(jpos < n_acc[:, None], prop_pad, final[:, None])
    return tokens, n_acc + 1


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "draft_cfg", "max_new_tokens", "k",
                     "cfg_scale", "temperature", "top_k", "top_p",
                     "sample_logits", "compute_dtype", "force_accept",
                     "use_kernel"))
def generate_speculative(params, draft_params, rng: jax.Array,
                         cond: jnp.ndarray, *, cfg: GPTConfig,
                         draft_cfg: GPTConfig, max_new_tokens: int,
                         k: int = 4,
                         emb_masks: Optional[jnp.ndarray] = None,
                         cfg_scale: float = 1.0, temperature: float = 1.0,
                         top_k: int = 0, top_p: float = 1.0,
                         sample_logits: bool = True,
                         compute_dtype=jnp.bfloat16,
                         force_accept: Optional[int] = None,
                         use_kernel: Optional[bool] = None):
    """Speculative sampling of `max_new_tokens` grid tokens.

    Drop-in for `ops.generate.generate` (same conditioning / CFG / warp
    semantics, minus penalties and cfg_interval): `params` is the target,
    `draft_params`/`draft_cfg` the cheap proposal model — e.g. GPT-B
    drafting for GPT-3B, or a W4-quantized pytree drafting for its own
    bf16/W8A16 parent (self-speculation; both pytrees may be quantized).

    Returns (tokens [B, max_new_tokens], rounds scalar int32) — rounds is
    the number of verify forwards executed, so the measured acceptance is
    `max_new_tokens / ((k+1) * rounds)` per element in the best case.

    force_accept (benchmark harness only): commit exactly
    min(force_accept, k) proposals + 1 per round regardless of the
    accept test, keeping every other computation (draft steps, verify,
    warps, resample) real — measures wall-clock per round at a
    controlled acceptance rate without trained checkpoints
    (tests/bench_spec.py; output tokens are NOT target-distributed).
    """
    assert draft_cfg.vocab_size == cfg.vocab_size, "vocabularies must match"
    assert draft_cfg.cls_token_num == cfg.cls_token_num, \
        "draft must share the conditioning geometry"
    assert draft_cfg.model_type == cfg.model_type
    from llamagen_tpu.ops.generate import _kernel_supported
    if use_kernel is None:
        # r5: the chunk verify kernel supports GQA (same lane-tiling
        # scheme as the decode kernel), so kernel eligibility is exactly
        # _kernel_supported for both models
        use_kernel = (jax.default_backend() == "tpu"
                      and _kernel_supported(cfg)
                      and _kernel_supported(draft_cfg))
    use_cfg = cfg_scale > 1.0
    t = cfg.cls_token_num
    batch = cond.shape[0]
    batch_cfg = batch * 2 if use_cfg else batch
    c = k + 1
    # verify may write k rows past the last committed slot; the chunk
    # kernel additionally writes back full aligned epoch tiles (up to
    # 2*RECENT rows past the boundary) — keep all of it inside the
    # buffer so no write ever lands on live rows. The kernel streams the
    # cache in BLOCK_S-row blocks, so its cache length must divide by
    # min(BLOCK_S, smax) (chunk_decode_attention asserts this).
    max_seq = find_multiple(t + max_new_tokens + c + 16,
                            128 if use_kernel else 8)

    from llamagen_tpu.serve.engine import _decode_step_slots

    cond_t = build_cfg_batch(params, cfg, cond, use_cfg)
    cond_d = build_cfg_batch(draft_params, draft_cfg, cond, use_cfg)

    prefix_mask = prefix_pad = None
    if emb_masks is not None:
        m = emb_masks.astype(bool)
        if use_cfg:
            m = jnp.concatenate([m, m], axis=0)
        prefix_mask = m
        prefix_pad = (t - jnp.sum(m, axis=1)).astype(jnp.int32)

    tcache = gpt.init_cache(cfg, batch_cfg, max_seq, dtype=compute_dtype)
    dcache = gpt.init_cache(draft_cfg, batch_cfg, max_seq,
                            dtype=compute_dtype)
    tlogits, tcache = gpt.prefill(params, cfg, cond_t, tcache,
                                  prefix_mask=prefix_mask,
                                  compute_dtype=compute_dtype)
    _, dcache = gpt.prefill(draft_params, draft_cfg, cond_d, dcache,
                            prefix_mask=prefix_mask,
                            compute_dtype=compute_dtype)
    if use_cfg:
        tlogits = sampling.cfg_mix(tlogits, cfg_scale)
    rng, r0 = jax.random.split(rng)
    first = sampling.sample(r0, tlogits, temperature=temperature,
                            top_k=top_k, top_p=top_p,
                            sample_logits=sample_logits)

    sample_kw = dict(temperature=temperature, top_k=top_k, top_p=top_p,
                     sample_logits=sample_logits)
    # out column max_new is the trash slot for overshoot writes
    out = jnp.zeros((batch, max_new_tokens + 1), jnp.int32)
    out = out.at[:, 0].set(first)
    n_out = jnp.ones((batch,), jnp.int32)

    def dbl(x):
        return jnp.concatenate([x, x], axis=0) if use_cfg else x

    def round_body(carry):
        tcache, dcache, out, n_out, cur, rng, rounds = carry
        p = t + n_out - 1  # [B] position of (uncommitted-to-cache) cur
        rng, r_draft, r_acc = jax.random.split(rng, 3)

        def dstep(dc, j):
            dcache, cur_d, rng_d = dc
            if use_kernel:
                # C=1 chunk-kernel step: pos-bounded streaming, and the
                # cache-resident design survives the backward position
                # jumps rejection causes (windowed kernels cannot)
                logits, dcache = verify_step_slots(
                    draft_params, draft_cfg, dbl(cur_d)[:, None],
                    dbl(p + j), dcache, compute_dtype=compute_dtype,
                    prefix_pad=prefix_pad, use_kernel=True)
                logits = logits[:, 0]
            else:
                emb = draft_params["tok_embeddings"][dbl(cur_d)] \
                    .astype(compute_dtype)
                logits, dcache = _decode_step_slots(
                    draft_params, draft_cfg, emb, dbl(p + j), dcache,
                    compute_dtype=compute_dtype, prefix_pad=prefix_pad)
            if use_cfg:
                logits = sampling.cfg_mix(logits, cfg_scale)
            qp = warped_probs(logits, temperature, top_k, top_p)
            rng_d, r = jax.random.split(rng_d)
            nxt = sampling.sample(r, logits, **sample_kw)
            return (dcache, nxt, rng_d), (nxt, qp)

        # k+1 draft steps, k proposals: the extra step consumes x_k so the
        # draft cache holds row p+k — in the all-accept round the next
        # draft otherwise attends over a never-written (zero) row at
        # p'-1 = p+k and acceptance silently degrades
        (dcache, _, _), (props, qps) = jax.lax.scan(
            dstep, (dcache, cur, r_draft), jnp.arange(k + 1))
        props = props.T[:, :k]               # [B, k]
        qps = jnp.moveaxis(qps, 0, 1)[:, :k]  # [B, k, V]

        toks = jnp.concatenate([cur[:, None], props], axis=1)  # [B, C]
        vlogits, tcache = verify_step_slots(
            params, cfg, dbl(toks), dbl(p), tcache,
            compute_dtype=compute_dtype, prefix_pad=prefix_pad,
            use_kernel=use_kernel)
        if use_cfg:
            cond_l, uncond_l = jnp.split(vlogits, 2, axis=0)
            vlogits = uncond_l + (cond_l - uncond_l) * cfg_scale
        pps = warped_probs(vlogits, temperature, top_k, top_p)  # [B,C,V]

        tokens, n_new = spec_accept(r_acc, props, qps, pps,
                                    sample_logits=sample_logits)
        if force_accept is not None:
            n_forced = min(force_accept, k) + 1
            final = jnp.take_along_axis(tokens, (n_new - 1)[:, None],
                                        1)[:, 0]
            tokens = jnp.where(jnp.arange(c)[None, :] < n_forced - 1,
                               jnp.pad(props, ((0, 0), (0, 1))),
                               final[:, None])
            n_new = jnp.full_like(n_new, n_forced)

        widx = n_out[:, None] + jnp.arange(c)[None, :]
        valid = ((jnp.arange(c)[None, :] < n_new[:, None])
                 & (widx < max_new_tokens))
        widx = jnp.where(valid, widx, max_new_tokens)
        out = out.at[jnp.arange(batch)[:, None], widx].set(tokens)

        done = n_out >= max_new_tokens
        n_out2 = jnp.where(done, n_out,
                           jnp.minimum(n_out + n_new, max_new_tokens))
        cur2 = jnp.where(
            done, cur,
            jnp.take_along_axis(tokens, (n_new - 1)[:, None], 1)[:, 0])
        return (tcache, dcache, out, n_out2, cur2, rng, rounds + 1)

    def round_cond(carry):
        n_out, rounds = carry[3], carry[6]
        return jnp.any(n_out < max_new_tokens) & (rounds < max_new_tokens)

    carry = (tcache, dcache, out, n_out, first, rng, jnp.int32(0))
    carry = jax.lax.while_loop(round_cond, round_body, carry)
    return carry[2][:, :max_new_tokens], carry[6]
