"""Fully-jitted autoregressive sampling loop with classifier-free guidance.

Functional equivalent of the reference decode path
(`/root/reference/autoregressive/models/generate.py:77-176`) with the
python-level token loop replaced by a single compiled `lax.scan`:

  prefill(cond ‖ null-cond) -> sample -> scan of (decode_step -> CFG mix ->
  sample) with the KV cache threaded as scan carry. One XLA program per
  (model, batch, grid) geometry; zero host round-trips during generation.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from llamagen_tpu.config import GPTConfig, find_multiple
from llamagen_tpu.models import gpt
from llamagen_tpu.ops import sampling


def build_cfg_batch(params, cfg: GPTConfig, cond: jnp.ndarray,
                    use_cfg: bool) -> jnp.ndarray:
    """[cond ‖ null-cond] double batch (ref: generate.py:128-141)."""
    if not use_cfg:
        return cond
    if cfg.model_type == "c2i":
        null = jnp.full_like(cond, cfg.num_classes)
    else:
        uncond = params["cls_embedding"]["uncond_embedding"].astype(cond.dtype)
        null = jnp.broadcast_to(uncond[None], cond.shape)
    return jnp.concatenate([cond, null], axis=0)


def _kernel_supported(cfg: GPTConfig, *, warn: bool = True) -> bool:
    """Whether the Pallas decode-attention kernel handles this geometry.

    MHA and GQA both run (the kernel lane-expands kv rows per query
    head, ops/attention.expand_kv); the lane-width constraints are that
    F = n_head*head_dim is 128-aligned and the cache rows
    2*kv_heads*head_dim are 128-aligned. Unsupported geometries fall
    back to the XLA decode path — loudly, so nobody ships a
    silently-slow serving config.
    """
    gqa = cfg.kv_heads != cfg.n_head
    ok = (cfg.n_head % cfg.kv_heads == 0
          and (cfg.n_head * cfg.head_dim) % 128 == 0
          and (cfg.kv_heads * cfg.head_dim) % (128 if gqa else 64) == 0)
    if not ok and warn:
        import warnings
        warnings.warn(
            f"Pallas decode-attention kernel unsupported for this config "
            f"(n_head={cfg.n_head}, kv_heads={cfg.kv_heads}, "
            f"head_dim={cfg.head_dim}: F or kv lanes not 128-aligned); "
            f"falling back to the XLA decode path (~3x slower per step "
            f"at GPT-L scale).", stacklevel=2)
    return ok


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "max_new_tokens", "cfg_scale", "cfg_interval",
                     "temperature", "top_k", "top_p", "presence_penalty",
                     "frequency_penalty", "repetition_penalty",
                     "sample_logits", "compute_dtype", "cache_dtype",
                     "use_kernel"))
def generate(params, rng: jax.Array, cond: jnp.ndarray, *,
             cfg: GPTConfig, max_new_tokens: int,
             emb_masks: Optional[jnp.ndarray] = None,
             cfg_scale: float = 1.0, cfg_interval: int = -1,
             temperature: float = 1.0, top_k: int = 0, top_p: float = 1.0,
             presence_penalty: float = 0.0, frequency_penalty: float = 0.0,
             repetition_penalty: float = 1.0,
             sample_logits: bool = True, use_kernel: Optional[bool] = None,
             compute_dtype=jnp.bfloat16, cache_dtype=jnp.bfloat16) -> jnp.ndarray:
    """Sample `max_new_tokens` code-grid tokens.

    cond: [B] class labels (c2i) or [B, T, caption_dim] T5 features (t2i).
    emb_masks: optional [B, T] bool caption validity (t2i left-padding).
    use_kernel: run the Pallas decode-attention kernel (default: on TPU
    whenever the model shape supports it).
    Returns token ids [B, max_new_tokens]. Ref: generate.py:126-176.
    """
    if use_kernel is None:
        use_kernel = (jax.default_backend() == "tpu"
                      and _kernel_supported(cfg))
    quantize_kv = cache_dtype == jnp.int8
    assert not quantize_kv or use_kernel, "int8 KV requires the kernel path"
    use_cfg = cfg_scale > 1.0
    t = cfg.cls_token_num
    batch = cond.shape[0]
    max_seq = find_multiple(t + max_new_tokens, 128 if use_kernel else 8)
    batch_cfg = batch * 2 if use_cfg else batch

    cond_combined = build_cfg_batch(params, cfg, cond, use_cfg)
    if quantize_kv:
        # prefill into a small exact staging cache, then quantize
        from llamagen_tpu.ops.attention import recent_window
        stage_len = find_multiple(t + recent_window(jnp.int8), 8)
        cache = gpt.init_cache(cfg, batch_cfg, stage_len, dtype=compute_dtype)
    else:
        cache = gpt.init_cache(cfg, batch_cfg, max_seq, dtype=cache_dtype)

    # t2i caption-validity mask folded into attention (ref: generate.py:154-163);
    # masks are left-padded prefixes (sample_t2i.py:92-106), so the kernel
    # path only needs the per-sample pad count
    prefix_mask = prefix_allow = prefix_pad = None
    if emb_masks is not None:
        m = emb_masks.astype(bool)
        if use_cfg:
            m = jnp.concatenate([m, m], axis=0)
        prefix_mask = m  # [Bc, T]
        prefix_allow = jnp.concatenate(
            [m, jnp.ones((batch_cfg, max_seq - t), bool)], axis=1)
        prefix_pad = (t - jnp.sum(m, axis=1)).astype(jnp.int32)  # [Bc]

    sample_kw = dict(temperature=temperature, top_k=top_k, top_p=top_p,
                     sample_logits=sample_logits)
    # OpenAI-style penalties (ref serve/sampler.py:205-226, applied after
    # the CFG mix like the reference sampler pipeline)
    use_pen = (presence_penalty != 0.0 or frequency_penalty != 0.0
               or repetition_penalty != 1.0)

    def penalize(logits, counts):
        if not use_pen:
            return logits
        return sampling.apply_penalties(
            logits, counts, presence=presence_penalty,
            frequency=frequency_penalty, repetition=repetition_penalty)

    # ---- prefill (ref: generate.py:77-86) ----
    logits, cache = gpt.prefill(params, cfg, cond_combined, cache,
                                prefix_mask=prefix_mask,
                                compute_dtype=compute_dtype)
    stage_cache = cache
    if quantize_kv:
        cache = gpt.quantize_cache(cache, cfg, max_seq)
    if use_cfg:
        logits = sampling.cfg_mix(logits, cfg_scale)
    counts = jnp.zeros((batch, cfg.vocab_size), jnp.int32)
    logits = penalize(logits, counts)
    rng, step_rng = jax.random.split(rng)
    first_token = sampling.sample(step_rng, logits, **sample_kw)  # [B]
    counts = sampling.update_output_counts(counts, first_token)

    # ---- decode loop (ref: generate.py:105-123) ----
    if use_kernel:
        # Pallas path: the kernel bounds its own reads by pos and updates
        # the HBM cache in place; one scan over all steps.
        from llamagen_tpu.ops.attention import recent_window

        # seed the recent windows from the cache rows around the prefill
        # boundary (positions [w*(t//w), w*(t//w)+w) — covers prefix rows
        # written by prefill when t is not window-aligned). With int8 KV the
        # window is seeded from the exact bf16 staging cache.
        w = recent_window(cache_dtype)
        base = (t // w) * w
        seed_src = stage_cache if quantize_kv else cache
        recent = tuple(
            jax.lax.dynamic_slice(ckv, (0, base, 0), (batch_cfg, w,
                                                      ckv.shape[2]))
            for ckv in seed_src.kv)

        def kstep(carry, i):
            cache, recent, cur, counts, rng = carry
            tok = jnp.concatenate([cur, cur], axis=0) if use_cfg else cur
            pos = t + i
            logits, cache, recent = gpt.decode_step_pallas(
                params, cfg, tok, pos, cache, recent,
                prefix_pad=prefix_pad, compute_dtype=compute_dtype)
            if use_cfg:
                enabled = (i <= cfg_interval) if cfg_interval > -1 else True
                logits = sampling.cfg_mix(logits, cfg_scale, enabled=enabled)
            logits = penalize(logits, counts)
            rng, step_rng = jax.random.split(rng)
            nxt = sampling.sample(step_rng, logits, **sample_kw)
            counts = sampling.update_output_counts(counts, nxt)
            return (cache, recent, nxt, counts, rng), nxt

        _, rest = jax.lax.scan(
            kstep, (cache, recent, first_token, counts, rng),
            jnp.arange(max_new_tokens - 1))
        if max_new_tokens == 1:
            return first_token[:, None]
        return jnp.concatenate([first_token[:, None], rest.T], axis=1)

    # XLA fallback: segmented scan with bucketed static read extents —
    # each segment's attention reads a 128-aligned bound covering its
    # largest position, cutting average KV traffic ~2x vs full reads.
    def make_step(extent):
        def step(carry, i):
            cache, cur, counts, rng = carry
            tok = jnp.concatenate([cur, cur], axis=0) if use_cfg else cur
            pos = t + i
            logits, cache = gpt.decode_step(params, cfg, tok, pos, cache,
                                            prefix_allow=prefix_allow,
                                            compute_dtype=compute_dtype,
                                            read_extent=extent)
            if use_cfg:
                if cfg_interval > -1:
                    enabled = i <= cfg_interval  # ref: cfg off past interval
                else:
                    enabled = True
                logits = sampling.cfg_mix(logits, cfg_scale, enabled=enabled)
            logits = penalize(logits, counts)
            rng, step_rng = jax.random.split(rng)
            nxt = sampling.sample(step_rng, logits, **sample_kw)
            counts = sampling.update_output_counts(counts, nxt)
            return (cache, nxt, counts, rng), nxt

        return step

    seg = 128
    steps_total = max_new_tokens - 1
    carry = (cache, first_token, counts, rng)
    chunks = []
    i0 = 0
    while i0 < steps_total:
        n = min(seg, steps_total - i0)
        # the segment's LAST step writes kv at pos = t+i0+n-1 and must read
        # it back (update-then-read, attend_cache_xla), so the extent must
        # cover pos+1 = t+i0+n: rounding up from pos itself returned exactly
        # pos when it sat on a 128 boundary (c2i t=1: every segment), and
        # that step's query silently missed its own k/v (max |dlogit| 0.07
        # at GPT-B random weights — measured; token-level impact rare but
        # real). find_multiple(pos+1) is exact.
        extent = min(find_multiple(t + i0 + n, seg), max_seq)
        carry, toks = jax.lax.scan(make_step(extent), carry,
                                   jnp.arange(i0, i0 + n))
        chunks.append(toks)
        i0 += n

    if chunks:
        rest = jnp.concatenate(chunks, axis=0)
        return jnp.concatenate([first_token[:, None], rest.T], axis=1)
    return first_token[:, None]
