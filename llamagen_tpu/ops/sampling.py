"""On-device token sampling: temperature, top-k, top-p, categorical.

Matches the semantics of the reference sampler
(`/root/reference/autoregressive/models/generate.py:16-66`) but runs fully
inside jit: top-k via lax.top_k thresholding, top-p via sort + cumulative
softmax, draw via Gumbel-max (jax.random.categorical) instead of torch
multinomial — same distribution, different RNG stream.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

NEG_INF = jnp.float32(-1e30)


def top_k_filter(logits: jnp.ndarray, top_k: int) -> jnp.ndarray:
    """Keep the top_k largest logits per row (ref: generate.py:32-36).

    top_k is static. Ties at the threshold are kept (same as the reference's
    `logits < kth_value` mask).
    """
    if top_k <= 0:
        return logits
    k = min(max(top_k, 1), logits.shape[-1])
    kth = jax.lax.top_k(logits, k)[0][..., -1:]
    return jnp.where(logits < kth, NEG_INF, logits)


def top_p_filter(logits: jnp.ndarray, top_p: float) -> jnp.ndarray:
    """Nucleus filtering (ref: generate.py:38-53).

    Keeps the smallest prefix of descending-probability tokens whose
    cumulative probability exceeds top_p (the first token crossing the
    threshold is kept, as in the reference's shift-right).
    """
    if top_p >= 1.0:
        return logits
    sorted_logits = jnp.sort(logits, axis=-1)[..., ::-1]
    probs = jax.nn.softmax(sorted_logits, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    # token i is removed iff the cumulative prob *before* it already > top_p
    exclusive = cum - probs
    keep_sorted = exclusive <= top_p
    # threshold = smallest kept logit in sorted order
    thresholds = jnp.min(
        jnp.where(keep_sorted, sorted_logits, jnp.float32(jnp.inf)), axis=-1,
        keepdims=True)
    return jnp.where(logits < thresholds, NEG_INF, logits)


def filter_logits(logits: jnp.ndarray, top_k: int = 0,
                  top_p: float = 1.0) -> jnp.ndarray:
    logits = top_k_filter(logits, top_k)
    logits = top_p_filter(logits, top_p)
    return logits


def sample(rng: jax.Array, logits: jnp.ndarray, *, temperature: float = 1.0,
           top_k: int = 0, top_p: float = 1.0,
           sample_logits: bool = True) -> jnp.ndarray:
    """logits [B, V] -> token ids [B] (ref: generate.py:57-66)."""
    logits = logits.astype(jnp.float32) / max(temperature, 1e-5)
    logits = filter_logits(logits, top_k=top_k, top_p=top_p)
    if sample_logits:
        return jax.random.categorical(rng, logits, axis=-1)
    return jnp.argmax(logits, axis=-1)


def filter_logits_per_slot(logits: jnp.ndarray, top_k: jnp.ndarray,
                           top_p: jnp.ndarray) -> jnp.ndarray:
    """Per-row top-k/top-p filtering with TRACED parameters.

    Serving-engine variant of filter_logits: top_k [B] int32 (0 = off) and
    top_p [B] f32 (>= 1.0 = off) are arrays, so one compiled program serves
    requests with different sampling settings (the reference hot-swaps a
    new Sampler per request, `/root/reference/app.py:54`; on TPU a re-trace
    would recompile, so the params are data instead). One descending sort
    serves both filters. Matches the static filters' tie semantics
    (threshold comparisons are `<`, ties at the boundary kept).
    """
    v = logits.shape[-1]
    sorted_logits = jnp.sort(logits, axis=-1)[..., ::-1]
    # top-k threshold: sorted value at index k-1 (k<=0 disables)
    kk = jnp.clip(top_k, 0, v)
    kth = jnp.take_along_axis(sorted_logits,
                              jnp.maximum(kk - 1, 0)[:, None], axis=-1)
    kth = jnp.where((kk > 0)[:, None], kth, NEG_INF)
    # top-p threshold: smallest kept logit in sorted order
    probs = jax.nn.softmax(sorted_logits, axis=-1)
    exclusive = jnp.cumsum(probs, axis=-1) - probs
    keep_sorted = exclusive <= top_p[:, None]
    pth = jnp.min(
        jnp.where(keep_sorted, sorted_logits, jnp.float32(jnp.inf)), axis=-1,
        keepdims=True)
    pth = jnp.where((top_p >= 1.0)[:, None], NEG_INF, pth)
    thr = jnp.maximum(kth, pth)
    return jnp.where(logits < thr, NEG_INF, logits)


def sample_per_slot(rng: jax.Array, logits: jnp.ndarray,
                    temperature: jnp.ndarray, top_k: jnp.ndarray,
                    top_p: jnp.ndarray) -> jnp.ndarray:
    """Per-row traced-parameter sampling: logits [B, V] -> ids [B].

    temperature [B] f32 (0 = greedy argmax), top_k [B] int32 (0 = off),
    top_p [B] f32 (>=1 = off). Same distribution as sample() when the
    rows are uniform (parity-tested)."""
    logits = logits.astype(jnp.float32) \
        / jnp.maximum(temperature, 1e-5)[:, None]
    # runtime gate: when every slot has filtering off (the common serving
    # configuration, top_k=0/top_p=1), skip the [B, V] sort entirely —
    # lax.cond executes one branch, so the per-slot engine step pays the
    # sort only when some request actually asked for top-k/top-p
    filters_off = jnp.all((top_k <= 0) & (top_p >= 1.0))
    logits = jax.lax.cond(
        filters_off, lambda l: l,
        lambda l: filter_logits_per_slot(l, top_k, top_p), logits)
    drawn = jax.random.categorical(rng, logits, axis=-1)
    greedy = jnp.argmax(logits, axis=-1)
    return jnp.where(temperature <= 0.0, greedy, drawn)


def apply_penalties_per_slot(logits: jnp.ndarray, output_counts: jnp.ndarray,
                             presence: jnp.ndarray, frequency: jnp.ndarray,
                             repetition: jnp.ndarray) -> jnp.ndarray:
    """apply_penalties with TRACED per-row parameters [B] (serving engine).

    Same vLLM semantics as apply_penalties; a row with
    presence=frequency=0, repetition=1 is exactly a no-op, so mixed
    batches where only some requests carry penalties are correct.
    """
    out_mask = output_counts > 0
    rep = jnp.where(out_mask, repetition[:, None].astype(jnp.float32), 1.0)
    logits = jnp.where(logits > 0, logits / rep, logits * rep)
    logits = logits - frequency[:, None] * output_counts.astype(logits.dtype)
    logits = logits - presence[:, None] * out_mask.astype(logits.dtype)
    return logits


def cfg_mix_per_slot(logits: jnp.ndarray,
                     cfg_scale: jnp.ndarray) -> jnp.ndarray:
    """cfg_mix with a per-pair traced scale [B] (scale 1.0 = plain cond)."""
    cond, uncond = jnp.split(logits, 2, axis=0)
    return uncond + (cond - uncond) * cfg_scale[:, None]


def apply_penalties(logits: jnp.ndarray, output_counts: jnp.ndarray,
                    presence: float = 0.0, frequency: float = 0.0,
                    repetition: float = 1.0,
                    prompt_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """OpenAI-style presence/frequency + HF repetition penalties.

    Exactly the reference serving sampler's `_apply_penalties`
    (`/root/reference/autoregressive/serve/sampler.py:205-226`):
      repetition: seen tokens get logits/r (if >0) else logits*r
      frequency:  logits -= frequency * count(token in output)
      presence:   logits -= presence  * (token in output)

    logits [B, V]; output_counts [B, V] int (per-token emission counts —
    callers accumulate them across decode steps); prompt_mask optional
    [B, V] bool (tokens in the prompt; c2i/t2i conditions are not vocab
    tokens, so None is the LlamaGen-faithful default).
    """
    out_mask = output_counts > 0
    seen = out_mask if prompt_mask is None else (out_mask | prompt_mask)
    if repetition != 1.0:
        rep = jnp.where(seen, jnp.float32(repetition), 1.0)
        logits = jnp.where(logits > 0, logits / rep, logits * rep)
    if frequency != 0.0:
        logits = logits - frequency * output_counts.astype(logits.dtype)
    if presence != 0.0:
        logits = logits - presence * out_mask.astype(logits.dtype)
    return logits


def update_output_counts(counts: jnp.ndarray,
                         tokens: jnp.ndarray) -> jnp.ndarray:
    """counts [B, V] += onehot(tokens [B]) — the decode-loop accumulator."""
    b = counts.shape[0]
    return counts.at[jnp.arange(b), tokens].add(1)


def cfg_mix(logits: jnp.ndarray, cfg_scale,
            enabled=True) -> jnp.ndarray:
    """Classifier-free-guidance combine on a [cond ‖ uncond] double batch.

    logits: [2B, V] -> [B, V] = uncond + (cond - uncond) * scale
    (ref: generate.py:82,96-99). `enabled` may be a traced bool
    (cfg_interval support): when False, returns the cond half unchanged.
    """
    cond, uncond = jnp.split(logits, 2, axis=0)
    scale = jnp.where(enabled, jnp.float32(cfg_scale), jnp.float32(1.0))
    return uncond + (cond - uncond) * scale
