"""AWQ-style activation-aware weight equalization for W4 serving.

Int4 RTN error is dominated by input channels whose activations are large:
a fixed per-group weight scale wastes resolution on channels the model
barely drives. AWQ [Lin et al. 2023] rescales weight ROWS by a per-input-
channel factor s_k = mean|x_k|^alpha (alpha grid-searched to minimize the
quantized layer's output error) and folds the compensating 1/s into the
producing op, so the model function is unchanged before quantization and
only the QUANTIZATION GRID shifts toward the salient channels.

Every fold in this architecture is exact (no extra runtime op):

    wqkv   rows * s  <-  attention_norm / s       (rms_norm scale vector)
    w1,w3  rows * s  <-  ffn_norm / s             (shared input => one s)
    w2     rows * s  <-  w3 output columns / s    (x_w2 = silu(w1x) * w3x
                                                   is linear in w3's out)
    wo     rows * s  <-  v-projection columns / s (attention out channel
                                                   (h, d) is linear in v
                                                   channel (h // rep, d);
                                                   s is pooled over each
                                                   kv group so GQA repeat
                                                   stays consistent)

Calibration reuses the GPTQ capture (`ops/gptq._layer_matmul_inputs`):
a teacher-forced forward over calibration tokens, inputs recomputed per
layer. The equalized pytree is ordinary bf16 params — chain it into
`quantize_gpt_params_w4k` (RTN) or `gptq_quantize_gpt_params` unchanged.

The reference has no quantization path at all (fp16 + A100 bandwidth,
`/root/reference/autoregressive/serve/README.md`); this closes the W4
numerics gap flagged in the round-2 review (VERDICT #3).
"""

from __future__ import annotations

import functools
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from llamagen_tpu.config import GPTConfig
from llamagen_tpu.models import gpt
from llamagen_tpu.ops.gptq import _calib_stream, _group_table, \
    _layer_matmul_inputs
from llamagen_tpu.ops.w4_matmul import SEG_ROWS

DEFAULT_ALPHAS = (0.0, 0.25, 0.5, 0.75, 1.0)


@functools.partial(jax.jit, static_argnames=("ngroups",))
def _rtn_dequant(w: jnp.ndarray, gid: jnp.ndarray, *, ngroups: int):
    """Round-trip W through the serving kernel's int4 grid (group max/7)."""
    mx = jax.ops.segment_max(jnp.abs(w), gid, num_segments=ngroups)
    sc = mx / 7.0 + 1e-12
    return jnp.clip(jnp.round(w / sc[gid]), -8, 7) * sc[gid]


@functools.partial(jax.jit, static_argnames=("ngroups",))
def _fold_loss(xs: jnp.ndarray, w: jnp.ndarray, s: jnp.ndarray,
               gid: jnp.ndarray, *, ngroups: int) -> jnp.ndarray:
    """|| (x/s) @ Q(s*W) - x @ W ||^2 on the calibration subsample."""
    dq = _rtn_dequant(w * s[:, None], gid, ngroups=ngroups)
    ref = xs @ w
    got = (xs / s[None, :]) @ dq
    return jnp.mean((got - ref) ** 2)


def _subsample(x: jnp.ndarray, sample: int) -> jnp.ndarray:
    """[B, S, K] -> [M, K] f32, stride-sampled (deterministic)."""
    flat = x.reshape(-1, x.shape[-1]).astype(jnp.float32)
    n = flat.shape[0]
    if n <= sample:
        return flat
    stride = n // sample
    return flat[:: stride][:sample]


def _search_scale(x: jnp.ndarray, ws: Sequence[jnp.ndarray],
                  gid: jnp.ndarray, ngroups: int,
                  alphas: Sequence[float], sample: int,
                  pool: Optional[callable] = None,
                  rel_margin: float = 0.02
                  ) -> Tuple[jnp.ndarray, np.ndarray]:
    """Grid-search alpha for one fold point.

    x: [B, S, K] calibration inputs; ws: the weights consuming x (loss is
    summed — w1/w3 share their fold). pool: optional [K]->[K] projection
    of the activation statistic onto the feasible scale set (kv-group
    pooling for the wo fold). Returns (s [K] f32, losses per alpha).

    A non-identity alpha is accepted only if it beats alpha=0 (plain RTN
    grid) by rel_margin relative local loss: the search is layer-local
    and greedy, so a marginal local win (flat-activation regimes, e.g.
    random weights) does not predict an end-to-end win — require a real
    one. alphas[0] must be 0.0.
    """
    xs = _subsample(x, sample)
    amean = jnp.maximum(jnp.mean(jnp.abs(xs), axis=0), 1e-5)
    if pool is not None:
        amean = pool(amean)
    losses = []
    cands = []
    for alpha in alphas:
        s = amean ** jnp.float32(alpha)
        # center the scale range so s and 1/s stay bounded
        s = s / jnp.sqrt(jnp.max(s) * jnp.min(s))
        s = jnp.clip(s, 1e-4, 1e4)
        loss = sum(_fold_loss(xs, w, s, gid, ngroups=ngroups) for w in ws)
        losses.append(float(loss))
        cands.append(s)
    assert alphas[0] == 0.0, "alpha grid must lead with identity (0.0)"
    best = int(np.argmin(losses))
    if losses[best] >= losses[0] * (1.0 - rel_margin):
        best = 0
    return cands[best], np.asarray(losses)


def awq_equalize_gpt_params(params, cfg: GPTConfig, cond, tokens, *,
                            per_channel: bool = False,
                            group_size: int = SEG_ROWS,
                            alphas: Sequence[float] = DEFAULT_ALPHAS,
                            sample: int = 1024,
                            compute_dtype=jnp.bfloat16,
                            verbose: bool = False):
    """Return an equalized copy of a GPT param pytree (same structure,
    same function up to float rounding; quantize it afterwards).

    cond/tokens: calibration labels + token ids, as in
    `gptq_quantize_gpt_params`. group_size/per_channel select the int4
    grid the grid search optimizes against — match them to the mode you
    will quantize with.
    """
    idx = tokens[:, :-1]
    h, freqs, mask = _calib_stream(params, cfg, cond, idx, compute_dtype)
    capture = jax.jit(functools.partial(_layer_matmul_inputs, cfg=cfg))

    rep = cfg.n_head // cfg.kv_heads
    hd = cfg.head_dim
    q_size = cfg.n_head * hd
    kv_size = cfg.kv_heads * hd

    def pool_kv(amean):
        """Pool the [D]-domain statistic over each GQA repeat group so the
        resulting scale is realizable by a v-column fold."""
        g = amean.reshape(cfg.kv_heads, rep, hd)
        return jnp.broadcast_to(jnp.mean(g, axis=1, keepdims=True),
                                g.shape).reshape(-1)

    def table(k):
        gid, _, _ = _group_table(k, group_size, per_channel)
        return jnp.asarray(gid), (1 if per_channel else int(gid.max()) + 1)

    eq: Dict[str, list] = {k: [] for k in (
        "attention_norm", "ffn_norm", "wqkv", "wo", "w1", "w2", "w3")}

    for l in range(cfg.n_layer):
        p_l = gpt.layer_params(params, l)
        inputs, h = capture(p_l, h, freqs, mask)
        f32 = {k: p_l[k].astype(jnp.float32)
               for k in ("attention_norm", "ffn_norm", "wqkv", "wo",
                         "w1", "w2", "w3")}

        gid_d, ng_d = table(cfg.dim)
        gid_f, ng_f = table(cfg.ffn_hidden_dim)

        s_qkv, l_qkv = _search_scale(inputs["wqkv"], [f32["wqkv"]],
                                     gid_d, ng_d, alphas, sample)
        s_ffn, l_ffn = _search_scale(inputs["w1"], [f32["w1"], f32["w3"]],
                                     gid_d, ng_d, alphas, sample)
        s_w2, l_w2 = _search_scale(inputs["w2"], [f32["w2"]],
                                   gid_f, ng_f, alphas, sample)
        s_wo, l_wo = _search_scale(inputs["wo"], [f32["wo"]],
                                   gid_d, ng_d, alphas, sample, pool=pool_kv)
        # the v-column divisor lives in the kv domain: one value per
        # (kv_head, d), shared by the rep q-heads that read it
        s_v = s_wo.reshape(cfg.kv_heads, rep, hd)[:, 0].reshape(-1)

        an = f32["attention_norm"] / s_qkv
        fn = f32["ffn_norm"] / s_ffn
        wqkv = f32["wqkv"] * s_qkv[:, None]
        wqkv = wqkv.at[:, q_size + kv_size:].divide(s_v[None, :])
        wo = f32["wo"] * s_wo[:, None]
        w1 = f32["w1"] * s_ffn[:, None]
        w3 = (f32["w3"] * s_ffn[:, None]) / s_w2[None, :]
        w2 = f32["w2"] * s_w2[:, None]

        dt = params["layers"]["wqkv"].dtype
        for k, v in (("attention_norm", an), ("ffn_norm", fn),
                     ("wqkv", wqkv), ("wo", wo), ("w1", w1),
                     ("w2", w2), ("w3", w3)):
            eq[k].append(v.astype(dt))
        if verbose:
            pick = lambda ls: alphas[int(np.argmin(ls))]
            print(f"awq: layer {l + 1}/{cfg.n_layer} alphas "
                  f"qkv={pick(l_qkv)} ffn={pick(l_ffn)} "
                  f"w2={pick(l_w2)} wo={pick(l_wo)}", flush=True)

    out = dict(params)
    layers = dict(out["layers"])
    for k, vs in eq.items():
        layers[k] = jnp.stack(vs)
    out["layers"] = layers
    return out
