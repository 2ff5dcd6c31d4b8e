"""Pallas TPU decode-attention kernel with in-place HBM KV cache.

Replaces the XLA decode-attention path in the AR sampling hot loop. The XLA
version (gpt.decode_step) cannot avoid cache-sized copies per step (XLA's
copy-insertion refuses to update the scan-carried cache in place) and always
reads a static extent. This kernel:

  - keeps the per-layer cache in HBM as ONE merged [B, S, 2F] buffer
    (k in lanes [0, F), v in [F, 2F)) so each streamed block costs a single
    DMA (plus one for the packed scales when quantized) — DMA issue/wait
    cost dominates at decode granularity, so fewer, larger copies win
  - aliases the cache in/out (guaranteed in-place update, zero copies)
  - streams only ceil(pos / BLOCK) blocks per batch element (average ~half
    of Smax) with flash-style online softmax in f32
  - one program walks all batch elements with the next block's DMA always
    in flight — including across batch boundaries (software pipelining)
  - new k/v pairs accumulate in a [B, w, 2F] "recent window" carried by the
    sampling scan in XLA; the kernel flushes the window into the cache with
    one aligned w-row DMA every w steps (single-row HBM writes violate
    Mosaic tiling; w = 8 for bf16, 32 for int8)
  - optional int8 cache: per-position symmetric scales packed k|v into one
    [B, S, 128] f32 buffer (k scale in lane 0, v in lane 64); quantization
    happens inside the flush, the window stays bf16-exact
  - features flattened to F = H*head_dim (128-aligned for every LlamaGen
    config); per-head score/value contractions are MXU matmuls against a
    constant [F, H] head-segment mask — no 3D reshapes in-kernel.

Functional equivalent of the reference serving path's PagedAttention call
(`/root/reference/autoregressive/serve/gpt_model.py:141-145`) — on TPU a
dense cache + bounded streaming beats paged block tables.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import os as _os

BLOCK_S = int(_os.environ.get("LLAMAGEN_BLOCK_S", "128"))
RECENT = 8        # recent-window slots for bf16/f32 caches (sublane tile)
RECENT_INT8 = 32  # int8 tiles are (32, 128): flushes must be 32-row aligned


def recent_window(cache_dtype) -> int:
    return RECENT_INT8 if cache_dtype == jnp.int8 else RECENT


def _seg_mask(n_head: int, head_dim: int) -> np.ndarray:
    """[F, H] indicator: feature f belongs to head h."""
    f = n_head * head_dim
    seg = np.arange(f) // head_dim
    return (seg[:, None] == np.arange(n_head)[None, :]).astype(np.float32)


def expand_kv(x: jnp.ndarray, rep: int) -> jnp.ndarray:
    """GQA in-kernel kv expansion: [rows, f_kv] cache half -> [rows, f] by
    LANE-TILING `rep` copies (identity under MHA). Mosaic cannot lower a
    per-head broadcast reshape ("unsupported shape cast"), but a static
    lane concat of aligned tiles is legal — so the kernels work in TILED
    head order (tiled head t reads kv head t % kv_heads) and their
    wrappers permute q in / out of that order at the XLA level via
    `tiled_head_perm`. ONE definition shared by the decode and chunk-verify
    kernels: the tiling scheme and the wrapper permutation must agree, so
    they must change together."""
    if rep == 1:
        return x
    return jnp.concatenate([x] * rep, axis=-1)


def tiled_head_perm(n_head: int, kv_heads: int):
    """(tiled_to_model, model_to_tiled) head-index permutations for the
    kernels' tiled head order: tiled head t = r*kv_heads + g attends kv
    head g, while model order follows jnp.repeat (query head h reads kv
    head h // rep — gpt._attention's convention). Wrappers gather q with
    tiled_to_model on the way in and out with model_to_tiled."""
    rep = n_head // kv_heads
    tiled_to_model = np.array(
        [(t % kv_heads) * rep + t // kv_heads for t in range(n_head)])
    return tiled_to_model, np.argsort(tiled_to_model)


def _decode_attn_kernel(
    # scalar prefetch
    pos_ref, pad_ref,
    # inputs
    seg_ref, q_ref, kv_new_ref, recent_in, kv_cache_hbm, kv_scale_hbm,
    # outputs
    out_ref, kv_cache_out, kv_scale_out, recent_out,
    # scratch
    kv_scratch, sc_scratch, flush_stage, scale_stage, recent_scr, sems,
    write_sem, recent_sem,
    *, block_s: int, scale: float, n_head: int, head_dim: int,
    kv_heads: int, use_prefix: bool, quantized: bool, w: int, batch: int,
    per_b_window: bool, split_window: bool,
):
    """grid=(1,): one program walks all batch elements, next DMA always in
    flight. recent: [B, w, 2F] exact window (HBM, aliased in/out; the kernel
    itself inserts this step's kv_new row — an XLA-side dus cost a third
    full traversal of the window buffers per step — staging live prefix
    chunks in VMEM and writing back only touched chunks); kv_cache:
    [B, S, 2F]."""
    f = n_head * head_dim
    f_kv = kv_heads * head_dim     # cache lane width (GQA: f_kv < f)
    rep = n_head // kv_heads
    seg = seg_ref[:]

    exp_kv = functools.partial(expand_kv, rep=rep)  # module docstring above
    # Window staging (three modes):
    #   bulk  — stage ALL batch rows' windows into a [B, w, 2F_kv] scratch
    #           by 8-row chunks, PREFIX-ONLY (rows past max_b(pos % w)
    #           hold no live entries), and write touched chunks back at
    #           the end. Fewest DMA issues; scratch grows with B and hits
    #           the 16 MB scoped-VMEM limit at ~96-128 slots (BENCH.md
    #           capacity sweeps).
    #   split — bulk in TWO batch halves: stage rows [0, B/2), walk them,
    #           write back + stage rows [B/2, B) at the midpoint. Halves
    #           the scratch (unlocks the 128-slot tier the bulk mode
    #           cannot compile) at +nch DMA issues per half-swap — still
    #           ~B/8x fewer issues than per-b.
    #   per-b — stage ONE row's window into a [w, 2F_kv] scratch inside
    #           the batch walk and write back only the insert's 8-row
    #           chunk. Scratch is B-INDEPENDENT (no VMEM ceiling), costs
    #           ~B/4x more (tiny) DMA issues; selected automatically for
    #           large B by the wrapper.
    nch = w // 8
    half = (batch + 1) // 2 if split_window else batch

    def _stage_group(row0, nrows):
        """Stage window rows [row0, row0+nrows) (prefix-only) into
        recent_scr rows [0, nrows); zero the dead chunks. row0/nrows are
        trace-time constants."""
        rmax = jax.lax.fori_loop(
            0, nrows,
            lambda bb, m: jnp.maximum(m, pos_ref[row0 + bb] % w),
            jnp.int32(0))
        nst = rmax // 8 + 1
        for c in range(nch):
            @pl.when(c < nst)
            def _(c=c):
                ccp = pltpu.make_async_copy(
                    recent_in.at[pl.ds(row0, nrows), pl.ds(c * 8, 8)],
                    recent_scr.at[pl.ds(0, nrows), pl.ds(c * 8, 8)],
                    recent_sem)
                ccp.start()
                ccp.wait()

            # unstaged chunks must still be FINITE: masked probabilities
            # are exactly 0 but 0 * NaN/Inf garbage = NaN in the pv
            # accumulation
            @pl.when(c >= nst)
            def _(c=c):
                recent_scr[pl.ds(0, nrows), c * 8:(c + 1) * 8] = jnp.zeros(
                    (nrows, 8, 2 * f_kv), recent_scr.dtype)

    def _writeback_group(row0, nrows):
        """Write back scratch rows [0, nrows) chunks that received an
        insert (chunks in [min, max] of the group's pos%w//8 — all staged,
        untouched staged rows rewrite their unchanged values)."""
        cmin = jax.lax.fori_loop(
            0, nrows,
            lambda bb, m: jnp.minimum(m, (pos_ref[row0 + bb] % w) // 8),
            jnp.int32(nch))
        cmax = jax.lax.fori_loop(
            0, nrows,
            lambda bb, m: jnp.maximum(m, (pos_ref[row0 + bb] % w) // 8),
            jnp.int32(0))
        for c in range(nch):
            @pl.when((cmin <= c) & (c <= cmax))
            def _(c=c):
                wcp = pltpu.make_async_copy(
                    recent_scr.at[pl.ds(0, nrows), pl.ds(c * 8, 8)],
                    recent_out.at[pl.ds(row0, nrows), pl.ds(c * 8, 8)],
                    recent_sem)
                wcp.start()
                wcp.wait()

    if not per_b_window:
        _stage_group(0, half)

    def local_row(b):
        if split_window:
            return jnp.where(b >= half, b - half, b)
        return b

    def win_read(b):
        return recent_scr[:] if per_b_window else recent_scr[local_row(b)]

    def boundary_of(b):
        return (pos_ref[b] // w) * w

    def nblk_of(b):
        return pl.cdiv(boundary_of(b), block_s)

    def nblk_safe(b):
        bb = jnp.minimum(b, batch - 1)
        return jnp.where(b < batch, nblk_of(bb), 0)

    def first_with_blocks(b_start):
        return jax.lax.while_loop(
            lambda bb: (bb < batch) & (nblk_safe(bb) == 0),
            lambda bb: bb + 1, b_start)

    def next_work(b, blk):
        return jax.lax.cond(
            blk + 1 < nblk_safe(b),
            lambda: (b, blk + 1),
            lambda: (first_with_blocks(b + 1), jnp.int32(0)))

    def start_dma(slot, b, blk):
        pltpu.make_async_copy(
            kv_cache_hbm.at[b, pl.ds(blk * block_s, block_s)],
            kv_scratch.at[slot], sems.at[slot, 0]).start()
        if quantized:
            pltpu.make_async_copy(
                kv_scale_hbm.at[b, pl.ds(blk * block_s, block_s)],
                sc_scratch.at[slot], sems.at[slot, 1]).start()

    def wait_dma(slot, b, blk):
        pltpu.make_async_copy(
            kv_cache_hbm.at[b, pl.ds(blk * block_s, block_s)],
            kv_scratch.at[slot], sems.at[slot, 0]).wait()
        if quantized:
            pltpu.make_async_copy(
                kv_scale_hbm.at[b, pl.ds(blk * block_s, block_s)],
                sc_scratch.at[slot], sems.at[slot, 1]).wait()

    # warm-up: start the first block DMA (if any batch element has blocks)
    first_b = first_with_blocks(jnp.int32(0))

    @pl.when(first_b < batch)
    def _():
        start_dma(0, first_b, 0)

    def finish_batch(b, m, l_acc, acc):
        """Recent window + output write + conditional flush."""
        pos = pos_ref[b]
        bnd = boundary_of(b)
        r_idx = pos - bnd
        q_row = q_ref[b, 0].astype(jnp.float32)[None, :]
        win = win_read(b)
        rk_raw = win[:, :f_kv]   # unexpanded: the flush writes
        rv_raw = win[:, f_kv:]   # cache rows at f_kv lanes
        rk = exp_kv(rk_raw)   # bf16; convert fuses into the q-mul
        rv = exp_kv(rv_raw)
        r_scores = jnp.dot(rk.astype(jnp.float32) * q_row, seg,
                           preferred_element_type=jnp.float32) * scale
        j = jax.lax.broadcasted_iota(jnp.int32, (w, 1), 0)
        r_valid = j <= r_idx
        if use_prefix:
            # left-padded caption prefix: positions < pad are masked
            r_valid = r_valid & (bnd + j >= pad_ref[b])
        r_scores = jnp.where(r_valid, r_scores, -1e30)
        r_max = jnp.max(r_scores, axis=0, keepdims=True)
        m_new = jnp.maximum(m, r_max)
        alpha = jnp.exp(m - m_new)
        p_r = jnp.exp(r_scores - m_new)
        l_fin = l_acc * alpha + jnp.sum(p_r, axis=0, keepdims=True)
        p_r_flat = jnp.dot(p_r, seg.T, preferred_element_type=jnp.float32)
        pv_r = jnp.sum(p_r_flat * rv.astype(jnp.float32), axis=0,
                       keepdims=True)
        alpha_flat = jnp.dot(alpha, seg.T,
                             preferred_element_type=jnp.float32)
        acc = acc * alpha_flat + pv_r
        l_flat = jnp.dot(l_fin, seg.T, preferred_element_type=jnp.float32)
        out_ref[b, :] = (acc / l_flat).astype(out_ref.dtype)

        @pl.when(r_idx == w - 1)
        def _():
            if quantized:
                # flush math stays f32-exact (scale precision feeds every
                # later read of these rows); raw f_kv-lane halves — the
                # cache stores unexpanded kv rows
                rk32 = rk_raw.astype(jnp.float32)
                rv32 = rv_raw.astype(jnp.float32)
                ksc = jnp.max(jnp.abs(rk32), axis=1,
                              keepdims=True) / 127.0 + 1e-8
                vsc = jnp.max(jnp.abs(rv32), axis=1,
                              keepdims=True) / 127.0 + 1e-8
                qk = jnp.clip(jnp.round(rk32 / ksc), -127, 127)
                qv = jnp.clip(jnp.round(rv32 / vsc), -127, 127)
                flush_stage[:] = jnp.concatenate([qk, qv], axis=1).astype(
                    jnp.int32).astype(jnp.int8)
                # k scale broadcast in lanes [0, 64), v scale in [64, 128)
                scale_stage[:] = jnp.concatenate(
                    [jnp.broadcast_to(ksc, (w, 64)),
                     jnp.broadcast_to(vsc, (w, 64))],
                    axis=1).astype(scale_stage.dtype)
                sw = pltpu.make_async_copy(
                    scale_stage, kv_scale_out.at[b, pl.ds(bnd, w)],
                    write_sem.at[1])
                sw.start()
            else:
                flush_stage[:] = win_read(b)
            kw = pltpu.make_async_copy(
                flush_stage, kv_cache_out.at[b, pl.ds(bnd, w)],
                write_sem.at[0])
            kw.start()
            kw.wait()
            if quantized:
                pltpu.make_async_copy(
                    scale_stage, kv_scale_out.at[b, pl.ds(bnd, w)],
                    write_sem.at[1]).wait()

    def outer(b, slot):
        bnd = boundary_of(b)
        nblk = nblk_of(b)
        if split_window:
            # midpoint swap: retire the first half's window rows, stage
            # the second half's (the walk never revisits rows < half)
            @pl.when(b == half)
            def _():
                _writeback_group(0, half)
                _stage_group(half, batch - half)
        if per_b_window:
            # stage THIS row's live window chunks (prefix-only), zero the
            # rest; overlaps with the block-0 cache DMA already in flight
            nst_b = (pos_ref[b] % w) // 8 + 1
            for c in range(nch):
                @pl.when(c < nst_b)
                def _(c=c):
                    ccp = pltpu.make_async_copy(
                        recent_in.at[b, pl.ds(c * 8, 8)],
                        recent_scr.at[pl.ds(c * 8, 8)], recent_sem)
                    ccp.start()
                    ccp.wait()

                @pl.when(c >= nst_b)
                def _(c=c):
                    recent_scr[c * 8:(c + 1) * 8] = jnp.zeros(
                        (8, 2 * f_kv), recent_scr.dtype)
        # insert this position's k|v row into the rolling window (masked
        # full-window select: dynamic sublane stores need static 8-aligned
        # indices on Mosaic, a [w, 2F] where does not)
        j_w = jax.lax.broadcasted_iota(jnp.int32, (w, 1), 0)
        if per_b_window:
            recent_scr[:] = jnp.where(j_w == pos_ref[b] - bnd,
                                      kv_new_ref[b], recent_scr[:])
        else:
            bl = local_row(b)
            recent_scr[bl] = jnp.where(j_w == pos_ref[b] - bnd,
                                       kv_new_ref[b], recent_scr[bl])
        # scale folded into q once per (b, layer); int8 dequant scales fold
        # into the tiny [S_blk, H] scores/probs instead of [S_blk, F] rows
        q_row = q_ref[b, 0].astype(jnp.float32)[None, :] * scale

        m0 = jnp.full((1, n_head), -1e30, jnp.float32)
        l0 = jnp.zeros((1, n_head), jnp.float32)
        acc0 = jnp.zeros((1, f), jnp.float32)

        def body(blk, carry):
            m, l_acc, acc, slot = carry
            nb, nblk2 = next_work(b, blk)

            @pl.when(nb < batch)
            def _():
                start_dma((slot + 1) % 2, nb, nblk2)

            wait_dma(slot, b, blk)
            # convert each int8 half INSIDE its consuming elementwise chain
            # (instead of one upfront [S_blk, 2F] f32 convert): Mosaic fuses
            # convert+multiply into one VPU traversal, and the decode step
            # at XXL/3B scale is VPU-pass-bound, not DMA-bound (BENCH.md r4
            # step anatomies — attention is 2.67 of XXL's 4.46 ms)
            kb = exp_kv(kv_scratch[slot][:, :f_kv])
            vb = exp_kv(kv_scratch[slot][:, f_kv:])
            scores = jnp.dot(kb.astype(jnp.float32) * q_row, seg,
                             preferred_element_type=jnp.float32)
            if quantized:
                # per-row symmetric scales fold into the [S_blk, H] scores
                # and the [S_blk, H] probabilities — O(S*H), not O(S*F)
                scores = scores * sc_scratch[slot][:, 0:1].astype(jnp.float32)
            s_global = blk * block_s + jax.lax.broadcasted_iota(
                jnp.int32, (block_s, 1), 0)
            valid = s_global < bnd
            if use_prefix:
                # left-padded caption prefix: positions < pad are masked
                valid = valid & (s_global >= pad_ref[b])
            scores = jnp.where(valid, scores, -1e30)
            blk_max = jnp.max(scores, axis=0, keepdims=True)
            m_new = jnp.maximum(m, blk_max)
            alpha = jnp.exp(m - m_new)
            p = jnp.exp(scores - m_new)
            l_new = l_acc * alpha + jnp.sum(p, axis=0, keepdims=True)
            if quantized:
                p_v = p * sc_scratch[slot][:, 64:65].astype(jnp.float32)
            else:
                p_v = p
            p_flat = jnp.dot(p_v, seg.T, preferred_element_type=jnp.float32)
            pv = jnp.sum(p_flat * vb.astype(jnp.float32), axis=0,
                         keepdims=True)
            alpha_flat = jnp.dot(alpha, seg.T,
                                 preferred_element_type=jnp.float32)
            return m_new, l_new, acc * alpha_flat + pv, (slot + 1) % 2

        m, l_acc, acc, slot = jax.lax.fori_loop(
            0, nblk, body, (m0, l0, acc0, slot))
        finish_batch(b, m, l_acc, acc)
        if per_b_window:
            # only the insert's 8-row chunk changed; write it back before
            # the next batch row reuses the scratch
            c_ins = (pos_ref[b] - bnd) // 8
            wcp = pltpu.make_async_copy(
                recent_scr.at[pl.ds(c_ins * 8, 8)],
                recent_out.at[b, pl.ds(c_ins * 8, 8)], recent_sem)
            wcp.start()
            wcp.wait()
        return slot

    jax.lax.fori_loop(0, batch, outer, jnp.int32(0))

    if not per_b_window:
        # retire the group still in scratch: rows [half, batch) in split
        # mode (the first half retired at the midpoint swap), all rows in
        # bulk mode (where half == batch)
        if split_window:
            _writeback_group(half, batch - half)
        else:
            _writeback_group(0, batch)


def decode_attention(q: jnp.ndarray, kv_new: jnp.ndarray,
                     recent: jnp.ndarray,
                     kv_cache: jnp.ndarray, pos: jnp.ndarray, n_head: int,
                     prefix_pad: Optional[jnp.ndarray] = None,
                     kv_scale: Optional[jnp.ndarray] = None,
                     *, block_s: Optional[int] = None,
                     interpret: Optional[bool] = None):
    """Single-position attention for one layer; cache AND window updated
    in place.

    q:        [B, F]      (post-RoPE, flattened heads; F = H*head_dim)
    kv_new:   [B, 2F]     this position's k | v row; the KERNEL inserts it
                          into the window at slot pos%w (aliased in/out)
    recent:   [B, w, 2F]  rolling window (k | v lanes) holding positions
                          [w*(pos//w), pos)
    kv_cache: [B, S, 2F]  positions [0, w*(pos//w)); ALIASED in place,
                          flushed from the window when pos%w == w-1.
                          May be int8: then kv_scale [B, S, 128] (f32 or
                          bf16 — bf16 halves the scale DMA traffic) holds
                          per-position dequant scales (k in lanes [0,64),
                          v in [64,128)) and the flush quantizes.
    pos: scalar int32, or [B] int32 for per-slot positions (serving)
    prefix_pad: optional [B] int32 — number of LEFT-padded (masked) caption
        positions per sample (the t2i convention right-aligns valid tokens,
        ref sample_t2i.py:92-106, so the mask is always a prefix)

    Returns (out [B, F], kv_cache, recent) or
    (out, kv_cache, kv_scale, recent) when quantized.
    """
    if block_s is None:
        block_s = BLOCK_S  # module constant read at call time (tunable)
    if interpret is None:
        # interpret mode off-TPU: the kernel is testable on CPU transparently
        interpret = jax.default_backend() != "tpu"
    quantized = kv_cache.dtype == jnp.int8
    w = recent_window(kv_cache.dtype)
    if quantized:
        assert kv_scale is not None
    b, f = q.shape
    smax = kv_cache.shape[1]
    assert f % 128 == 0, f"flattened features {f} must be 128-aligned"
    assert f % n_head == 0
    head_dim = f // n_head
    # GQA: the cache stores kv_heads*head_dim lanes (f_kv <= f); the
    # kernel lane-expands each streamed half to f (query head h reads
    # kv head h // rep — gpt._attention's jnp.repeat order)
    f_kv = kv_cache.shape[2] // 2
    assert f % f_kv == 0 and f_kv % head_dim == 0, (f, f_kv, head_dim)
    kv_heads = f_kv // head_dim
    rep = f // f_kv
    assert f_kv % 128 == 0 or rep == 1, (
        f"GQA cache half {f_kv} must be 128-aligned (lane tiling)")
    assert (2 * f_kv) % 128 == 0, (
        f"cache lanes 2*{f_kv} must be 128-aligned")
    if rep > 1:
        # the kernel lane-TILES each kv half (Mosaic-legal), so it works
        # in tiled head order (shared scheme: tiled_head_perm above);
        # permute the model-order heads in and out at the XLA level.
        b_ = q.shape[0]
        tiled_to_model, model_to_tiled = tiled_head_perm(n_head, kv_heads)
        q = q.reshape(b_, n_head, head_dim)[:, tiled_to_model, :] \
             .reshape(b_, f)
    block_s = min(block_s, smax)
    assert smax % block_s == 0, (
        f"cache len {smax} not aligned to block {block_s}")
    assert recent.shape == (b, w, 2 * f_kv), (recent.shape,
                                              (b, w, 2 * f_kv))
    assert kv_new.shape == (b, 2 * f_kv), (kv_new.shape, (b, 2 * f_kv))
    scale = head_dim ** -0.5

    use_prefix = prefix_pad is not None
    if prefix_pad is None:
        prefix_pad = jnp.zeros((b,), jnp.int32)
    if not quantized:
        kv_scale = jnp.ones((b, 1, 128), jnp.float32)

    # window staging mode: bulk [B, w, 2F_kv] scratch whenever it fits the
    # 16 MB scoped-VMEM budget (fastest — measured 5.48x vs per-b's 4.02x
    # at the GPT-L 96-slot point); split-bulk ([B/2, w, 2F_kv], two
    # half-batch stage/retire phases) when only half fits — near-bulk DMA
    # count, unlocks the 128-slot tier bulk cannot compile; B-independent
    # per-b staging beyond that (slower per step — its staging DMAs
    # serialize per batch row — but it has NO VMEM ceiling: 3B 32 slots
    # measured 2.57x vs the bulk ceiling's 2.49x; BENCH.md capacity
    # sweeps). LLAMAGEN_WINDOW_MODE=bulk|split|perb overrides.
    mode = _os.environ.get("LLAMAGEN_WINDOW_MODE", "auto")
    bulk_bytes = b * w * 2 * f_kv * recent.dtype.itemsize
    # split scratch is ceil(b/2) rows, not b/2: odd batches pay half a row
    # extra, so budget-check the REAL allocation
    split_bytes = ((b + 1) // 2) * w * 2 * f_kv * recent.dtype.itemsize
    budget = 12.25 * 2 ** 20
    if mode == "auto":
        mode = ("bulk" if bulk_bytes <= budget
                else ("split" if b > 1 and split_bytes <= budget
                      else "perb"))
    elif mode == "split" and b < 2:
        # split's two-phase midpoint swap needs two halves; at b=1 the swap
        # never runs and the final writeback degenerates to a zero-row slice
        # (env-forced A/B on a single request) — bulk is equivalent there
        mode = "bulk"
    per_b_window = mode == "perb"
    split_window = mode == "split"
    win_scr_shape = ((w, 2 * f_kv) if per_b_window
                     else (((b + 1) // 2, w, 2 * f_kv) if split_window
                           else (b, w, 2 * f_kv)))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),      # seg mask [F, H]
            pl.BlockSpec(memory_space=pltpu.VMEM),      # q [B, 1, F]
            pl.BlockSpec(memory_space=pltpu.VMEM),      # kv_new [B, 1, 2F]
            pl.BlockSpec(memory_space=pl.ANY),          # recent [B, w, 2F]
            pl.BlockSpec(memory_space=pl.ANY),          # kv_cache
            pl.BlockSpec(memory_space=pl.ANY),          # kv_scale
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),      # out [B, 1, F]
            pl.BlockSpec(memory_space=pl.ANY),          # kv_cache (aliased)
            pl.BlockSpec(memory_space=pl.ANY),          # kv_scale (aliased)
            pl.BlockSpec(memory_space=pl.ANY),          # recent (aliased)
        ],
        scratch_shapes=[
            pltpu.VMEM((2, block_s, 2 * f_kv), kv_cache.dtype),  # kv blocks
            pltpu.VMEM((2, block_s, 128), kv_scale.dtype),    # scale blocks
            pltpu.VMEM((w, 2 * f_kv), kv_cache.dtype),        # flush staging
            pltpu.VMEM((w, 128), kv_scale.dtype),             # scale staging
            pltpu.VMEM(win_scr_shape, recent.dtype),          # window stage
            pltpu.SemaphoreType.DMA((2, 2)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA,
        ],
    )

    kernel = functools.partial(
        _decode_attn_kernel, block_s=block_s, scale=scale, n_head=n_head,
        head_dim=head_dim, kv_heads=kv_heads, use_prefix=use_prefix,
        quantized=quantized, w=w, batch=b, per_b_window=per_b_window,
        split_window=split_window)

    out, kv_cache, kv_scale, recent = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b, 1, f), q.dtype),
            jax.ShapeDtypeStruct(kv_cache.shape, kv_cache.dtype),
            jax.ShapeDtypeStruct(kv_scale.shape, kv_scale.dtype),
            jax.ShapeDtypeStruct(recent.shape, recent.dtype),
        ],
        # caches + window in -> out (inputs counted incl. scalar prefetch)
        input_output_aliases={6: 1, 7: 2, 5: 3},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(jnp.broadcast_to(jnp.asarray(pos, jnp.int32).reshape(-1), (b,)),
      jnp.broadcast_to(jnp.asarray(prefix_pad, jnp.int32).reshape(-1), (b,)),
      jnp.asarray(_seg_mask(n_head, head_dim)),
      q[:, None, :], kv_new.astype(recent.dtype)[:, None, :], recent,
      kv_cache, kv_scale)
    out = out[:, 0, :]
    if rep > 1:
        # back to model head order (see the tiled-order note above)
        out = out.reshape(-1, n_head, head_dim)[:, model_to_tiled, :] \
                 .reshape(-1, f)
    if quantized:
        return out, kv_cache, kv_scale, recent
    return out, kv_cache, recent
