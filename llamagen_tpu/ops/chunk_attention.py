"""Pallas TPU chunk decode-attention: C queries per element, in-place cache.

The speculative-decoding verify step (`ops/speculative.py`) scores C=k+1
chunk tokens against the whole KV prefix in one forward. The XLA path
scatters the chunk's K|V into the dense cache and attends over the FULL
[B, Smax] extent every call; this kernel instead:

  - streams only ceil(bnd / BLOCK) cache blocks per element (bnd = the
    w-aligned boundary below pos), like the single-token decode kernel
    (`ops/attention.py`) — average ~half of Smax, in-flight double-
    buffered DMA across batch elements;
  - is CACHE-RESIDENT: no rolling-window side state. Each call seeds a
    [2w, 2F] VMEM scratch from the cache's current epoch tile (one
    ALIGNED w-row read at bnd), inserts the chunk's C rows, computes the
    tail attention there, and writes the touched epoch tiles back (one
    or two ALIGNED w-row writes). Single rows never cross HBM, so the
    Mosaic tiling rules hold at ANY position — including the backward
    position jumps speculative rejection causes, which the rolling-window
    kernel's monotonic-pos invariant cannot survive;
  - computes all C query rows against each streamed block: DMA once,
    C (small, static) MXU passes — the flattened-head seg-mask trick of
    the single-token kernel, unrolled over chunk rows. Chunk causality
    is the per-row position bound (row pos+i visible to query c iff
    i <= c).

bf16/f32 caches only (speculative decoding's configuration); the int8
single-token path keeps its exact-window kernel. The chunk dim is padded
to CP=8 rows (sublane tile) — pad queries produce ignored outputs and
pad K|V rows are never inserted.

Callers must allocate the cache with at least `w` spare rows after the
largest pos+C they will touch (the second epoch tile write-back needs
bnd+2w <= Smax); `ops.speculative` sizes its cache accordingly.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from llamagen_tpu.ops.attention import (BLOCK_S, RECENT, _seg_mask,
                                        expand_kv, tiled_head_perm)

CP = 8  # padded chunk rows (sublane tile)


def _chunk_attn_kernel(
    # scalar prefetch
    pos_ref, pad_ref,
    # inputs
    seg_ref, q_ref, kv_new_ref, kv_cache_hbm,
    # outputs
    out_ref, kv_cache_out,
    # scratch
    kv_scratch, recent2, sems, seed_sem, write_sem,
    *, block_s: int, scale: float, n_head: int, head_dim: int,
    kv_heads: int, n_chunk: int, use_prefix: bool, w: int, batch: int,
):
    """grid=(1,): one program walks all batch elements with the next
    cache-block DMA always in flight (same pipeline skeleton as
    ops/attention._decode_attn_kernel)."""
    f = n_head * head_dim
    f_kv = kv_heads * head_dim
    rep = n_head // kv_heads
    seg = seg_ref[:]

    exp_kv = functools.partial(expand_kv, rep=rep)  # shared w/ decode kernel

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
            kv_scratch.at[slot], sems.at[slot]).start()

    def wait_dma(slot, b, blk):
        pltpu.make_async_copy(
            kv_cache_hbm.at[b, pl.ds(blk * block_s, block_s)],
            kv_scratch.at[slot], sems.at[slot]).wait()

    first_b = first_with_blocks(jnp.int32(0))

    @pl.when(first_b < batch)
    def _():
        start_dma(0, first_b, 0)

    def outer(b, slot):
        pos = pos_ref[b]
        bnd = boundary_of(b)
        nblk = nblk_of(b)

        # ---- seed the 2-epoch tail scratch from the cache (aligned) ----
        scp = pltpu.make_async_copy(
            kv_cache_hbm.at[b, pl.ds(bnd, w)], recent2.at[pl.ds(0, w)],
            seed_sem)
        scp.start()
        scp.wait()
        # second epoch tile starts empty; garbage would NaN-poison the
        # masked pv sums, so zero it explicitly
        recent2[w:2 * w] = jnp.zeros((w, 2 * f_kv), recent2.dtype)

        # insert the chunk's rows at slots (pos - bnd) + i (static unroll)
        j_r = jax.lax.broadcasted_iota(jnp.int32, (2 * w, 1), 0)
        for i in range(n_chunk):
            recent2[:] = jnp.where(j_r == pos - bnd + i,
                                   kv_new_ref[b, i][None, :], recent2[:])

        # ---- per-chunk-row online-softmax state (static lists) ----
        q_rows = [q_ref[b, c].astype(jnp.float32)[None, :] * scale
                  for c in range(n_chunk)]
        m0 = tuple(jnp.full((1, n_head), -1e30, jnp.float32)
                   for _ in range(n_chunk))
        l0 = tuple(jnp.zeros((1, n_head), jnp.float32)
                   for _ in range(n_chunk))
        a0 = tuple(jnp.zeros((1, f), jnp.float32) for _ in range(n_chunk))

        def body(blk, carry):
            m, l_acc, acc, slot = carry
            nb, nblk2 = next_work(b, blk)

            @pl.when(nb < batch)
            def _():
                start_dma((slot + 1) % 2, nb, nblk2)

            wait_dma(slot, b, blk)
            kvb = kv_scratch[slot].astype(jnp.float32)  # [S_blk, 2F_kv]
            kb = exp_kv(kvb[:, :f_kv])               # [S_blk, F]
            vb = exp_kv(kvb[:, f_kv:])
            s_global = blk * block_s + jax.lax.broadcasted_iota(
                jnp.int32, (block_s, 1), 0)
            valid = s_global < bnd
            if use_prefix:
                valid = valid & (s_global >= pad_ref[b])
            m_n, l_n, a_n = [], [], []
            for c in range(n_chunk):
                scores = jnp.dot(kb * q_rows[c], seg,
                                 preferred_element_type=jnp.float32)
                scores = jnp.where(valid, scores, -1e30)
                blk_max = jnp.max(scores, axis=0, keepdims=True)
                m_new = jnp.maximum(m[c], blk_max)
                alpha = jnp.exp(m[c] - m_new)
                p = jnp.exp(scores - m_new)
                l_new = l_acc[c] * alpha + jnp.sum(p, axis=0, keepdims=True)
                p_flat = jnp.dot(p, seg.T,
                                 preferred_element_type=jnp.float32)
                pv = jnp.sum(p_flat * vb, axis=0, keepdims=True)
                alpha_flat = jnp.dot(alpha, seg.T,
                                     preferred_element_type=jnp.float32)
                m_n.append(m_new)
                l_n.append(l_new)
                a_n.append(acc[c] * alpha_flat + pv)
            return tuple(m_n), tuple(l_n), tuple(a_n), (slot + 1) % 2

        m, l_acc, acc, slot = jax.lax.fori_loop(
            0, nblk, body, (m0, l0, a0, slot))

        # ---- tail: committed rows [bnd, pos) + chunk rows (causal) ----
        tail = recent2[:].astype(jnp.float32)  # [2w, 2F_kv]
        tk = exp_kv(tail[:, :f_kv])         # [2w, F]
        tv = exp_kv(tail[:, f_kv:])
        rows = []
        for c in range(n_chunk):
            scores = jnp.dot(tk * q_rows[c], seg,
                             preferred_element_type=jnp.float32)
            r_valid = bnd + j_r <= pos + c
            if use_prefix:
                r_valid = r_valid & (bnd + j_r >= pad_ref[b])
            scores = jnp.where(r_valid, scores, -1e30)
            t_max = jnp.max(scores, axis=0, keepdims=True)
            m_new = jnp.maximum(m[c], t_max)
            alpha = jnp.exp(m[c] - m_new)
            p = jnp.exp(scores - m_new)
            l_fin = l_acc[c] * alpha + jnp.sum(p, axis=0, keepdims=True)
            p_flat = jnp.dot(p, seg.T, preferred_element_type=jnp.float32)
            pv = jnp.sum(p_flat * tv, axis=0, keepdims=True)
            alpha_flat = jnp.dot(alpha, seg.T,
                                 preferred_element_type=jnp.float32)
            a_fin = acc[c] * alpha_flat + pv
            l_flat = jnp.dot(l_fin, seg.T,
                             preferred_element_type=jnp.float32)
            rows.append(a_fin / l_flat)
        for _ in range(n_chunk, CP):
            rows.append(rows[-1])  # pad rows: ignored by the caller
        out_ref[b] = jnp.concatenate(rows, axis=0).astype(out_ref.dtype)

        # ---- write the touched epoch tiles back (aligned w-row DMAs) ----
        w0 = pltpu.make_async_copy(
            recent2.at[pl.ds(0, w)], kv_cache_out.at[b, pl.ds(bnd, w)],
            write_sem)
        w0.start()
        w0.wait()

        @pl.when(pos - bnd + n_chunk > w)
        def _():
            w1 = pltpu.make_async_copy(
                recent2.at[pl.ds(w, w)],
                kv_cache_out.at[b, pl.ds(bnd + w, w)], write_sem)
            w1.start()
            w1.wait()

        return slot

    jax.lax.fori_loop(0, batch, outer, jnp.int32(0))


def chunk_decode_attention(q: jnp.ndarray, kv_new: jnp.ndarray,
                           kv_cache: jnp.ndarray, pos: jnp.ndarray,
                           n_head: int,
                           prefix_pad: Optional[jnp.ndarray] = None,
                           *, block_s: Optional[int] = None,
                           interpret: Optional[bool] = None):
    """C-row chunk attention for one layer; cache updated in place.

    q:        [B, C, F]   post-RoPE queries for positions pos..pos+C-1
    kv_new:   [B, C, 2F_kv]  the chunk's k | v rows (post-RoPE k);
                          F_kv = kv_heads*head_dim (GQA: F_kv < F, the
                          cache stays at kv lanes and the kernel
                          lane-expands each streamed half — the decode
                          kernel's scheme, r5)
    kv_cache: [B, S, 2F_kv]  committed rows < pos are live; rows >= pos
                          are scratch the kernel may rewrite. ALIASED
                          in/out. S % 8 == 0 and S >= pos + C - 1 +
                          spare w=8 rows (see module docstring).
    pos:      [B] int32 (or scalar) chunk start positions.
    Returns (out [B, C, F], kv_cache).
    """
    if block_s is None:
        block_s = BLOCK_S
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    assert kv_cache.dtype != jnp.int8, \
        "chunk kernel is bf16/f32-only (int8 stays on the windowed path)"
    w = RECENT
    b, c, f = q.shape
    assert c <= CP, f"chunk of {c} rows exceeds the {CP}-row tile"
    smax = kv_cache.shape[1]
    assert f % 128 == 0 and f % n_head == 0
    head_dim = f // n_head
    f_kv = kv_cache.shape[2] // 2
    assert f % f_kv == 0 and f_kv % head_dim == 0, (f, f_kv, head_dim)
    kv_heads = f_kv // head_dim
    rep = f // f_kv
    assert f_kv % 128 == 0 or rep == 1, (
        f"GQA cache half {f_kv} must be 128-aligned (lane tiling)")
    if rep > 1:
        # tiled head order (shared scheme: ops/attention.tiled_head_perm)
        tiled_to_model, model_to_tiled = tiled_head_perm(n_head, kv_heads)
        q = q.reshape(b, c, n_head, head_dim)[:, :, tiled_to_model, :] \
             .reshape(b, c, f)
    block_s = min(block_s, smax)
    assert smax % block_s == 0 and smax % w == 0
    assert kv_new.shape == (b, c, 2 * f_kv)
    scale = head_dim ** -0.5

    use_prefix = prefix_pad is not None
    if prefix_pad is None:
        prefix_pad = jnp.zeros((b,), jnp.int32)

    qp = jnp.pad(q, ((0, 0), (0, CP - c), (0, 0)))
    kvp = jnp.pad(kv_new.astype(kv_cache.dtype), ((0, 0), (0, CP - c),
                                                  (0, 0)))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),   # seg mask [F, H]
            pl.BlockSpec(memory_space=pltpu.VMEM),   # q [B, CP, F]
            pl.BlockSpec(memory_space=pltpu.VMEM),   # kv_new [B, CP, 2F]
            pl.BlockSpec(memory_space=pl.ANY),       # kv_cache
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),   # out [B, CP, F]
            pl.BlockSpec(memory_space=pl.ANY),       # kv_cache (aliased)
        ],
        scratch_shapes=[
            pltpu.VMEM((2, block_s, 2 * f_kv), kv_cache.dtype),  # kv blocks
            pltpu.VMEM((2 * w, 2 * f_kv), kv_cache.dtype),      # tail epochs
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
    )

    kernel = functools.partial(
        _chunk_attn_kernel, block_s=block_s, scale=scale, n_head=n_head,
        head_dim=head_dim, kv_heads=kv_heads, n_chunk=c,
        use_prefix=use_prefix, w=w, batch=b)

    out, kv_cache = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b, CP, f), q.dtype),
            jax.ShapeDtypeStruct(kv_cache.shape, kv_cache.dtype),
        ],
        input_output_aliases={5: 1},  # cache in -> out (incl. prefetch)
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(jnp.broadcast_to(jnp.asarray(pos, jnp.int32).reshape(-1), (b,)),
      jnp.broadcast_to(jnp.asarray(prefix_pad, jnp.int32).reshape(-1),
                       (b,)),
      jnp.asarray(_seg_mask(n_head, head_dim)), qp, kvp, kv_cache)
    out = out[:, :c]
    if rep > 1:
        out = out.reshape(b, c, n_head, head_dim)[:, :, model_to_tiled, :] \
                 .reshape(b, c, f)
    return out, kv_cache
