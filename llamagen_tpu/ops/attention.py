"""Pallas TPU decode-attention kernel with in-place HBM KV cache.

Replaces the XLA decode-attention path for the AR sampling hot loop. The
XLA version (gpt.decode_step) materializes a full per-layer cache slice on
every (layer, step) — ~1 cache-sized copy per step — and always reads all
Smax slots. This kernel:

  - keeps the [L, B, S, H, D] cache in HBM and aliases it in/out
    (guaranteed in-place update, zero copies)
  - writes the new k/v at `pos` via an async DMA from VMEM
  - streams only ceil(pos / BLOCK) key/value blocks per head batch —
    average ~half of Smax — with flash-style online softmax in f32
  - handles the current position's k/v directly from registers (no
    write-then-read hazard)

Functional equivalent of the reference serving path's PagedAttention call
(`/root/reference/autoregressive/serve/gpt_model.py:141-145`) — on TPU a
dense cache + bounded streaming beats paged block tables.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK_S = 128


def _decode_attn_kernel(
    # scalar prefetch
    layer_ref, pos_ref,
    # inputs
    q_ref, k_new_ref, v_new_ref, prefix_ref, k_cache_hbm, v_cache_hbm,
    # outputs
    out_ref, k_cache_out, v_cache_out,
    # scratch
    k_scratch, v_scratch, mask_scratch, write_scratch, sems, write_sems,
    *, block_s: int, scale: float, use_prefix: bool,
):
    b = pl.program_id(0)
    l = layer_ref[0]
    pos = pos_ref[0]

    h_dim = q_ref.shape[1]  # heads
    d = q_ref.shape[2]

    # --- write new k/v into the cache at (l, b, pos) ---
    write_scratch[0] = k_new_ref[0]
    write_scratch[1] = v_new_ref[0]
    k_write = pltpu.make_async_copy(
        write_scratch.at[0], k_cache_out.at[l, b, pos], write_sems.at[0])
    v_write = pltpu.make_async_copy(
        write_scratch.at[1], v_cache_out.at[l, b, pos], write_sems.at[1])
    k_write.start()
    v_write.start()

    q = q_ref[0].astype(jnp.float32)  # [H, D]

    num_blocks = pl.cdiv(pos, block_s)  # stream cache slots [0, pos)

    def get_dma(slot, blk):
        src_k = k_cache_hbm.at[l, b, pl.ds(blk * block_s, block_s)]
        src_v = v_cache_hbm.at[l, b, pl.ds(blk * block_s, block_s)]
        return (
            pltpu.make_async_copy(src_k, k_scratch.at[slot], sems.at[slot, 0]),
            pltpu.make_async_copy(src_v, v_scratch.at[slot], sems.at[slot, 1]),
        )

    @pl.when(num_blocks > 0)
    def _():
        dk, dv = get_dma(0, 0)
        dk.start()
        dv.start()

    if use_prefix:
        pm = pltpu.make_async_copy(prefix_ref.at[b], mask_scratch,
                                   sems.at[0, 2])
        pm.start()
        pm.wait()

    # flash state
    m0 = jnp.full((h_dim,), -1e30, jnp.float32)
    l0 = jnp.zeros((h_dim,), jnp.float32)
    acc0 = jnp.zeros((h_dim, d), jnp.float32)

    def body(blk, carry):
        m, l_acc, acc = carry
        slot = blk % 2

        @pl.when(blk + 1 < num_blocks)
        def _():
            nk, nv = get_dma((blk + 1) % 2, blk + 1)
            nk.start()
            nv.start()

        dk, dv = get_dma(slot, blk)
        dk.wait()
        dv.wait()

        kb = k_scratch[slot].astype(jnp.float32)  # [S_blk, H, D]
        vb = v_scratch[slot].astype(jnp.float32)
        scores = jnp.sum(kb * q[None, :, :], axis=-1) * scale  # [S_blk, H]

        s_global = blk * block_s + jax.lax.broadcasted_iota(
            jnp.int32, (block_s, 1), 0)[:, 0]
        valid = s_global < pos
        if use_prefix:
            allow = mask_scratch[pl.ds(blk * block_s, block_s)] != 0
            valid = valid & allow
        scores = jnp.where(valid[:, None], scores, -1e30)

        blk_max = jnp.max(scores, axis=0)
        m_new = jnp.maximum(m, blk_max)
        alpha = jnp.exp(m - m_new)
        p = jnp.exp(scores - m_new[None, :])  # [S_blk, H]
        l_new = l_acc * alpha + jnp.sum(p, axis=0)
        pv = jnp.einsum("sh,shd->hd", p, vb,
                        preferred_element_type=jnp.float32)
        acc_new = acc * alpha[:, None] + pv
        return m_new, l_new, acc_new

    m, l_acc, acc = jax.lax.fori_loop(0, num_blocks, body, (m0, l0, acc0))

    # current position: k_new/v_new contribute the diagonal term
    k_cur = k_new_ref[0].astype(jnp.float32)  # [H, D]
    v_cur = v_new_ref[0].astype(jnp.float32)
    s_cur = jnp.sum(q * k_cur, axis=-1) * scale  # [H]
    m_new = jnp.maximum(m, s_cur)
    alpha = jnp.exp(m - m_new)
    p_cur = jnp.exp(s_cur - m_new)
    l_final = l_acc * alpha + p_cur
    acc = acc * alpha[:, None] + p_cur[:, None] * v_cur

    out_ref[0] = (acc / l_final[:, None]).astype(out_ref.dtype)

    k_write.wait()
    v_write.wait()


def decode_attention(q: jnp.ndarray, k_new: jnp.ndarray, v_new: jnp.ndarray,
                     k_cache: jnp.ndarray, v_cache: jnp.ndarray,
                     layer: jnp.ndarray, pos: jnp.ndarray,
                     prefix_allow: Optional[jnp.ndarray] = None,
                     *, block_s: int = BLOCK_S, interpret: bool = False
                     ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Single-position attention against the cache, updating it in place.

    q:       [B, H, D]   (post-RoPE)
    k_new:   [B, H, D]   (post-RoPE; n_kv_head == n_head assumed)
    v_new:   [B, H, D]
    k_cache: [L, B, S, H, D]  (bf16/f32, aliased in-place)
    v_cache: [L, B, S, H, D]
    layer:   scalar int32
    pos:     scalar int32 — attends to cache[:pos] plus the new k/v at pos
    prefix_allow: optional [B, S] int8/bool mask (t2i caption validity)

    Returns (out [B, H, D], k_cache, v_cache).
    """
    b, h, d = q.shape
    smax = k_cache.shape[2]
    assert smax % block_s == 0 or smax < block_s, (
        f"cache len {smax} not aligned to block {block_s}")
    block_s = min(block_s, smax)
    scale = d ** -0.5

    use_prefix = prefix_allow is not None
    if prefix_allow is None:
        prefix_dummy = jnp.ones((b, smax), jnp.int8)
    else:
        prefix_dummy = prefix_allow.astype(jnp.int8)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h, d), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),      # q
            pl.BlockSpec((1, h, d), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),      # k_new
            pl.BlockSpec((1, h, d), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),      # v_new
            pl.BlockSpec(memory_space=pl.ANY),       # prefix mask
            pl.BlockSpec(memory_space=pl.ANY),       # k_cache
            pl.BlockSpec(memory_space=pl.ANY),       # v_cache
        ],
        out_specs=[
            pl.BlockSpec((1, h, d), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),      # out
            pl.BlockSpec(memory_space=pl.ANY),       # k_cache (aliased)
            pl.BlockSpec(memory_space=pl.ANY),       # v_cache (aliased)
        ],
        scratch_shapes=[
            pltpu.VMEM((2, block_s, h, d), k_cache.dtype),  # k blocks
            pltpu.VMEM((2, block_s, h, d), v_cache.dtype),  # v blocks
            pltpu.VMEM((smax,), jnp.int8),                  # prefix mask
            pltpu.VMEM((2, h, d), k_cache.dtype),           # kv write staging
            pltpu.SemaphoreType.DMA((2, 3)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )

    kernel = functools.partial(
        _decode_attn_kernel, block_s=block_s, scale=scale,
        use_prefix=use_prefix)

    out, k_cache, v_cache = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b, h, d), q.dtype),
            jax.ShapeDtypeStruct(k_cache.shape, k_cache.dtype),
            jax.ShapeDtypeStruct(v_cache.shape, v_cache.dtype),
        ],
        input_output_aliases={6: 1, 7: 2},  # cache in -> cache out
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(layer.reshape(1), pos.reshape(1), q, k_new, v_new, prefix_dummy,
      k_cache, v_cache)
    return out, k_cache, v_cache
