"""Pallas W4A16 dequant-matmul: nibble-packed int4 weights, explicit
double-buffered HBM streaming, MXU bf16 compute.

Why a kernel: XLA's int8 weight path fuses the int8->bf16 convert into
the matmul's HBM read (ops/quant_matmul.matmul_any), but it does NOT
fuse the int4 nibble unpack — the XLA W4 path materializes the
dequantized matrix and runs 9x slower (BENCH.md rejected experiments).
This kernel streams the packed bytes itself (measured ~694-766 GB/s of
packed bytes with the in-loop unpack fully hidden under the DMA — at or
above XLA's ~620 GB/s weight streams) and dequantizes in VMEM, so the
decode step's weight traffic truly halves vs W8A16. That is the
single-chip lever for the weights-bound tail of the model zoo (GPT-XXL /
GPT-3B rows of the serve table).

Layout (built by `pack_w4`):
  - K-HALF NIBBLE PACKING: original row i < K/2 lives in the LOW nibble
    of packed row i; row i + K/2 in the HIGH nibble. Unpacking is two
    int32 shifts on the streamed block (no interleave, no strided VMEM
    access), and the two matmul operands consume contiguous halves of x.
  - PRE-BLOCKED WEIGHTS [NB, K2, BN]: each grid step's DMA is one fully
    contiguous copy (no lane-strided descriptors).
  - scales: per-channel [NB, 1, BN] f32, or group scales
    [NB, 2*NSEG, BN] where each half of K splits into 128-row segments
    (+ one ragged tail) — pre-blocked so the kernel indexes them on the
    MAJOR axis only (dynamic lane slicing of VMEM refs is a Mosaic
    slow path / unsupported).

Scale modes:
  - per_channel=True: one dot per half per block, scale folded into the
    [B, BN] output tile — DMA-bound (~766 GB/s measured).
  - grouped (default): per-(128-row-group, channel) scales; each group
    is its own MXU dot with the scale folded into the partial. More
    accurate (int4 RTN needs group scales), measured ~370 GB/s — the
    many small dots cost MXU issue latency.

Reference has no analogue (fp16 weights + A100 bandwidth,
`/root/reference/autoregressive/serve/README.md:16`); this replaces what
a CUDA build would write as a fused AWQ-style dequant GEMM.

int8 shifts do not legalize in Mosaic and int4 arrays cannot cross the
host boundary on this backend — hence packed int8 storage + in-kernel
int32 shifts (see BENCH.md / memory notes).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SEG_ROWS = 128  # group-scale row granularity (also the MXU-friendly size)

# Grouped-branch formulation: "seg" (per-segment dots) or "fold" (bf16
# scale-fold into weight rows, one wide dot per half-chunk). Module-level
# so the serving bench can A/B both on the real chip.
import os as _os  # noqa: E402

GROUPED_MODE = _os.environ.get("LLAMAGEN_W4_GROUPED", "seg")
# DMA-block lane target and in-kernel unpack chunk budget (elements of
# i32 live range); env knobs so the real chip can A/B block geometry
BN_TARGET = int(_os.environ.get("LLAMAGEN_W4_BN_TARGET", "640"))
CHUNK_BUDGET = int(_os.environ.get("LLAMAGEN_W4_CHUNK", "500000"))


def _pick_bn(n: int, target: Optional[int] = None) -> int:
    """Largest multiple of 128 that divides N and is <= target."""
    if target is None:
        target = BN_TARGET
    best = 0
    for k in range(1, n // 128 + 1):
        bn = 128 * k
        if n % bn == 0 and bn <= target:
            best = bn
    if best == 0:
        raise ValueError(f"N={n} has no 128-multiple divisor <= {target}")
    return best


def _segments(k2: int, seg_rows: int = SEG_ROWS):
    """seg_rows-row segments of one packed half (plus a ragged tail)."""
    segs = [(i * seg_rows, seg_rows) for i in range(k2 // seg_rows)]
    if k2 % seg_rows:
        segs.append((k2 - k2 % seg_rows, k2 % seg_rows))
    return segs


def _infer_seg_rows(k2: int, nseg: int) -> int:
    """Recover the group row-size from the scales shape (2*NSEG axis).

    The candidates are the supported group sizes; the mapping
    nseg = ceil(k2/seg) is injective across them for every real model
    shape — assert loudly if a new shape ever makes it ambiguous."""
    cands = [s for s in (64, 128, 256, 512)
             if len(_segments(k2, s)) == nseg]
    # different candidates may induce the SAME segmentation (tiny K2 in
    # tests: one ragged segment) — that ambiguity is harmless
    seglists = {tuple(_segments(k2, s)) for s in cands}
    assert len(seglists) == 1, (
        f"ambiguous/unknown group size for K2={k2}, NSEG={nseg}: {cands}")
    return cands[0]


def _pack_blocks(q, lead, k2, nb, bn):
    """Quantized levels [..., K, N] int -> nibble-packed [..., NB, K2, BN]."""
    lo = q[..., :k2, :].astype(jnp.int8) & 0x0F
    hi = q[..., k2:, :].astype(jnp.int8) << 4
    packed = (lo | hi).astype(jnp.int8)  # [..., K2, N]
    return jnp.moveaxis(
        packed.reshape(*lead, k2, nb, bn), -2, -3)  # [..., NB, K2, BN]


def _block_scales(sc, lead, nb, bn):
    """Row-layout scales [..., R, N] -> pre-blocked [..., NB, R, BN]
    (the kernel indexes scales by block on the MAJOR axis only)."""
    r = sc.shape[-2]
    return jnp.moveaxis(sc.reshape(*lead, r, nb, bn), -2, -3)


def pack_w4(w: jnp.ndarray, *, per_channel: bool = False,
            block_n: Optional[int] = None,
            group_size: int = SEG_ROWS) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """[..., K, N] float -> (blocks [..., NB, K2, BN] int8, scales).

    scales: [..., NB, 1, BN] f32 (per_channel) or [..., NB, 2*NSEG, BN]
    f32 (grouped; group g of half h covers original rows h*K/2 +
    [g*group_size, (g+1)*group_size)). Symmetric RTN to [-7, 7].
    group_size 64 doubles the scale resolution at ~identical kernel cost
    (scales are folded into weight rows before the dots).
    """
    *lead, k, n = w.shape
    assert k % 2 == 0, f"K={k} must be even for K-half packing"
    k2 = k // 2
    if block_n:
        bn = block_n
    else:
        # wide blocks amortize per-DMA cost; the kernel bounds its i32
        # unpack live-range by chunking rows (per-channel) / segment
        # slices (grouped), so BN need not shrink with K2
        bn = _pick_bn(n)
    nb = n // bn
    w32 = jnp.asarray(w, jnp.float32)

    if per_channel:
        scale = jnp.max(jnp.abs(w32), axis=-2, keepdims=True) / 7.0 + 1e-12
        q = jnp.clip(jnp.round(w32 / scale), -8, 7)
        out_scale = _block_scales(scale, lead, nb, bn)
    else:
        segs = _segments(k2, group_size)
        parts, sparts = [], []
        for half in range(2):
            for (r0, rl) in segs:
                rows = w32[..., half * k2 + r0: half * k2 + r0 + rl, :]
                s = jnp.max(jnp.abs(rows), axis=-2, keepdims=True) / 7.0 + 1e-12
                parts.append(jnp.clip(jnp.round(rows / s), -8, 7))
                sparts.append(s)
        q = jnp.concatenate(parts, axis=-2)
        sc = jnp.concatenate(sparts, axis=-2)  # [..., 2*NSEG, N]
        out_scale = _block_scales(sc, lead, nb, bn)

    return (_pack_blocks(q, lead, k2, nb, bn),
            out_scale.astype(jnp.float32))


def pack_w4_levels(q: jnp.ndarray, scales_rows: jnp.ndarray, *,
                   block_n: Optional[int] = None
                   ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Pack EXTERNALLY quantized levels into the kernel layout.

    q: [K, N] integer levels in [-8, 7]; scales_rows: [1, N] f32
    (per-channel) or [2*NSEG, N] f32 in the kernel's half-major group
    order (half 0 groups first). Used by the GPTQ path (ops/gptq.py),
    which chooses levels by error compensation instead of RTN.
    """
    k, n = q.shape
    assert k % 2 == 0
    k2 = k // 2
    bn = block_n or _pick_bn(n)
    nb = n // bn
    return (_pack_blocks(q, [], k2, nb, bn),
            _block_scales(jnp.asarray(scales_rows, jnp.float32), [], nb, bn))


def _w4_kernel(lidx_ref, x_ref, s_ref, w_hbm, o_ref, w_scr, sems,
               *, nb: int, k2: int, bn: int, batch: int,
               per_channel: bool, segs):
    lidx = lidx_ref[0]
    def cp(slot, blk):
        return pltpu.make_async_copy(w_hbm.at[lidx, blk], w_scr.at[slot],
                                     sems.at[slot])
    cp(0, 0).start()
    x = x_ref[:]

    def body(blk, carry):
        slot = jax.lax.rem(blk, 2)

        @pl.when(blk + 1 < nb)
        def _():
            cp(1 - slot, blk + 1).start()

        cp(slot, blk).wait()
        # chunk the unpack+dot over row groups in BOTH modes: the i32
        # intermediate is 4x the int8 rows, and unpacking the whole block
        # at once blows scoped VMEM at K2*BN ~ 2.8M (w2-class matrices); a
        # static chunk loop bounds the live range so BN stays wide
        # (fewer, bigger DMAs — measured 533 -> wider-block stream)
        if per_channel:
            ch = max(256, min(k2, CHUNK_BUDGET // bn // 8 * 8))
            acc = jnp.zeros((batch, bn), jnp.float32)
            for c0 in range(0, k2, ch):
                rows = min(ch, k2 - c0)
                p32 = w_scr[slot, c0:c0 + rows, :].astype(jnp.int32)
                lo = ((p32 << 28) >> 28).astype(jnp.bfloat16)
                hi = (p32 >> 4).astype(jnp.bfloat16)
                acc += jnp.dot(x[:, c0:c0 + rows], lo,
                               preferred_element_type=jnp.float32)
                acc += jnp.dot(x[:, k2 + c0:k2 + c0 + rows], hi,
                               preferred_element_type=jnp.float32)
            acc = acc * s_ref[blk, 0, :][None, :]
        else:
            # Grouped-scale formulations (selected by GROUPED_MODE):
            #   "seg":  per-segment dots with the scale folded into the
            #           [B, BN] partial — 26-68 small MXU dots per block
            #           cost issue latency (~370 GB/s effective, r2).
            #   "fold": fold scales into the unpacked WEIGHT rows in bf16
            #           and run ONE wide dot per half-chunk. An r2-tail
            #           attempt at this regressed (XXL 2.20 -> 2.11x,
            #           3B 1.52 -> 1.41x) — but it multiplied bf16 rows
            #           by F32 expanded scales, silently promoting the
            #           whole matmul to f32 MXU passes; this variant
            #           keeps everything bf16 (scales are exact bf16
            #           copies; the extra rounding is ~0.2% against
            #           int4's ~7% step).
            nseg = len(segs)
            seg = segs[0][1]  # first segment is always full-size
            acc = jnp.zeros((batch, bn), jnp.float32)
            # chunks align to group boundaries so every segment is fully
            # contained in exactly one chunk
            ch = max(seg, min(k2, CHUNK_BUDGET // bn // seg * seg))
            for c0 in range(0, k2, ch):
                rows = min(ch, k2 - c0)
                p32 = w_scr[slot, c0:c0 + rows, :].astype(jnp.int32)
                in_chunk = [(g, r0, rl) for g, (r0, rl) in enumerate(segs)
                            if c0 <= r0 < c0 + rows]
                for half, wh in ((0, ((p32 << 28) >> 28).astype(jnp.bfloat16)),
                                 (1, (p32 >> 4).astype(jnp.bfloat16))):
                    if GROUPED_MODE == "seg":
                        for g, r0, rl in in_chunk:
                            xs = x[:, half * k2 + r0: half * k2 + r0 + rl]
                            partial = jnp.dot(
                                xs, wh[r0 - c0:r0 - c0 + rl, :],
                                preferred_element_type=jnp.float32)
                            acc = acc + partial * s_ref[blk, half * nseg + g,
                                                        :][None, :]
                    else:  # "fold"
                        ws = jnp.concatenate(
                            [wh[r0 - c0:r0 - c0 + rl, :]
                             * s_ref[blk, half * nseg + g, :][None, :]
                             .astype(jnp.bfloat16)
                             for g, r0, rl in in_chunk], axis=0)
                        acc = acc + jnp.dot(
                            x[:, half * k2 + c0: half * k2 + c0 + rows], ws,
                            preferred_element_type=jnp.float32)
        o_ref[blk] = acc.astype(o_ref.dtype)
        return carry

    jax.lax.fori_loop(0, nb, body, jnp.int32(0), unroll=False)


def w4_matmul(x: jnp.ndarray, blocks: jnp.ndarray, scales: jnp.ndarray,
              *, layer=0, interpret: Optional[bool] = None) -> jnp.ndarray:
    """x [B, K] @ dequant-int4(blocks, scales[layer]) -> [B, N].

    blocks is [NB, K2, BN] or LAYER-STACKED [L, NB, K2, BN] with `layer`
    selecting the slice INSIDE the kernel's DMA (`w_hbm.at[l, blk]`).
    Callers with stacked weights must pass the full array: an XLA-side
    slice feeding a pallas ANY operand cannot fuse and materializes a
    full copy of the packed weights per call — measured to cost more
    than the kernel saves (BENCH.md). scales are per-layer (small; the
    XLA slice of them is cheap). Per-channel vs grouped mode is inferred
    from the scales shape. Output is assembled from the kernel's
    pre-blocked [NB, B, BN] by a (tiny) XLA transpose.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, k = x.shape
    if blocks.ndim == 3:
        blocks = blocks[None]
        layer = 0
    if isinstance(layer, int):
        # the in-kernel DMA index is NOT bounds-checked on TPU — an
        # out-of-range layer would silently stream garbage HBM
        assert 0 <= layer < blocks.shape[0], (layer, blocks.shape)
    else:
        layer = jnp.clip(layer, 0, blocks.shape[0] - 1)
    _, nb, k2, bn = blocks.shape
    assert k == 2 * k2, (x.shape, blocks.shape)
    n = nb * bn
    per_channel = scales.shape[-2] == 1
    if per_channel:
        segs = _segments(k2)
    else:
        segs = _segments(k2, _infer_seg_rows(k2, scales.shape[-2] // 2))
    expect = (nb, 1, bn) if per_channel else (nb, 2 * len(segs), bn)
    assert scales.shape == expect, (scales.shape, expect)

    kern = functools.partial(
        _w4_kernel, nb=nb, k2=k2, bn=bn, batch=b,
        per_channel=per_channel, segs=segs)
    lidx = jnp.asarray(layer, jnp.int32).reshape(1)
    out = pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((2, k2, bn), jnp.int8),
                            pltpu.SemaphoreType.DMA((2,))],
        ),
        out_shape=jax.ShapeDtypeStruct((nb, b, bn), x.dtype),
        interpret=interpret,
    )(lidx, x.astype(jnp.bfloat16), scales, blocks)
    return out.transpose(1, 0, 2).reshape(b, n)


# single source of truth for which layer weights are matmuls (shared
# with the W8A16 path so the two quantizers can never diverge)
from llamagen_tpu.ops.quant_matmul import _LAYER_MATMUL_KEYS  # noqa: E402


def quantize_gpt_params_w4k(params, *, per_channel: bool = False,
                            int8_head: bool = False,
                            group_size: int = SEG_ROWS):
    """GPT param pytree -> W4-kernel layout ({key}_w4b blocks +
    {key}_w4s scales per layer matmul; norms/embeddings untouched).

    `models.gpt.matmul_any` routes `_w4b` keys through `w4_matmul` for
    2-D (decode) activations and through an XLA dequant fallback for
    3-D (train/prefill) activations, where the weight stream amortizes
    over S tokens and bf16/int8 paths are the right tool anyway.

    int8_head=True additionally W8A16-quantizes the output head (via
    quant_matmul's XLA-fused path): profitable at engine batch sizes
    (~32 slots) where XLA fuses the int8 head convert, and int8 is the
    right precision floor for the logits layer (BENCH.md head ablation).
    """
    out = dict(params)
    layers = dict(out["layers"])
    for key in _LAYER_MATMUL_KEYS:
        if key not in layers:
            continue
        blocks, scales = pack_w4(layers[key], per_channel=per_channel,
                                 group_size=group_size)
        del layers[key]
        layers[key + "_w4b"] = blocks
        layers[key + "_w4s"] = scales
    out["layers"] = layers
    if int8_head and "output" in out:
        from llamagen_tpu.ops.quant_matmul import quantize_weight
        q, s = quantize_weight(out.pop("output"))
        out["output_q"] = q
        out["output_scale"] = s
    return out


def w4_dequant(blocks: jnp.ndarray, scales: jnp.ndarray) -> jnp.ndarray:
    """XLA dequant of the kernel layout -> [K, N] f32 (fallback/tests)."""
    nb, k2, bn = blocks.shape
    n = nb * bn
    p32 = blocks.astype(jnp.int32)
    lo = ((p32 << 28) >> 28).astype(jnp.float32)
    hi = (p32 >> 4).astype(jnp.float32)
    q = jnp.concatenate([lo, hi], axis=1)          # [NB, K, BN]
    if scales.shape[-2] == 1:                      # per-channel [NB, 1, BN]
        return jnp.moveaxis(q * scales, 0, -2).reshape(2 * k2, n)
    segs = _segments(k2, _infer_seg_rows(k2, scales.shape[-2] // 2))
    nseg = len(segs)
    reps = np.concatenate([np.full(rl, h * nseg + g)
                           for h in range(2)
                           for g, (r0, rl) in enumerate(segs)])
    sc_rows = scales[:, jnp.asarray(reps), :]      # [NB, K, BN]
    w = q * sc_rows
    return jnp.moveaxis(w, 0, -2).reshape(2 * k2, n)
