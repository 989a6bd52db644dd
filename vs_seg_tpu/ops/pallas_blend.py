"""Pallas TPU kernel: fused Gaussian-blend scatter-accumulate.

Accumulates `pred * importance` into the whole-volume output accumulator and
`importance` into the weight accumulator for a batch of sliding windows — the
hot accumulation step of sliding-window inference (reference protocol
params/VSparams.py:568-574; the XLA fallback in infer/sliding_window.py does
two separate dynamic-slice read-modify-write passes). This kernel fuses both
accumulators into one VMEM round-trip per window region.

TPU alignment design: Mosaic DMA offsets must respect the (8, 128) HBM tiling,
so accumulator tiles span the FULL W row (lane offset 0 — always aligned) at
dynamic (d0+d, h0) with h0 a multiple of 8 (true for MONAI window placement:
scan intervals and clamped starts are multiples of 8 for the reference ROI).
The window's prediction is DMA'd into the row-aligned scratch at lane 0 and
rotated into position with a dynamic lane roll. Channels fold into the minor
axis (W*O lanes) to keep tiles lane-dense.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _blend_kernel(starts_ref, mask_ref,        # scalar prefetch: (N,3) i32, (N,) f32
                  preds_ref,                   # (N, RD, RH, RWO) ANY
                  impo_ref,                    # (RD, RH, RWO) f32 ANY
                  imp_ref,                     # (RD, RH, RW) f32 ANY
                  out_in_ref, w_in_ref,        # aliased inputs (unused; see outputs)
                  out_ref, w_ref,              # (D, H, WO) / (D, H, W) ANY (aliased)
                  pred_tile, impo_tile, imp_tile, out_tile, w_tile, sem):
    i = pl.program_id(0)   # window index
    d = pl.program_id(1)   # depth slice within the ROI
    d0 = starts_ref[i, 0]
    h0 = pl.multiple_of(starts_ref[i, 1], 8)
    w0 = starts_ref[i, 2]
    rh = pred_tile.shape[1]
    rwo = pred_tile.shape[2]
    rw = imp_tile.shape[2]
    WO = out_tile.shape[2]
    W = w_tile.shape[2]  # possibly lane-padded
    oc = rwo // rw

    num_d = pl.num_programs(1)
    cp = [
        # window prediction / importance into exact-size scratch tiles
        # (preds flattened to (N*RD, RH, RWO) — 4D mixed indexing miscompiles)
        pltpu.make_async_copy(preds_ref.at[pl.ds(i * num_d + d, 1)],
                              pred_tile, sem.at[0]),
        pltpu.make_async_copy(impo_ref.at[pl.ds(d, 1)],
                              impo_tile, sem.at[1]),
        pltpu.make_async_copy(imp_ref.at[pl.ds(d, 1)],
                              imp_tile, sem.at[2]),
        # full-width accumulator rows (lane offset 0 — always tile-aligned);
        # read through the aliased OUTPUT refs so earlier grid steps' writes
        # are visible
        pltpu.make_async_copy(out_ref.at[pl.ds(d0 + d, 1), pl.ds(h0, rh)],
                              out_tile.at[pl.ds(0, 1)], sem.at[3]),
        pltpu.make_async_copy(w_ref.at[pl.ds(d0 + d, 1), pl.ds(h0, rh)],
                              w_tile.at[pl.ds(0, 1)], sem.at[4]),
    ]
    for c in cp:
        c.start()
    for c in cp:
        c.wait()

    m = mask_ref[i].astype(jnp.float32)
    lane_o = jax.lax.broadcasted_iota(jnp.int32, (rh, WO), 1)
    lane_w = jax.lax.broadcasted_iota(jnp.int32, (rh, W), 1)
    in_win_o = jnp.logical_and(lane_o >= w0 * oc, lane_o < w0 * oc + rwo)
    in_win_w = jnp.logical_and(lane_w >= w0, lane_w < w0 + rw)

    # pad window data to full width at lane 0, rotate into position, mask
    def full_width(row, total):
        if row.shape[1] == total:
            return row
        pad = jnp.zeros((rh, total - row.shape[1]), row.dtype)
        return jnp.concatenate([row, pad], axis=1)

    pred_row = pltpu.roll(full_width(pred_tile[0].astype(jnp.float32), WO),
                          w0 * oc, 1)
    impo_row = pltpu.roll(full_width(impo_tile[0], WO), w0 * oc, 1)
    imp_row = pltpu.roll(full_width(imp_tile[0], W), w0, 1)
    contrib_o = jnp.where(in_win_o, pred_row * impo_row * m, 0.0)
    contrib_w = jnp.where(in_win_w, imp_row * m, 0.0)
    out_tile[0] = out_tile[0] + contrib_o
    w_tile[0] = w_tile[0] + contrib_w

    cpo = pltpu.make_async_copy(out_tile.at[pl.ds(0, 1)],
                                out_ref.at[pl.ds(d0 + d, 1), pl.ds(h0, rh)],
                                sem.at[3])
    cpw = pltpu.make_async_copy(w_tile.at[pl.ds(0, 1)],
                                w_ref.at[pl.ds(d0 + d, 1), pl.ds(h0, rh)],
                                sem.at[4])
    cpo.start()
    cpw.start()
    cpo.wait()
    cpw.wait()


@partial(jax.jit, static_argnames=("interpret",))
def pallas_blend_scatter(out_acc, w_acc, preds, starts, mask, importance,
                         interpret: bool = False):
    """Fused in-place blend accumulation (D-first layout).

    out_acc (D,H,W,O) f32, w_acc (D,H,W,1) f32 (aliased in place);
    preds (N,RD,RH,RW,O); starts (N,3) int32 (d,h,w) with h % 8 == 0;
    mask (N,) f32; importance (RD,RH,RW) f32.
    Returns updated (out_acc, w_acc). Grid steps execute sequentially on TPU,
    so overlapping windows read-modify-write correctly.
    """
    n, rd, rh, rw, oc = preds.shape
    D, H, W, _ = out_acc.shape
    out_v = out_acc.reshape(D, H, W * oc)
    # Mosaic wants lane-aligned (128-multiple) minor dims for the dynamic
    # rolls; pad the weight view. W is often not a 128 multiple; W*oc must
    # be — the auto-enable gate in infer/sliding_window.py checks every
    # precondition (dfirst, TPU, h-starts % 8, roi alignment, (W*oc) % 128)
    # and falls back to the XLA scatter otherwise
    Wp = -(-W // 128) * 128
    w_v = w_acc.reshape(D, H, W)
    if Wp != W:
        w_v = jnp.pad(w_v, ((0, 0), (0, 0), (0, Wp - W)))
    preds_v = preds.reshape(n * rd, rh, rw * oc)
    # interleaved importance matching the (W, O) lane flattening
    impo = jnp.repeat(importance, oc, axis=-1)

    kernel = pl.pallas_call(
        _blend_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(n, rd),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 5,
            out_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 2,
            scratch_shapes=[
                pltpu.VMEM((1, rh, rw * oc), preds.dtype),   # window pred
                pltpu.VMEM((1, rh, rw * oc), jnp.float32),   # interleaved imp
                pltpu.VMEM((1, rh, rw), jnp.float32),        # plain imp
                pltpu.VMEM((1, rh, W * oc), jnp.float32),    # full-width out rows
                pltpu.VMEM((1, rh, Wp), jnp.float32),        # full-width w rows
                pltpu.SemaphoreType.DMA((5,)),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct(out_v.shape, out_v.dtype),
            jax.ShapeDtypeStruct(w_v.shape, w_v.dtype),
        ],
        input_output_aliases={5: 0, 6: 1},  # flat inputs incl. scalar prefetch
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )
    out_v, w_v = kernel(starts, mask, preds_v, impo,
                        jnp.asarray(importance, jnp.float32), out_v, w_v)
    return (out_v.reshape(D, H, W, oc),
            w_v[:, :, :W].reshape(D, H, W, 1))
