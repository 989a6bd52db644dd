"""Pallas TPU kernel: grouped-output 3x3 "2.5D" convolution.

The hot convolutions of the reference UNet's top levels are 3x3x1 kernels with
16-32 channels (reference params/VSparams.py:355-369) — shapes where XLA's
conv emitter reaches only ~2-10 TFLOP/s on v5e because C_out occupies a
fraction of the MXU's 128 output lanes. This kernel uses the grouped-output
matmul formulation (ops/grouped_conv.py): G consecutive W-positions share one
matmul whose N dim is G*C_out = 128 lanes, with a block-Toeplitz weight
matrix. Patches are built in VMEM (the HBM im2col blowup never materializes).

Layout: x is viewed as (B, H, NG, G*C) — exactly 128 lanes when G*C = 128 —
so DMAs slice only untiled dims. Grid: (B, H/HT) row-tiles; per step three
DMAs fetch body + halo rows (boundary rows zeroed in-register), the patch
matrix (HT*NG, 3*(G+2)*C) is assembled with static lane slices, and one MXU
matmul produces (HT*NG, G*C_out).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vs_seg_tpu.ops.grouped_conv import build_block_toeplitz


def _conv_kernel(x_ref, wb_ref, out_ref, xt_top, xt_body, xt_bot, sem, *,
                 ht, ng, g, c, co, h_total, n_tiles):
    # Linear grid with double-buffered tile DMAs: the fetch for step i+1 is
    # issued before computing step i, hiding DMA latency behind the matmuls.
    i = pl.program_id(0)
    n_steps = pl.num_programs(0)

    def fetch(step, slot):
        b = step // n_tiles
        t = step % n_tiles
        h0 = t * ht
        base = b * h_total
        # x_ref is flattened to (B*H, NG, G*C): 4D mixed indexing miscompiles
        # (see CLAUDE.md), so row offsets are linearized
        top_off = base + jnp.maximum(h0 - 1, 0)
        bot_off = base + jnp.minimum(h0 + ht, h_total - 1)
        return [
            pltpu.make_async_copy(x_ref.at[pl.ds(top_off, 1)],
                                  xt_top.at[slot], sem.at[slot, 0]),
            pltpu.make_async_copy(x_ref.at[pl.ds(base + h0, ht)],
                                  xt_body.at[slot], sem.at[slot, 1]),
            pltpu.make_async_copy(x_ref.at[pl.ds(bot_off, 1)],
                                  xt_bot.at[slot], sem.at[slot, 2]),
        ]

    @pl.when(i == 0)
    def _():
        for cpi in fetch(0, 0):
            cpi.start()

    @pl.when(i + 1 < n_steps)
    def _():
        for cpi in fetch(i + 1, (i + 1) % 2):
            cpi.start()

    slot = i % 2
    for cpi in fetch(i, slot):
        cpi.wait()

    t = i % n_tiles
    h0 = t * ht
    zero = jnp.zeros((), xt_top.dtype)
    top = jnp.where(t == 0, zero, xt_top[slot, 0])
    bot = jnp.where(h0 + ht >= h_total, zero, xt_bot[slot, 0])
    body = xt_body[slot]
    xg = jnp.concatenate([top[None], body, bot[None]], axis=0)  # (ht+2, ng, g*c)

    # Decomposed matmuls (no big patch concat): per dh, a main K=128 matmul on
    # the shifted full-lane view plus two K=c halo corrections from the
    # neighboring groups. Border groups zeroed via iota masks (.at[].set
    # lowers to an unsupported Mosaic scatter).
    gid = jax.lax.broadcasted_iota(jnp.int32, (ht, ng, c), 1)
    wb = wb_ref[...].reshape(3, g + 2, c, g * co)
    m = ht * ng

    acc = jnp.zeros((m, g * co), jnp.float32)
    for dh in range(3):
        rows = xg[dh:dh + ht]                                   # (ht, ng, g*c)
        w_main = wb[dh, 1:g + 1].reshape(g * c, g * co)         # r = 1..g
        acc = acc + jnp.dot(rows.reshape(m, g * c), w_main,
                            preferred_element_type=jnp.float32)
        left = jnp.roll(rows, 1, axis=1)[:, :, (g - 1) * c:]    # r = 0 halo
        left = jnp.where(gid == 0, zero, left)
        acc = acc + jnp.dot(left.reshape(m, c), wb[dh, 0],
                            preferred_element_type=jnp.float32)
        right = jnp.roll(rows, -1, axis=1)[:, :, :c]            # r = g+1 halo
        right = jnp.where(gid == ng - 1, zero, right)
        acc = acc + jnp.dot(right.reshape(m, c), wb[dh, g + 1],
                            preferred_element_type=jnp.float32)
    out_ref[...] = acc.reshape(1, ht, ng, g * co).astype(out_ref.dtype)


@partial(jax.jit, static_argnames=("group", "ht", "interpret", "out_dtype"))
def pallas_conv2p5(x, w, *, group: int = None, ht: int = 64,
                   interpret: bool = False, out_dtype=jnp.bfloat16):
    """3x3 stride-1 same-pad conv on (B, H, W, C); w (3, 3, C, Co).

    Requires G*C == 128 with G = group (default 128 // C), W % G == 0, and
    H % ht == 0. Returns (B, H, W, Co).
    """
    b, h, wdim, c = x.shape
    co = w.shape[-1]
    g = group or 128 // c
    assert g * c == 128, f"group*C must be 128, got {g}*{c}"
    assert wdim % g == 0 and h % ht == 0
    ng = wdim // g

    wb = build_block_toeplitz(w.astype(jnp.bfloat16), g)  # (3*(g+2)*c, g*co)
    x3 = x.reshape(b * h, ng, g * c)

    n_tiles = h // ht
    kernel = pl.pallas_call(
        partial(_conv_kernel, ht=ht, ng=ng, g=g, c=c, co=co, h_total=h,
                n_tiles=n_tiles),
        grid=(b * n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),       # x3 (manual DMA)
            pl.BlockSpec(memory_space=pltpu.VMEM),   # Wb
        ],
        out_specs=pl.BlockSpec(
            (1, ht, ng, g * co),
            lambda i: (i // n_tiles, i % n_tiles, 0, 0),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, ng, g * co), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((2, 1, ng, g * c), x.dtype),
            pltpu.VMEM((2, ht, ng, g * c), x.dtype),
            pltpu.VMEM((2, 1, ng, g * c), x.dtype),
            pltpu.SemaphoreType.DMA((2, 3)),
        ],
        interpret=interpret,
    )
    out = kernel(x3, wb)
    return out.reshape(b, h, ng * g, co)
