"""Pallas TPU kernel: fused attention tail — conv2 (C -> 1) + sigmoid +
residual spatial gate, in one pass over the activations.

The reference attention blocks (params/networks/blocks/attentionblock.py:6-47)
end in a single-output-channel convolution followed by sigmoid and
`att * x + x`.  A C_out=1 convolution cannot use the MXU (1 of 128 output
lanes) and the (..., 1) attention tensor forces lane-starved layouts on every
elementwise consumer — the round-2 inference trace bills the upatt_* tails
~45 ms/volume (sigmoid/gate `add_divide_fusion`s alone are 17 ms).  This
kernel computes the C->1 conv as per-tap VPU FMAs over lane-packed (W*C)
rows, reduces-and-rebroadcasts within W-groups via a roll-based segmented
all-reduce (Mosaic rejects lane-split reshapes and interleaved repeats; rolls
, iota selects and 128-lane-preserving reshapes all lower fine), and applies
sigmoid + gate to both halves of the skip-concat pair without ever
materializing a (..., 1) tensor in HBM.

Layout: activations (B, D, H, W, C) viewed as rows (B*D*H, W*C), padded by
8 zero rows top and bottom so every slab DMA start (plane*H + tile*ht - 8)
is sublane-aligned (Mosaic requires dynamic slice offsets/sizes on the
second-minor dim to be multiples of 8; H and ht are multiples of 8).  Each
depth tap fetches one (ht+16)-row slab covering the tile plus H-halos; halo
rows that cross an H boundary land in the neighboring plane's data and are
zeroed in-register with one-row masks.  Depth taps (kd == 3) fetch d+-1
plane slabs and skip out-of-range planes with a mask.
The three W-taps accumulate into separate acc buffers that are lane-rolled
by +-C and masked at the W edges before the channel reduction, so no
per-tap lane shifts are needed.

The attention map itself is only consumed by the spvPA training loss; in
inference it is dead.  `att_out="wide"` emits it segment-broadcast over the
channel lanes ((B, D, H, W, Cm), every channel equal) for callers that need
it — a lane-strided slice recovers the compact map; `att_out="none"` skips
the write.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _seg_allreduce(x, cm: int, wc: int):
    """Sum within each aligned cm-lane segment, broadcast back to all lanes.

    Segmented Hillis-Steele inclusive scan (guard `o >= s` keeps partial
    sums inside their segment), then a doubling broadcast from each
    segment's last lane.  Works for any cm; 2*ceil(log2 cm) rolls total.
    """
    o = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1) % cm
    zero = jnp.zeros((), x.dtype)
    s = 1
    while s < cm:
        x = x + jnp.where(o >= s, pltpu.roll(x, s, 1), zero)
        s *= 2
    t = jnp.where(o == cm - 1, x, zero)
    s = 1
    while s < cm:
        # roll left by s == roll right by wc - s (pltpu.roll needs shift >= 0)
        t = t + jnp.where(o + s <= cm - 1, pltpu.roll(t, wc - s, 1), zero)
        s *= 2
    return t


def _att_kernel(a1_ref, wrow_ref, b2_ref, *args, ht, h, w, cm, cxs, ndd,
                d_per_b, att_out, out_dtype):
    nx = len(cxs)
    x_refs = args[:nx]
    natt = 1 if att_out == "wide" else 0
    att_refs = args[nx:nx + natt]
    out_refs = args[nx + natt:nx + natt + nx]
    slabs = args[nx + natt + nx]                    # (ndd, ht+16, wc)
    sem = args[-1]

    i = pl.program_id(0)
    ntiles = h // ht
    bd = i // ntiles
    t = i % ntiles
    h0 = t * ht
    wc = w * cm

    # --- fetch a1 row slabs (one per depth tap) --------------------------
    # a1 rows are padded by 8 top/bottom; slab dd covers padded rows
    # [plane + h0, plane + h0 + ht + 16), i.e. unpadded [h0 - 8, h0 + ht + 8)
    # of the tap's plane, so the h0-1 / h0+ht halo rows sit at slab rows
    # 7 and ht + 8.  All starts are multiples of 8 (h % 8 == ht % 8 == 0).
    d = bd % d_per_b
    n_bd = pl.num_programs(0) // ntiles
    copies = []
    for dd in range(ndd):
        doff = dd - (ndd // 2)
        # clamp to a valid plane: out-of-range depth taps are masked out of
        # the accumulation below, but the DMA itself must stay in bounds
        plane = jnp.clip(bd + doff, 0, n_bd - 1) * h
        copies.append(pltpu.make_async_copy(
            a1_ref.at[pl.ds(plane + h0, ht + 16)], slabs.at[dd],
            sem.at[dd]))
    for c in copies:
        c.start()
    for c in copies:
        c.wait()

    zero = jnp.zeros((), jnp.float32)
    ri = jax.lax.broadcasted_iota(jnp.int32, (ht, wc), 0)
    accs = [jnp.zeros((ht, wc), jnp.float32) for _ in range(3)]
    for dd in range(ndd):
        doff = dd - (ndd // 2)
        slab = slabs[dd]                       # (ht + 16, wc) value
        if ndd > 1:
            valid = jnp.logical_and(d + doff >= 0, d + doff < d_per_b)
            slab = jnp.where(valid, slab, jnp.zeros((), slab.dtype))
        for dh in range(3):
            rows = slab[7 + dh:7 + dh + ht]
            if dh == 0:
                # h0 - 1 halo: previous plane's data when t == 0
                rows = jnp.where((t == 0) & (ri == 0), zero, rows)
            elif dh == 2:
                rows = jnp.where((t == ntiles - 1) & (ri == ht - 1),
                                 zero, rows)
            for dw in range(3):
                wr = wrow_ref[(dd * 3 + dh) * 3 + dw][None]
                accs[dw] = accs[dw] + rows * wr

    # --- combine W-taps with +-C lane rolls, reduce within W-groups ------
    lane = jax.lax.broadcasted_iota(jnp.int32, (ht, wc), 1)
    left = jnp.where(lane < cm, 0.0, pltpu.roll(accs[0], cm, 1))
    right = jnp.where(lane >= wc - cm, 0.0, pltpu.roll(accs[2], wc - cm, 1))
    combined = accs[1] + left + right
    s = _seg_allreduce(combined, cm, wc)        # (ht, wc), per-(h, w) sums
    att = jax.nn.sigmoid(s + b2_ref[0, 0]).astype(out_dtype)
    if att_out == "wide":
        att_refs[0][...] = att

    # --- gate both halves -------------------------------------------------
    for x_ref, o_ref in zip(x_refs, out_refs):
        xv = x_ref[...]
        o_ref[...] = att * xv + xv


@partial(jax.jit, static_argnames=("kd", "ht", "att_out", "interpret"))
def fused_attention_gate(a1: jnp.ndarray, xs: Tuple[jnp.ndarray, ...],
                         w2: jnp.ndarray, b2: jnp.ndarray, *, kd: int,
                         ht: int = 48, att_out: str = "wide",
                         interpret: bool = False):
    """att = sigmoid(conv3d(a1, w2) + b2); outs = [att * x + x for x in xs].

    a1 (B, D, H, W, Cm); xs: 1-2 tensors (B, D, H, W, Cm) (the skip-concat
    halves); w2 (3, 3, kd, Cm, 1) in reference (kh, kw, kd) order; b2 (1,).
    Returns (att, tuple(outs)); att is (B, D, H, W, Cm) with every channel
    holding the attention value (att_out="wide"; `att[..., :1]` is the
    compact map) or None (att_out="none").  Requires (W*Cm) % 128 == 0,
    all xs channel counts == Cm, H % ht == 0, kd in (1, 3), stride 1,
    same padding.
    """
    B, D, H, W, Cm = a1.shape
    assert kd in (1, 3) and w2.shape[:3] == (3, 3, kd)
    assert att_out in ("wide", "none")
    wc = W * Cm
    assert wc % 128 == 0 and H % ht == 0 and ht % 8 == 0 and H % 8 == 0
    cxs = tuple(int(x.shape[-1]) for x in xs)
    for x in xs:
        assert x.shape == (B, D, H, W, Cm)

    dtype = xs[0].dtype
    rows = B * D * H
    a1v = jnp.pad(a1.reshape(rows, wc), ((8, 8), (0, 0)))
    xvs = [x.reshape(rows, wc) for x in xs]

    # per-tap weight rows: wrow[(dd*3+dh)*3+dw] = tile(w2[dh, dw, dd, :, 0], W)
    ndd = kd
    w2f = jnp.asarray(w2, jnp.float32).reshape(3, 3, kd, Cm)
    taps = [w2f[dh, dw, dd] for dd in range(ndd) for dh in range(3)
            for dw in range(3)]
    wrow = jnp.tile(jnp.stack(taps), (1, W))  # (ndd*9, W*Cm)

    ntiles = H // ht
    grid = (B * D * ntiles,)
    nx = len(xs)
    natt = 1 if att_out == "wide" else 0

    kernel = pl.pallas_call(
        partial(_att_kernel, ht=ht, h=H, w=W, cm=Cm, cxs=cxs, ndd=ndd,
                d_per_b=D, att_out=att_out, out_dtype=dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),          # a1 rows (manual DMA)
            pl.BlockSpec(memory_space=pltpu.VMEM),      # wrow
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),      # b2
        ] + [
            pl.BlockSpec((ht, wc), lambda i: (i, 0),
                         memory_space=pltpu.VMEM) for _ in cxs
        ],
        out_specs=[
            pl.BlockSpec((ht, wc), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
            for _ in range(natt + nx)
        ],
        out_shape=[jax.ShapeDtypeStruct((rows, wc), dtype)
                   for _ in range(natt + nx)],
        scratch_shapes=[
            pltpu.VMEM((ndd, ht + 16, wc), a1.dtype),   # halo'd row slabs
            pltpu.SemaphoreType.DMA((ndd,)),
        ],
        interpret=interpret,
    )
    b2s = jnp.asarray(b2, jnp.float32).reshape(1, 1)
    outs = kernel(a1v, wrow, b2s, *xvs)
    att = outs[0].reshape(B, D, H, W, Cm) if natt else None
    gated = tuple(o.reshape(B, D, H, W, Cm) for o in outs[natt:])
    return att, gated


# Tests set this to exercise the fused path on CPU via interpret mode.
FORCE_INTERPRET = False


def force_interpret() -> bool:
    return FORCE_INTERPRET


def fusion_enabled() -> bool:
    """Fused attention dispatch: real Mosaic on TPU (or interpret when
    forced), and never inside a spatial-sharding trace — the fused conv2
    would skip the halo exchange that nn/layers.py:conv3d inserts there.
    Opt-in: VS_ATT_FUSE=1 enables on TPU.  The window-scale A/B
    (tools/fwd_probe.py, r3) measured the fused forward 90 ms SLOWER than
    the XLA path (185 vs 95 ms with conv333 on) — the L0/L1 sites run
    768/384 small grid steps with serialized slab DMAs.  Keep off until
    per-level gating demonstrates an in-context win."""
    import os

    from vs_seg_tpu.nn import layers

    if layers._SPATIAL is not None:
        return False
    if FORCE_INTERPRET:
        return True
    return (os.environ.get("VS_ATT_FUSE") == "1"
            and jax.default_backend() == "tpu")


def pick_ht(H: int) -> int:
    """Largest row-tile height (<= 64) dividing H, 0 if none fits."""
    for ht in (64, 48, 32, 24, 16, 8):
        if H % ht == 0:
            return ht
    return 0


def can_fuse(a1_shape, x_shapes, kd: int) -> bool:
    """Static dispatch check for fused_attention_gate."""
    B, D, H, W, Cm = a1_shape
    if kd not in (1, 3) or not pick_ht(H) or (W * Cm) % 128:
        return False
    return all(tuple(s) == (B, D, H, W, Cm) for s in x_shapes)
