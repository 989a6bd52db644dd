"""Pallas TPU kernel: (3,3,3) stride-1 "same" conv as banded block matmuls,
with an optional fused scale/shift + PReLU epilogue and native pair input.

Targets the reference net's L2/L3 levels (48-64ch (3,3,3) convolutions,
params/VSparams.py:355-369) where XLA's conv emitter reaches only ~17-21
TFLOP/s on v5e (N=48 of 128 output lanes + layout copies before every conv;
round-3 trace: the L2 block is ~145 ms of the 329 ms inference volume).
Design:

- Channels are zero-padded to Cp in {64, 128} so a (B*D*H, W*Cp) row view
  packs exactly G = 128//Cp W-positions per 128-lane block — the natural
  MXU tile.  Views that keep 128-lane blocks are free (layout-preserving);
  lane-split reshapes to (.., W, C) are not supported by Mosaic.
- Each of the 9 (dh, dd) row taps becomes two (ht*nb, 128) @ (128, 128)
  matmuls: a "main" matmul against the within-block Toeplitz matrix (for
  G=2: input positions {2g, 2g+1} -> outputs {2g, 2g+1}, W-taps dw = p-q+1)
  and an "edge" matmul whose K halves hold positions 2g-1 / 2g+2, composed
  in-register from two 64-lane rolls + an iota select (for G=1, two full
  neighbor-block matmuls).  No im2col copies, no gathers; FLOP inflation is
  (executed K=256) / (useful 3*48) = 1.78x for Cin=48 -> a ~1.5-2.5 ms/conv
  ceiling vs 8.4 ms XLA at the L2 reference shape.
- Pair input (xa, xb) standing for channel concat (the model's skip
  connections, nn/layers.py:Conv3d pair path): each half keeps its own
  Cp=64 lane geometry and tap loop, accumulating into one f32 accumulator —
  conv(concat(xa, xb), w) == conv(xa, w[:ca]) + conv(xb, w[ca:]) without
  ever materializing the concat.
- H halos: the row array is padded by 8 rows top/bottom and each depth tap
  DMAs one aligned (ht+16)-row slab (same scheme as ops/pallas_att.py);
  plane-crossing halo rows are zeroed with one-row masks.
- Epilogue: per-channel scale/shift (bias or eval-folded BatchNorm) and
  PReLU fold into the accumulator before the single bf16 store, removing
  one full HBM round trip per Convolution block (nn/blocks.py).

The Toeplitz block assembly is traceable jnp (static-index updates) so the
kernel can be called on traced weights inside a jitted predictor; XLA's
while-loop LICM hoists it out of the fused window loop.

Reference counterpart: torch Conv3d inside params/networks/nets/unet2d5_spvpa.py
conv blocks; numerics pinned against lax.conv in tests/test_pallas_conv333.py.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _conv_kernel(*refs, ht, h, w, cps, ndd, d_per_b, cpo, epilogue,
                 out_dtype):
    n_in = len(cps)
    x_refs = refs[:n_in]
    w0_ref, we_ref, eps_ref, out_ref = refs[n_in:n_in + 4]
    slab_refs = refs[n_in + 4:n_in + 4 + n_in]
    sem = refs[-1]

    i = pl.program_id(0)
    ntiles = h // ht
    bd = i // ntiles
    t = i % ntiles
    h0 = t * ht
    nbo = (w * cpo) // 128

    d = bd % d_per_b
    n_bd = pl.num_programs(0) // ntiles
    copies = []
    for xi in range(n_in):
        for dd in range(ndd):
            doff = dd - (ndd // 2)
            plane = jnp.clip(bd + doff, 0, n_bd - 1) * h
            copies.append(pltpu.make_async_copy(
                x_refs[xi].at[pl.ds(plane + h0, ht + 16)],
                slab_refs[xi].at[dd], sem.at[xi, dd]))
    for c in copies:
        c.start()
    for c in copies:
        c.wait()

    acc = jnp.zeros((ht * nbo, 128), jnp.float32)
    mat_k = 0          # running index into the stacked w0/we matrices
    mat_e = 0
    for xi in range(n_in):
        cp = cps[xi]
        g = 128 // cp
        wc = w * cp
        nb = wc // 128
        slabs = slab_refs[xi]
        zero = jnp.zeros((), slabs.dtype)
        ri = jax.lax.broadcasted_iota(jnp.int32, (ht, wc), 0)
        lane = jax.lax.broadcasted_iota(jnp.int32, (ht, wc), 1)

        def mm(lhs2d, mat, nb=nb):
            lhs = lhs2d.reshape(ht, nb, 128).reshape(ht * nb, 128)
            return jax.lax.dot_general(lhs, mat, (((1,), (0,)), ((), ())),
                                       preferred_element_type=jnp.float32)

        for dd in range(ndd):
            doff = dd - (ndd // 2)
            slab = slabs[dd]
            if ndd > 1:
                valid = jnp.logical_and(d + doff >= 0, d + doff < d_per_b)
                slab = jnp.where(valid, slab, zero)
            for dh in range(3):
                rows = slab[7 + dh:7 + dh + ht]
                if dh == 0:
                    rows = jnp.where((t == 0) & (ri == 0), zero, rows)
                elif dh == 2:
                    rows = jnp.where((t == ntiles - 1) & (ri == ht - 1),
                                     zero, rows)
                acc += mm(rows, w0_ref[mat_k])
                mat_k += 1
                if g == 2:
                    # edge K halves: positions 2g-1 (0:cp) / 2g+2 (cp:128)
                    lo = pltpu.roll(rows, cp, 1)          # lane l <- l - cp
                    hi = pltpu.roll(rows, wc - cp, 1)     # lane l <- l + cp
                    xr = jnp.where(lane % 128 < cp, lo, hi)
                    # zero the W-boundary taps (position -1 / position W)
                    xr = jnp.where((lane < cp) | (lane >= wc - cp), zero, xr)
                    acc += mm(xr, we_ref[mat_e])
                    mat_e += 1
                else:
                    lo = pltpu.roll(rows, 128, 1)         # left neighbor
                    hi = pltpu.roll(rows, wc - 128, 1)    # right neighbor
                    lo = jnp.where(lane < 128, zero, lo)
                    hi = jnp.where(lane >= wc - 128, zero, hi)
                    acc += mm(lo, we_ref[mat_e])
                    acc += mm(hi, we_ref[mat_e + 1])
                    mat_e += 2

    if epilogue:
        y = acc * eps_ref[0][None] + eps_ref[1][None]
        y = jnp.where(y >= 0, y, eps_ref[2][None] * y)
    else:
        y = acc
    out_ref[...] = (y.astype(out_dtype)
                    .reshape(ht, nbo, 128).reshape(ht, w * cpo))


def _build_mats(w, cp: int, cpo: int, dtype):
    """Toeplitz block matrices for one input from (3, 3, 3, Cin, Cout)
    reference-order (kh, kw, kd) weights, channel-padded to cp (in) / cpo
    (out).  Traceable (static-index updates).  Requires the input block
    grouping g = 128//cp to equal the output grouping 128//cpo.  Returns
    (w0 list of 9, we list of 9 or 18) (128, 128) blocks indexed [dd*3+dh].
    """
    _, _, _, cin, cout = w.shape
    g = 128 // cp
    assert 128 // cpo == g, "input/output W-groupings must match"
    wf = jnp.zeros((3, 3, 3, cp, cpo), jnp.float32)
    wf = wf.at[:, :, :, :cin, :cout].set(jnp.asarray(w, jnp.float32))
    w0s, wes = [], []
    for dd in range(3):
        for dh in range(3):
            if g == 2:
                m = jnp.zeros((128, 128), jnp.float32)
                for p in range(2):          # input position within block
                    for q in range(2):      # output position within block
                        dw = p - q + 1
                        if 0 <= dw <= 2:
                            m = m.at[p * cp:(p + 1) * cp,
                                     q * cpo:(q + 1) * cpo].set(wf[dh, dw, dd])
                w0s.append(m)
                # K half 0: pos 2g-1 -> output 2g (dw=0);
                # K half 1: pos 2g+2 -> output 2g+1 (dw=2)
                e = jnp.zeros((128, 128), jnp.float32)
                e = e.at[0:cp, 0:cpo].set(wf[dh, 0, dd])
                e = e.at[cp:128, cpo:128].set(wf[dh, 2, dd])
                wes.append(e)
            else:
                w0s.append(wf[dh, 1, dd])
                wes.append(wf[dh, 0, dd])       # left neighbor (dw=0)
                wes.append(wf[dh, 2, dd])       # right neighbor (dw=2)
    return w0s, wes


def _pad_c(v, cout, cpo, g, default):
    if v is None:
        return jnp.full((128,), default, jnp.float32)
    v = jnp.asarray(v, jnp.float32).reshape(-1)
    if v.shape[0] == 1 and cout > 1:       # shared scalar (torch PReLU)
        v = jnp.broadcast_to(v, (cout,))
    return jnp.tile(jnp.pad(v, (0, cpo - v.shape[0])), g)


def _cp_for(c: int) -> int:
    return 64 if c <= 64 else 128


def conv333(x, w: jnp.ndarray,
            scale: Optional[jnp.ndarray] = None,
            shift: Optional[jnp.ndarray] = None,
            prelu_alpha: Optional[jnp.ndarray] = None, *,
            out_padded: bool = False,
            interpret: bool = False) -> jnp.ndarray:
    """(3,3,3) stride-1 same-padded conv; returns (B, D, H, W, Cout).

    x: (B, D, H, W, Cin) or a pair (xa, xb) standing for their channel
    concat; w (3, 3, 3, Cin_total, Cout) in reference (kh, kw, kd) order.
    Optional fused epilogue y = prelu(y * scale + shift) with per-channel
    (Cout,) or scalar vectors (pass shift=bias, scale=None for a plain
    biased conv).  Requires can_conv333(shapes, w.shape).  With
    out_padded=True the (B, D, H, W, Cpo) channel-padded result is
    returned (padding channels exactly zero)."""
    xs = tuple(x) if isinstance(x, (tuple, list)) else (x,)
    B, D, H, W = xs[0].shape[:4]
    cins = [int(v.shape[-1]) for v in xs]
    kh, kw, kd, wcin, Cout = w.shape
    assert (kh, kw, kd) == (3, 3, 3) and wcin == sum(cins)
    # one unified channel padding: the banded matmul maps input block g to
    # output block g, so input and output W-groupings must match
    cp_all = _cp_for(max(cins + [Cout]))
    cpo = cp_all
    cps = tuple(cp_all for _ in cins)
    g = 128 // cpo
    assert (W * cpo) % 128 == 0 and H % 8 == 0
    ht = pick_ht(H)
    assert ht, f"no row tile divides H={H}"

    dtype = xs[0].dtype
    w0s, wes = [], []
    c0 = 0
    for cin, cp in zip(cins, cps):
        a, b = _build_mats(w[:, :, :, c0:c0 + cin, :], cp, cpo, dtype)
        w0s += a
        wes += b
        c0 += cin
    w0 = jnp.stack(w0s).astype(dtype)
    we = jnp.stack(wes).astype(dtype)

    epilogue = (scale is not None or shift is not None
                or prelu_alpha is not None)
    eps = jnp.stack([_pad_c(scale, Cout, cpo, g, 1.0),
                     _pad_c(shift, Cout, cpo, g, 0.0),
                     _pad_c(prelu_alpha, Cout, cpo, g, 1.0)])

    rows = B * D * H
    xvs = []
    for v, cp in zip(xs, cps):
        cin = v.shape[-1]
        vp = v if cin == cp else jnp.pad(v, ((0, 0),) * 4 + ((0, cp - cin),))
        xvs.append(jnp.pad(vp.reshape(rows, W * cp), ((8, 8), (0, 0))))

    grid = (B * D * (H // ht),)
    kernel = pl.pallas_call(
        partial(_conv_kernel, ht=ht, h=H, w=W, cps=cps, ndd=3, d_per_b=D,
                cpo=cpo, epilogue=epilogue, out_dtype=dtype),
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY) for _ in xs] + [
            pl.BlockSpec(memory_space=pltpu.VMEM),    # w0
            pl.BlockSpec(memory_space=pltpu.VMEM),    # we
            pl.BlockSpec(memory_space=pltpu.VMEM),    # epilogue params
        ],
        out_specs=pl.BlockSpec((ht, W * cpo), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, W * cpo), dtype),
        scratch_shapes=[
            pltpu.VMEM((3, ht + 16, W * cp), dtype) for cp in cps
        ] + [pltpu.SemaphoreType.DMA((len(xs), 3))],
        interpret=interpret,
    )
    out = kernel(*xvs, w0, we, eps).reshape(B, D, H, W, cpo)
    return out if out_padded else out[..., :Cout]


def pick_ht(H: int) -> int:
    for ht in (48, 32, 24, 16, 8):
        if H % ht == 0:
            return ht
    return 0


def can_conv333(x_shapes, w_shape) -> bool:
    """x_shapes: one shape tuple or a sequence of them (pair input)."""
    if len(w_shape) != 5 or tuple(w_shape[:3]) != (3, 3, 3):
        return False
    if not isinstance(x_shapes[0], (tuple, list)):
        x_shapes = [x_shapes]
    B, D, H, W = x_shapes[0][:4]
    cout = int(w_shape[4])
    if cout > 128:
        return False
    cmax = cout
    for s in x_shapes:
        if tuple(s[:4]) != (B, D, H, W) or int(s[4]) > 128:
            return False
        cmax = max(cmax, int(s[4]))
    cpo = _cp_for(cmax)
    return (W * cpo) % 128 == 0 and H % 8 == 0 and pick_ht(H) > 0
