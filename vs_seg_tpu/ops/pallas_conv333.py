"""Pallas TPU kernel: (3,3,3) stride-1 "same" conv as banded block matmuls,
with an optional fused scale/shift + PReLU epilogue and native pair input.

Targets the reference net's L2/L3 levels (48-64ch (3,3,3) convolutions,
params/VSparams.py:355-369) where XLA's conv emitter reaches only ~17-21
TFLOP/s on v5e (N=48 of 128 output lanes + layout copies before every conv;
round-3 trace: the L2 block is ~145 ms of the 329 ms inference volume).

Layout design (v2 — the whole kernel lives in MXU-native (rows, 128) tiles):

- Channels are zero-padded to Cp in {64, 128} so each 128-lane row holds
  G = 128//Cp consecutive W positions; the volume becomes a flat
  (B*D*H*nb, 128) row array with nb = W*Cp//128 rows per H line.  This view
  is a free HBM reshape, and — crucially — it is ALSO the natural matmul
  operand shape, so the kernel never performs a lane-split reshape (Mosaic
  materializes those as full relayout copies; the v1 kernel spent ~10x its
  matmul time there).
- Neighbor access becomes SUBLANE geometry: the previous/next W block of a
  row is the previous/next sublane row (one f32 sublane roll), and the
  h+-1 taps are slab slices at row offsets {0, nb, 2*nb} — statically
  aligned (nb % 8 == 0), i.e. free views.  Rolls are done in f32
  (Mosaic: "Rotate with non-32-bit data" is unimplemented; bf16 -> f32 ->
  bf16 round-trips exactly).
- Each of the 9 (dh, dd) taps costs 2 matmuls for G=2 (a within-block
  Toeplitz "main" matmul + one packed edge matmul whose K halves read the
  lane-disjoint halves of the rolled-up/rolled-down rows) or 3 for G=1
  (main + left/right neighbor-row matmuls).  All are (ht*nb, 128) @
  (128, 128) MXU tiles.
- Pair input (xa, xb) standing for channel concat (the model's skip
  connections, nn/layers.py:Conv3d pair path): each half keeps its own
  row array and tap loop, accumulating into one f32 accumulator —
  conv(concat(xa, xb), w) == conv(xa, w[:ca]) + conv(xb, w[ca:]) without
  ever materializing the concat.
- Depth taps DMA one ((ht+2)*nb)-row slab per (input, dd) from the
  nb-row-padded flat array; plane-crossing H-halo row blocks are zeroed
  with iota masks, out-of-range depth planes with a whole-slab mask.
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
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _conv_kernel(*refs, ht, h, nbs, g, ndd, d_per_b, nbo, epilogue,
                 out_dtype):
    n_in = len(nbs)
    x_refs = refs[:n_in]
    w0_ref, we_ref, eps_ref, out_ref = refs[n_in:n_in + 4]
    slab_refs = refs[n_in + 4:n_in + 4 + n_in]
    sem = refs[-1]

    i = pl.program_id(0)
    ntiles = h // ht
    bd = i // ntiles
    t = i % ntiles

    d = bd % d_per_b
    n_bd = pl.num_programs(0) // ntiles
    copies = []
    for xi in range(n_in):
        nb = nbs[xi]
        for dd in range(ndd):
            doff = dd - (ndd // 2)
            # flat row of H line (t*ht - 1) in plane clip(bd+doff) of the
            # nb-row-padded array: (plane*h + t*ht - 1 + 1) * nb
            start = (jnp.clip(bd + doff, 0, n_bd - 1) * h + t * ht) * nb
            copies.append(pltpu.make_async_copy(
                x_refs[xi].at[pl.ds(start, (ht + 2) * nb)],
                slab_refs[xi].at[dd], sem.at[xi, dd]))
    for c in copies:
        c.start()
    for c in copies:
        c.wait()

    acc = jnp.zeros((ht * nbo, 128), jnp.float32)
    mat_k = 0          # running index into the stacked w0/we matrices
    mat_e = 0
    for xi in range(n_in):
        nb = nbs[xi]
        cp = 128 // g
        rows_n = ht * nb
        srows = (ht + 2) * nb
        slabs = slab_refs[xi]
        zero = jnp.zeros((), slabs.dtype)
        frs = jax.lax.broadcasted_iota(jnp.int32, (srows, 128), 0)
        lanes = jax.lax.broadcasted_iota(jnp.int32, (srows, 128), 1)

        def mm(lhs, mat):
            return jax.lax.dot_general(lhs, mat, (((1,), (0,)), ((), ())),
                                       preferred_element_type=jnp.float32)

        for dd in range(ndd):
            doff = dd - (ndd // 2)
            slab = slabs[dd]
            # out-of-range depth plane / plane-crossing H-halo row blocks:
            # zero ONCE at slab level (first nb rows when t==0, last nb
            # when t==ntiles-1) so every derived view inherits it
            invalid = jnp.zeros((), jnp.bool_)
            if ndd > 1:
                invalid = jnp.logical_or(d + doff < 0, d + doff >= d_per_b)
            bad = (invalid | ((t == 0) & (frs < nb))
                   | ((t == ntiles - 1) & (frs >= srows - nb)))
            slab = jnp.where(bad, zero, slab)
            # hoisted cross-block W-tap prep (one pass set per SLAB, not
            # per tap — the per-tap VPU interleave throttles MXU issue):
            # +-1 sublane rolls in f32, W-boundary masks, lane-packed
            # select, single cast back to bf16
            s32 = slab.astype(jnp.float32)
            lo_s = pltpu.roll(s32, 1, 0)              # row r <- row r-1
            lo_s = jnp.where(frs % nb == 0, 0.0, lo_s)
            hi_s = pltpu.roll(s32, srows - 1, 0)      # row r <- row r+1
            hi_s = jnp.where(frs % nb == nb - 1, 0.0, hi_s)
            if g == 2:
                # packed edge: K 0:cp <- pos 2g+2 (hi), K cp: <- pos 2g-1
                # (lo) — lane-disjoint halves of different rolls
                xr_s = jnp.where(lanes < cp, hi_s, lo_s).astype(slabs.dtype)
            else:
                lo_b = lo_s.astype(slabs.dtype)
                hi_b = hi_s.astype(slabs.dtype)
            for dh in range(3):
                # h-1/h/h+1 taps: statically aligned slab slices (free)
                sl = slice(dh * nb, dh * nb + rows_n)
                acc += mm(slab[sl], w0_ref[mat_k])
                mat_k += 1
                if g == 2:
                    acc += mm(xr_s[sl], we_ref[mat_e])
                    mat_e += 1
                else:
                    acc += mm(lo_b[sl], we_ref[mat_e])
                    acc += mm(hi_b[sl], we_ref[mat_e + 1])
                    mat_e += 2

    if epilogue:
        y = acc * eps_ref[0][None] + eps_ref[1][None]
        y = jnp.where(y >= 0, y, eps_ref[2][None] * y)
    else:
        y = acc
    out_ref[...] = y.astype(out_dtype)


def _build_mats(w, cp: int, cpo: int):
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
                # packed edge (see kernel): K half 0 = next row's pos 2g+2
                # -> output 2g+1 (dw=2); K half 1 = prev row's pos 2g-1 ->
                # output 2g (dw=0)
                e = jnp.zeros((128, 128), jnp.float32)
                e = e.at[0:cp, cpo:128].set(wf[dh, 2, dd])
                e = e.at[cp:128, 0:cpo].set(wf[dh, 0, dd])
                wes.append(e)
            else:
                w0s.append(wf[dh, 1, dd])
                wes.append(wf[dh, 0, dd])       # prev row (dw=0)
                wes.append(wf[dh, 2, dd])       # next row (dw=2)
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
    nbo = (W * cpo) // 128
    nbs = tuple((W * cp) // 128 for cp in cps)
    assert (W * cpo) % 128 == 0 and nbo % 8 == 0 and H % 8 == 0
    ht = pick_ht(H, nbs, nbo)
    assert ht, f"no row tile fits H={H} W={W} nbs={nbs}"

    dtype = xs[0].dtype
    w0s, wes = [], []
    c0 = 0
    for cin, cp in zip(cins, cps):
        a, b = _build_mats(w[:, :, :, c0:c0 + cin, :], cp, cpo)
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
    for v, cp, nb in zip(xs, cps, nbs):
        cin = v.shape[-1]
        vp = v if cin == cp else jnp.pad(v, ((0, 0),) * 4 + ((0, cp - cin),))
        # free HBM reshape to the flat row array, padded one H line (nb
        # rows) top and bottom so every slab DMA start is in range
        xvs.append(jnp.pad(vp.reshape(rows * nb, 128), ((nb, nb), (0, 0))))

    grid = (B * D * (H // ht),)
    kernel = pl.pallas_call(
        partial(_conv_kernel, ht=ht, h=H, nbs=nbs, g=g, ndd=3, d_per_b=D,
                nbo=nbo, epilogue=epilogue, out_dtype=dtype),
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY) for _ in xs] + [
            pl.BlockSpec(memory_space=pltpu.VMEM),    # w0
            pl.BlockSpec(memory_space=pltpu.VMEM),    # we
            pl.BlockSpec(memory_space=pltpu.VMEM),    # epilogue params
        ],
        out_specs=pl.BlockSpec((ht * nbo, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows * nbo, 128), dtype),
        scratch_shapes=[
            pltpu.VMEM((3, (ht + 2) * nb, 128), dtype) for nb in nbs
        ] + [pltpu.SemaphoreType.DMA((len(xs), 3))],
        interpret=interpret,
    )
    out = kernel(*xvs, w0, we, eps).reshape(B, D, H, W, cpo)
    return out if out_padded else out[..., :Cout]


def _vmem_est(ht: int, nbs, nbo: int) -> int:
    """Scoped-VMEM estimate (bytes): per-input DMA slabs (x3 depth taps),
    bf16 out block, f32 accumulator, and ~3 live (ht*nb, 128) f32
    roll/select temporaries (Mosaic keeps shifted views materialized —
    round-2 lesson), plus the stacked Toeplitz matrices."""
    slabs = sum(3 * (ht + 2) * nb * 128 * 2 for nb in nbs)
    out = ht * nbo * 128 * (2 + 4)
    temps = 3 * ht * max(nbs) * 128 * 4
    mats = 27 * len(nbs) * 128 * 128 * 2 * 2
    return slabs + out + temps + mats


def pick_ht(H: int, nbs=(48,), nbo: int = 48,
            budget: int = 12 << 20) -> int:
    """Largest row tile dividing H whose scoped-VMEM estimate fits the
    16 MB limit with headroom (the v5e compiler's scoped limit is 16 MB;
    overshoot is a hard compile error)."""
    for ht in (48, 32, 24, 16, 8):
        if H % ht == 0 and _vmem_est(ht, nbs, nbo) <= budget:
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
    nbo = (W * cpo) // 128
    if (W * cpo) % 128 or nbo % 8 or H % 8:
        return False
    nbs = [nbo] * len(x_shapes)
    return pick_ht(H, nbs, nbo) > 0


# Tests set this to exercise the fused path on CPU via interpret mode.
FORCE_INTERPRET = False


def force_interpret() -> bool:
    return FORCE_INTERPRET


def fusion_enabled() -> bool:
    """conv333 dispatch from nn/blocks.py:Convolution: real Mosaic on TPU
    (or interpret when forced), and never inside a spatial-sharding trace —
    the kernel zero-pads H instead of exchanging halos there.
    Opt-in: VS_CONV333=1 enables on TPU.  The window-scale A/B
    (tools/fwd_probe.py, r3) measured the fused forward 15 ms SLOWER than
    the XLA path (95 vs 80 ms / 2-window batch) despite winning isolated
    chains — the pad/slice channel boundaries around each kernel call cost
    more than the conv saves.  Re-A/B'd on the bench path in r4 with
    l2block+rublock on (docs/KERNELS.md r4 gate table): neutral (295.0 vs
    294.4/297.7 ms full window loop) — the surviving sites (bottom, L4,
    down_4) are sub-ms on XLA.  Stays OFF."""
    import os

    from vs_seg_tpu.nn import layers

    if layers._SPATIAL is not None:
        return False
    if FORCE_INTERPRET:
        return True
    return (os.environ.get("VS_CONV333") == "1"
            and jax.default_backend() == "tpu")
