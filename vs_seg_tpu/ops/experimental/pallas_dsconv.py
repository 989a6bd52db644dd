"""Pallas TPU kernel: (3,3,3) stride-(2,2,2) "same" downsample conv with a
fused scale/shift + PReLU epilogue — the round-4 frontier item 1
(docs/KERNELS.md): the flagship's `downsample_2` site (reference
params/VSparams.py:355-369 via params/networks/nets/unet2d5_spvPA.py:113-136)
sits directly BETWEEN two default-on Pallas mega-kernels (the L2 encoder
ru_block and the L3 ru_block), so the custom-call layout barrier is already
paid on both sides; an XLA conv island there re-materializes row-major
operands and results for nothing.

The stride-2 geometry is made pure stride-1 by PARITY SPLITS:

- D stride needs no split: the depth tap dd of output plane o reads input
  plane 2o + dd - 1, and slab DMAs address planes by row offset directly.
- H stride: two XLA strided slices split the input into H-even / H-odd
  line streams.  Tap dh of output line ho reads H-even line ho (dh == 1)
  or H-odd lines ho-1 / ho (dh == 0 / 2) — contiguous slab ranges in the
  stream index, so every DMA is a plain row range.
- W stride: with cp = 64 (g = 2 W positions per 128-lane block), the free
  reshape (rows, 128) -> (rows/2, 256) puts even/odd W BLOCKS side by side
  in lanes; the two slabs are lane-sliced DMAs at offsets 0 / 128 (lane
  offsets must be multiples of 128 — satisfied by construction).  Output
  block j' = (2j', 2j'+1) then needs input blocks 2j' (E), 2j'+1 (O) and
  2j'-1 (O rolled down one sublane row), i.e. three banded block matmuls
  per (dd, dh) tap:

      out[j'] = E[j'] @ A + O[j'] @ B + roll(O)[j'] @ C

  A: [0:64,0:64]=w(dw=1) [64:,0:64]=w(dw=2) [64:,64:]=w(dw=0)
  B: [0:64,64:]=w(dw=1)  [64:,64:]=w(dw=2)
  C: [64:,0:64]=w(dw=0)

Each grid step computes one whole output plane (the halved resolution makes
whole-plane tiles fit VMEM comfortably), so there is no H-tile halo
recompute at all.  Numerics pinned against the composed XLA Convolution in
tests/test_pallas_dsconv.py (interpret mode) and at model level in
tests/test_model.py.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vs_seg_tpu.ops.pallas_conv333 import _pad_c


def _ds_kernel(he_ref, ho_ref, wa_ref, wb_ref, wc_ref, eps_ref, out_ref,
               es, os_, sem, *, h2, npr, d2, d_in, epilogue, out_dtype):
    i = pl.program_id(0)
    b = i // d2
    o = i % d2
    rows_e = h2 * npr
    rows_od = (h2 + 1) * npr

    copies = []
    for dd in range(3):
        p = 2 * o + dd - 1
        gp = b * d_in + jnp.clip(p, 0, d_in - 1)
        for we in range(2):
            copies.append(pltpu.make_async_copy(
                he_ref.at[pl.ds(gp * rows_e, rows_e),
                          pl.ds(we * 128, 128)],
                es.at[dd, we], sem.at[0, dd, we]))
            # H-odd slab covers stream lines -1..h2-1 (the globally
            # row-padded array puts plane gp's line -1 at row gp*rows_e)
            copies.append(pltpu.make_async_copy(
                ho_ref.at[pl.ds(gp * rows_e, rows_od),
                          pl.ds(we * 128, 128)],
                os_.at[dd, we], sem.at[1, dd, we]))
    for c in copies:
        c.start()
    for c in copies:
        c.wait()

    fr_e = jax.lax.broadcasted_iota(jnp.int32, (rows_e, 128), 0)
    fr_o = jax.lax.broadcasted_iota(jnp.int32, (rows_od, 128), 0)
    acc = jnp.zeros((rows_e, 128), jnp.float32)
    for dd in range(3):
        pvalid = (2 * o + dd - 1) >= 0  # 2o+dd-1 < d_in always holds
        slabs = {}
        for hp, (ref, fr, nrows) in enumerate((
                (es, fr_e, rows_e), (os_, fr_o, rows_od))):
            # H-odd first line is stream index -1 == H zero-padding
            bad = ~pvalid | ((fr < npr) if hp else jnp.zeros((), jnp.bool_))
            e = jnp.where(bad, jnp.zeros((), es.dtype), ref[dd, 0])
            oo = jnp.where(bad, jnp.zeros((), es.dtype), ref[dd, 1])
            # W block j'-1: one sublane roll down, zero at each line's
            # first block (W same-padding); f32 round-trips bf16 exactly
            ro = pltpu.roll(oo.astype(jnp.float32), 1, 0)
            ro = jnp.where(fr % npr == 0, 0.0, ro).astype(es.dtype)
            slabs[hp] = (e, oo, ro)
        for dh in range(3):
            e, oo, ro = slabs[0 if dh == 1 else 1]
            off = npr if dh == 2 else 0
            sl = slice(off, off + rows_e)
            k = dd * 3 + dh

            def mm(lhs, mat):
                return jax.lax.dot_general(
                    lhs, mat, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)

            acc += mm(e[sl], wa_ref[k])
            acc += mm(oo[sl], wb_ref[k])
            acc += mm(ro[sl], wc_ref[k])

    if epilogue:
        y = acc * eps_ref[0][None] + eps_ref[1][None]
        y = jnp.where(y >= 0, y, eps_ref[2][None] * y)
    else:
        y = acc
    out_ref[...] = y.astype(out_dtype)


def _build_ds_mats(w):
    """Strided Toeplitz blocks from (3, 3, 3, Cin, Cout) reference-order
    (kh, kw, kd) weights, channels padded to 64.  Returns (A, B, C) lists
    of 9 (128, 128) blocks indexed [dd*3 + dh] (see module docstring)."""
    _, _, _, cin, cout = w.shape
    wf = jnp.zeros((3, 3, 3, 64, 64), jnp.float32)
    wf = wf.at[:, :, :, :cin, :cout].set(jnp.asarray(w, jnp.float32))
    amats, bmats, cmats = [], [], []
    for dd in range(3):
        for dh in range(3):
            a = jnp.zeros((128, 128), jnp.float32)
            a = a.at[0:64, 0:64].set(wf[dh, 1, dd])
            a = a.at[64:128, 0:64].set(wf[dh, 2, dd])
            a = a.at[64:128, 64:128].set(wf[dh, 0, dd])
            amats.append(a)
            bm = jnp.zeros((128, 128), jnp.float32)
            bm = bm.at[0:64, 64:128].set(wf[dh, 1, dd])
            bm = bm.at[64:128, 64:128].set(wf[dh, 2, dd])
            bmats.append(bm)
            c = jnp.zeros((128, 128), jnp.float32)
            c = c.at[64:128, 0:64].set(wf[dh, 0, dd])
            cmats.append(c)
    return amats, bmats, cmats


def ds_conv(x, w: jnp.ndarray,
            scale: Optional[jnp.ndarray] = None,
            shift: Optional[jnp.ndarray] = None,
            prelu_alpha: Optional[jnp.ndarray] = None, *,
            interpret: bool = False, out_padded: bool = False) -> jnp.ndarray:
    """(3,3,3) stride-(2,2,2) same-padded conv (+ optional fused affine /
    PReLU epilogue).  x: (B, D, H, W, Cin); w (3, 3, 3, Cin, Cout) in
    reference (kh, kw, kd) order; Cin, Cout <= 64.  Returns
    (B, D//2, H//2, W//2, Cout).  Requires can_ds_conv on the LOGICAL
    shape.  Channel-pad elision (nn/blocks.py pad64 stash): x may arrive
    already padded to 64 lanes (extra lanes hit zero Toeplitz weights);
    out_padded=True returns the raw 64-lane result (padded lanes are
    bias/epilogue-of-zero, exactly zero with the default zero padding)."""
    B, D, H, W = x.shape[:4]
    Cin, Cout = w.shape[3], w.shape[-1]
    assert x.shape[-1] in (Cin, 64), (x.shape, Cin)
    assert can_ds_conv((B, D, H, W, Cin), w.shape,
                       itemsize=jnp.dtype(x.dtype).itemsize), (
        x.shape, w.shape, x.dtype)
    d2, h2, npr = D // 2, H // 2, W // 4
    dtype = x.dtype

    amats, bmats, cmats = _build_ds_mats(w)
    wa = jnp.stack(amats).astype(dtype)
    wb = jnp.stack(bmats).astype(dtype)
    wc = jnp.stack(cmats).astype(dtype)

    epilogue = (scale is not None or shift is not None
                or prelu_alpha is not None)
    eps = jnp.stack([_pad_c(scale, Cout, 64, 2, 1.0),
                     _pad_c(shift, Cout, 64, 2, 0.0),
                     _pad_c(prelu_alpha, Cout, 64, 2, 1.0)])

    xp = (x if x.shape[-1] == 64
          else jnp.pad(x, ((0, 0),) * 4 + ((0, 64 - Cin),)))
    # H-parity streams; the (rows, 256) view puts each pair of W blocks
    # side by side in lanes (free reshape), so the even/odd W-block slabs
    # are 128-aligned lane slices
    rows = B * D * h2 * npr
    he = xp[:, :, 0::2].reshape(rows, 256)
    ho = jnp.pad(xp[:, :, 1::2].reshape(rows, 256),
                 ((npr, npr), (0, 0)))

    rows_e = h2 * npr
    rows_od = (h2 + 1) * npr
    grid = (B * d2,)
    kernel = pl.pallas_call(
        partial(_ds_kernel, h2=h2, npr=npr, d2=d2, d_in=D,
                epilogue=epilogue, out_dtype=dtype),
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 2 + [
            pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        out_specs=pl.BlockSpec((rows_e, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B * d2 * rows_e, 128), dtype),
        scratch_shapes=[
            pltpu.VMEM((3, 2, rows_e, 128), dtype),     # H-even slabs
            pltpu.VMEM((3, 2, rows_od, 128), dtype),    # H-odd slabs
            pltpu.SemaphoreType.DMA((2, 3, 2)),
        ],
        interpret=interpret,
    )
    out = kernel(he, ho, wa, wb, wc, eps).reshape(B, d2, h2, W // 2, 64)
    return out if out_padded else out[..., :Cout]


def _ds_vmem_est(h2: int, npr: int, itemsize: int = 2) -> int:
    # slab scratch and weight mats live in x.dtype (itemsize bytes/elem);
    # the accumulator and the live roll/select temporaries are f32.
    slabs = (3 * 2 * h2 * npr + 3 * 2 * (h2 + 1) * npr) * 128 * itemsize
    mats = 27 * 128 * 128 * itemsize
    acc = h2 * npr * 128 * 4
    temps = 3 * (h2 + 1) * npr * 128 * 4      # live f32 roll/select views
    return slabs + mats + acc + temps


def can_ds_conv(x_shape, w_shape, budget: int = 14 << 20,
                itemsize: int = 2) -> bool:
    if (len(w_shape) != 5 or tuple(w_shape[:3]) != (3, 3, 3)
            or len(x_shape) != 5):
        return False
    B, D, H, W, Cin = x_shape
    if int(Cin) > 64 or int(w_shape[4]) > 64 or int(w_shape[3]) != int(Cin):
        return False
    if D % 2 or H % 2 or W % 4 or (W // 4) % 8:
        return False
    return _ds_vmem_est(H // 2, W // 4, itemsize) <= budget


# Tests set this to exercise the fused path on CPU via interpret mode.
FORCE_INTERPRET = False


def force_interpret() -> bool:
    return FORCE_INTERPRET


def fusion_enabled() -> bool:
    """Dispatch gate for the strided downsample kernel (VS_DSCONV).
    Off under spatial sharding (the kernel zero-pads H instead of
    exchanging halos).  Default OFF: the r4 bench-path A/B
    (docs/KERNELS.md r4 gate table) measured the full window loop
    310.5 ms vs 294.4/297.7 baseline with l2block+rublock on — the
    standalone custom call between the two fused blocks does not inherit
    their shared-boundary win at volume scale.  Kept as a measured
    negative with code; VS_DSCONV=1 re-enables for re-evaluation."""
    import os

    from vs_seg_tpu.nn import layers

    if layers._SPATIAL is not None:
        return False
    if FORCE_INTERPRET:
        return True
    return (os.environ.get("VS_DSCONV", "0") == "1"
            and jax.default_backend() == "tpu")
