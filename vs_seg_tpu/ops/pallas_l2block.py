"""Pallas TPU mega-kernel: one decoder attention block, end to end.

The reference decoder at each level runs (params/networks/nets/unet2d5_spvPA.py
:174-202, attentionblock.py:6-47, convolutions.py:159-255):

    a1  = relu(conv1(concat(xa, xb)))          # C -> C/2, (3,3,3)
    att = sigmoid(conv2(a1))                   # C/2 -> 1, (3,3,3)
    g   = att * x + x   (both halves)          # AttentionBlock2 gate
    u   = prelu(bn(conv0(concat(ga, gb))))     # ResidualUnit subunit (3,3,3)
    out = u + conv1x1(concat(ga, gb))          # residual branch

On XLA this block costs ~34 ms of an 83 ms 2-window forward at L2 (r3
attribution, docs/KERNELS.md): every producer->consumer edge at (96,96,48)
relayouts 453 MB between the conv-preferred and elementwise-preferred
layouts, and the C->1 conv2 runs at 2.5 TF/s.  A single-op Pallas kernel
cannot win (the custom call is itself a layout barrier) — but ONE kernel for
the WHOLE block pays the barrier twice (inputs, output) instead of ~20x.

Design (builds on ops/pallas_conv333.py v2/v3):
- Everything lives in MXU-native (rows, 128) tiles of the flat
  (B*D*H*nb, 128) view, channels padded to cp=64 (g = 2 W-positions per
  128-lane block; this kernel requires g == 2).
- Convs are banded block matmuls: per (depth-tap, h-tap) one "main"
  within-block Toeplitz matmul + one packed "edge" matmul reading the
  +-1-sublane-rolled rows (see conv333).  conv2 (C->1) uses
  column-broadcast Toeplitz blocks so the attention value comes out
  replicated across each position's cp lanes — exactly the operand the
  gate needs, no (.., 1) tensor ever exists.
- A 4-stage software pipeline over depth planes (grid innermost dim
  s = 0..D+2), with VMEM ring buffers persisting across grid steps:
    stage A (plane s):    DMA both input slabs        -> x rings (3 deep)
    stage B (plane s-1):  conv1 + bias + relu         -> a1 main/edge rings
    stage C (plane s-2):  conv2 + sigmoid + gate      -> gated main/edge rings
    stage D (plane s-3):  unit0 conv + BN/PReLU + 1x1 residual -> out block
  Each conv consumes the three ring entries around its plane, so every
  intermediate plane is computed exactly once per H-tile (the only
  recompute is the H-halo overlap, (ht+4)/ht on conv1).
- Chained same-pad semantics: intermediate halo rows OUTSIDE the plane
  (H edges, depth edges) are forced to exact zeros after each stage's
  epilogue — matching what the unfused convs' zero padding produces —
  and W edges are handled by the roll masks.

Numerics pinned against the composed nn/blocks.py modules in
tests/test_pallas_l2block.py (interpret mode) and on real Mosaic via
tools/l2block_probe.py.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vs_seg_tpu.ops.pallas_conv333 import _build_mats

# x-slab H over-fetch (lines) each side.  Was 8 when the flat view carried a
# global row pad (DMA start alignment); with the 3-piece clamped-source DMA
# the only lower bound is the deepest negative in-slab offset — stage B of
# the l2block reads (OF-3+dh)*nb — so 4 halves the slab overfetch (the x DMA
# read (ht+2*OF)/ht of the tensor: 2x at ht=16) and shrinks every
# srows-sized VPU temp.  Alignment holds for any OF (offsets are multiples
# of nb, nb % 8 == 0).
OF = 4


def slab_3piece_copies(x_ref, dst, sem, body_src, halo, body, total):
    """Descriptors for a (halo + body + halo)-row slab DMA around flat row
    `body_src` into `dst`, as three full-destination copies with CLAMPED
    source offsets.  The clamped front/back pieces read in-bounds garbage
    exactly when the halo crosses the array ends — rows the kernels'
    H-tile/plane masks already zero (halo rows are only real when the
    adjacent tile is in the same plane).  Replaces the global OF*nb row pad
    of the flat view, which was a full extra HBM copy of every input
    (measured ~14 ms/volume at bench shapes, the jit(_pad) rows of the r5
    cost table).  All offsets are multiples of nb (nb % 8 == 0), so sublane
    alignment holds.  Returns the three copy descriptors; callers start and
    wait them (possibly in different grid steps — the descriptors are
    reconstructed identically at wait time, the standard Mosaic pattern)."""
    # every term is a multiple of nb and nb % 8 == 0; Mosaic cannot prove
    # that through the clamps, hence the multiple_of hints
    front = pltpu.make_async_copy(
        x_ref.at[pl.ds(pl.multiple_of(jnp.maximum(body_src - halo, 0), 8),
                       halo)],
        dst.at[pl.ds(0, halo)], sem)
    mid = pltpu.make_async_copy(
        x_ref.at[pl.ds(pl.multiple_of(body_src, 8), body)],
        dst.at[pl.ds(halo, body)], sem)
    back = pltpu.make_async_copy(
        x_ref.at[pl.ds(pl.multiple_of(
            jnp.minimum(body_src + body, total - halo), 8), halo)],
        dst.at[pl.ds(halo + body, halo)], sem)
    return (front, mid, back)


def dma_slab_3piece(x_ref, dst, sem, body_src, halo, body, total):
    """Synchronous 3-piece slab DMA: start all pieces, wait all."""
    copies = slab_3piece_copies(x_ref, dst, sem, body_src, halo, body, total)
    for c in copies:
        c.start()
    for c in copies:
        c.wait()


def _edge_prep(buf, nb: int, dtype):
    """f32 +-1 sublane rolls, W-boundary masks, lane-packed select (g=2):
    returns the edge-matmul operand for `buf` (the conv333 v3 hoisted
    form).  buf: (rows, 128) f32 or bf16 value."""
    rows = buf.shape[0]
    fr = jax.lax.broadcasted_iota(jnp.int32, (rows, 128), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (rows, 128), 1)
    b32 = buf.astype(jnp.float32)
    lo = pltpu.roll(b32, 1, 0)
    lo = jnp.where(fr % nb == 0, 0.0, lo)
    hi = pltpu.roll(b32, rows - 1, 0)
    hi = jnp.where(fr % nb == nb - 1, 0.0, hi)
    return jnp.where(lane < 64, hi, lo).astype(dtype)


def _mm(lhs, mat):
    return jax.lax.dot_general(lhs, mat, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _l2block_kernel(xa_ref, xb_ref, w1m_ref, w1e_ref, w2p_ref,
                    w0m_ref, w0e_ref, wr_ref, eps_ref, out_ref,
                    xr_a, xr_b, xe_a, xe_b, a1m_r, a1x_r,
                    gm_a, gx_a, gm_b, gx_b, sem,
                    *, ht, h, nb, d_per_b, out_dtype, tap2, xcache, dmapre):
    b = pl.program_id(0)
    s = pl.program_id(2)
    ti = pl.program_id(1)
    nt = h // ht
    srows = (ht + 2 * OF) * nb
    rows_a1 = (ht + 4) * nb
    rows_g = (ht + 2) * nb
    rows_o = ht * nb

    x_rings = (xr_a, xr_b)
    xe_rings = (xe_a, xe_b)
    g_rings = ((gm_a, gx_a), (gm_b, gx_b))

    rd = 4 if dmapre else 3  # x-ring depth (4 leaves the prefetch slot free)

    def _plane_copies(xi, p):
        body_src = ((b * d_per_b + p) * h + ti * ht) * nb
        total = pl.num_programs(0) * d_per_b * h * nb
        return slab_3piece_copies((xa_ref, xb_ref)[xi],
                                  x_rings[xi].at[p % rd], sem.at[xi],
                                  body_src, OF * nb, ht * nb, total)

    # ---- stage A: DMA plane s of both inputs into the x rings ----------
    # With dmapre (VS_DMAPRE), plane s+1's copies are STARTED here and
    # waited at step s+1, so each step's DMA latency hides under this
    # step's compute; only plane 0 (once per (b, ti) tile) pays the
    # synchronous wait.  Readers span planes s-2..s = slots (s-2..s) % 4,
    # never the in-flight slot (s+1) % 4.
    @pl.when(s < d_per_b)
    def _load():
        if dmapre:
            @pl.when(s == 0)
            def _first():
                for xi in range(2):
                    for c in _plane_copies(xi, 0):
                        c.start()
            for xi in range(2):
                for c in _plane_copies(xi, s):
                    c.wait()
            @pl.when(s + 1 < d_per_b)
            def _next():
                for xi in range(2):
                    for c in _plane_copies(xi, s + 1):
                        c.start()
        else:
            for xi in range(2):
                cs = _plane_copies(xi, s)
                for c in cs:
                    c.start()
                for c in cs:
                    c.wait()
        if xcache:
            # x-edge cache (VS_XCACHE): zero the H-tile halo rows in place
            # and compute each plane's edge-matmul operand ONCE on arrival,
            # instead of re-deriving it (~9 VPU passes) at every depth-tap
            # consumer — stage B touches each plane as 3 different taps.
            fr = jax.lax.broadcasted_iota(jnp.int32, (srows, 128), 0)
            halo_bad = (((ti == 0) & (fr < OF * nb))
                        | ((ti == nt - 1) & (fr >= srows - OF * nb)))
            for ring, ering in zip(x_rings, xe_rings):
                slab = jnp.where(halo_bad, jnp.zeros((), ring.dtype),
                                 ring[s % rd])
                ring[s % rd] = slab
                ering[s % rd] = _edge_prep(slab, nb, slab.dtype)

    def x_slab(xi, p):
        """Plane-p slab of input xi, with invalid rows zeroed (out-of-range
        plane; H-tile halo rows that crossed a plane boundary — the latter
        already zeroed in-ring at arrival under xcache)."""
        slab = x_rings[xi][jax.lax.rem(p + rd, rd)]
        bad = (p < 0) | (p >= d_per_b)
        if not xcache:
            fr = jax.lax.broadcasted_iota(jnp.int32, (srows, 128), 0)
            bad = (bad | ((ti == 0) & (fr < OF * nb))
                   | ((ti == nt - 1) & (fr >= srows - OF * nb)))
        return jnp.where(bad, jnp.zeros((), slab.dtype), slab)

    def x_edge(xi, p):
        """Cached edge-matmul operand of plane p (xcache only); whole-slab
        zero when the plane is out of range (roll is row-local, so masking
        after _edge_prep equals _edge_prep of the all-zero slab)."""
        e = xe_rings[xi][jax.lax.rem(p + rd, rd)]
        return jnp.where((p < 0) | (p >= d_per_b),
                         jnp.zeros((), e.dtype), e)

    # ---- stage B: a1(s-1) = relu(conv1(pair x) + b1) --------------------
    @pl.when((s >= 1) & (s - 1 < d_per_b))
    def _a1():
        q = s - 1
        acc = jnp.zeros((rows_a1, 128), jnp.float32)
        k = 0
        for xi in range(2):
            for dd in range(3):
                slab = x_slab(xi, q + dd - 1)
                xr = (x_edge(xi, q + dd - 1) if xcache
                      else _edge_prep(slab, nb, slab.dtype))
                for dh in range(3):
                    # a1 output rows start at h0-2; tap dh reads input rows
                    # h0-2+(dh-1) -> slab offset (OF-3+dh)*nb
                    sl = slice((OF - 3 + dh) * nb, (OF - 3 + dh) * nb + rows_a1)
                    acc += _mm(slab[sl], w1m_ref[k])
                    acc += _mm(xr[sl], w1e_ref[k])
                    k += 1
        a1 = jnp.maximum(acc + eps_ref[0][None], 0.0)
        # rows outside the plane must be EXACT zeros (conv2 zero-pads its
        # input in the unfused computation, not relu(bias))
        fr = jax.lax.broadcasted_iota(jnp.int32, (rows_a1, 128), 0)
        bad = (((ti == 0) & (fr < 2 * nb))
               | ((ti == nt - 1) & (fr >= rows_a1 - 2 * nb)))
        a1 = jnp.where(bad, 0.0, a1)
        if tap2:
            # tap-packed conv2 (r5): ONE (main + edge) matmul pair computes
            # every (dd, dh) tap partial of this plane into columns
            # q*64 + dd*3 + dh; the a1 value itself is never stored — the
            # P ring (f32, same bytes as the two bf16 a1 rings it replaces)
            # is all stage C needs.  18 matmuls/plane -> 3.
            a1d = a1.astype(out_dtype)
            a1m_r[q % 3] = (_mm(a1d, w2p_ref[0])
                            + _mm(_edge_prep(a1, nb, out_dtype),
                                  w2p_ref[1]))
        else:
            a1m_r[q % 3] = a1.astype(out_dtype)
            a1x_r[q % 3] = _edge_prep(a1, nb, out_dtype)

    def a1_bufs(p):
        valid = (p >= 0) & (p < d_per_b)
        zero = jnp.zeros((), out_dtype)
        i = jax.lax.rem(p + 3, 3)
        return (jnp.where(valid, a1m_r[i], zero),
                jnp.where(valid, a1x_r[i], zero))

    def p_buf(p):
        valid = (p >= 0) & (p < d_per_b)
        i = jax.lax.rem(p + 3, 3)
        return jnp.where(valid, a1m_r[i], jnp.zeros((), jnp.float32))

    # ---- stage C: att(s-2) wide + gate -> gated rings -------------------
    @pl.when((s >= 2) & (s - 2 < d_per_b))
    def _gate():
        p = s - 2
        if tap2:
            lane = jax.lax.broadcasted_iota(jnp.int32, (rows_g, 128), 1)
            tt = jnp.zeros((rows_g, 128), jnp.float32)
            for dd in range(3):
                pd = p_buf(p + dd - 1)
                for dh in range(3):
                    sl = slice(dh * nb, dh * nb + rows_g)
                    tt += jnp.where(lane % 64 == dd * 3 + dh, pd[sl], 0.0)
            acc = _mm(tt.astype(out_dtype), w2p_ref[2])
        else:
            acc = jnp.zeros((rows_g, 128), jnp.float32)
            k = 0
            for dd in range(3):
                a1m, a1x = a1_bufs(p + dd - 1)
                for dh in range(3):
                    sl = slice(dh * nb, dh * nb + rows_g)
                    acc += _mm(a1m[sl], w2p_ref[k])
                    acc += _mm(a1x[sl], w2p_ref[9 + k])
                    k += 1
        att = jax.nn.sigmoid(acc + eps_ref[1][None])  # wide: every lane of
        # a W-position block holds that position's attention value
        fr = jax.lax.broadcasted_iota(jnp.int32, (rows_g, 128), 0)
        bad = (((ti == 0) & (fr < nb))
               | ((ti == nt - 1) & (fr >= rows_g - nb)))
        for xi in range(2):
            sl = slice((OF - 1) * nb, (OF - 1) * nb + rows_g)
            x = x_slab(xi, p)[sl].astype(jnp.float32)
            g = jnp.where(bad, 0.0, att * x + x)
            gm, gx = g_rings[xi]
            gm[p % 3] = g.astype(out_dtype)
            gx[p % 3] = _edge_prep(g, nb, out_dtype)

    def g_bufs(xi, p):
        valid = (p >= 0) & (p < d_per_b)
        zero = jnp.zeros((), out_dtype)
        gm, gx = g_rings[xi]
        i = jax.lax.rem(p + 3, 3)
        return (jnp.where(valid, gm[i], zero),
                jnp.where(valid, gx[i], zero))

    # ---- stage D: out(s-3) = prelu(bn(conv0(g))) + conv1x1(g) -----------
    @pl.when(s >= 3)
    def _out():
        o = s - 3
        acc = jnp.zeros((rows_o, 128), jnp.float32)
        accr = jnp.zeros((rows_o, 128), jnp.float32)
        k = 0
        for xi in range(2):
            for dd in range(3):
                gm, gx = g_bufs(xi, o + dd - 1)
                for dh in range(3):
                    sl = slice(dh * nb, dh * nb + rows_o)
                    acc += _mm(gm[sl], w0m_ref[k])
                    acc += _mm(gx[sl], w0e_ref[k])
                    k += 1
            gm, _ = g_bufs(xi, o)
            accr += _mm(gm[nb:nb + rows_o], wr_ref[xi])
        y = acc * eps_ref[2][None] + eps_ref[3][None]
        y = jnp.where(y >= 0, y, eps_ref[4][None] * y)
        out_ref[...] = (y + accr + eps_ref[5][None]).astype(out_dtype)


def _colcast_mats(w2):
    """conv2 (C->1) Toeplitz blocks with COLUMN-BROADCAST weights: the
    matmul reduces over channels and replicates the scalar across every
    output lane of the position block (wide attention).  w2:
    (3, 3, 3, C, 1) reference (kh, kw, kd) order, C <= 64."""
    C = w2.shape[3]
    wf = jnp.zeros((3, 3, 3, 64), jnp.float32)
    wf = wf.at[:, :, :, :C].set(jnp.asarray(w2[..., 0], jnp.float32))
    mains, edges = [], []
    for dd in range(3):
        for dh in range(3):
            m = jnp.zeros((128, 128), jnp.float32)
            for p in range(2):
                for q in range(2):
                    dw = p - q + 1
                    if 0 <= dw <= 2:
                        col = wf[dh, dw, dd]
                        m = m.at[p * 64:(p + 1) * 64,
                                 q * 64:(q + 1) * 64].set(
                            jnp.broadcast_to(col[:, None], (64, 64)))
            mains.append(m)
            e = jnp.zeros((128, 128), jnp.float32)
            e = e.at[0:64, 64:128].set(
                jnp.broadcast_to(wf[dh, 2, dd][:, None], (64, 64)))
            e = e.at[64:128, 0:64].set(
                jnp.broadcast_to(wf[dh, 0, dd][:, None], (64, 64)))
            edges.append(e)
    return mains, edges


def _res_mats(wr, ca: int, cb: int, cout: int):
    """1x1x1 residual conv as per-half block-diagonal (128, 128) matrices
    (position p maps to position p).  wr: (1, 1, 1, ca+cb, cout)."""
    mats = []
    c0 = 0
    for cin in (ca, cb):
        blk = jnp.zeros((64, 64), jnp.float32)
        blk = blk.at[:cin, :cout].set(
            jnp.asarray(wr[0, 0, 0, c0:c0 + cin], jnp.float32))
        m = jnp.zeros((128, 128), jnp.float32)
        m = m.at[0:64, 0:64].set(blk)
        m = m.at[64:128, 64:128].set(blk)
        mats.append(m)
        c0 += cin
    return mats


def _pad_vec(v, cout, default):
    if v is None:
        return jnp.full((128,), default, jnp.float32)
    v = jnp.asarray(v, jnp.float32).reshape(-1)
    if v.shape[0] == 1 and cout > 1:
        v = jnp.broadcast_to(v, (cout,))
    return jnp.tile(jnp.pad(v, (0, 64 - v.shape[0])), 2)


def l2_block(xa, xb, *, w1, b1, w2, b2, w0, bn_scale, bn_shift, alpha, wr,
             br, interpret: bool = False, out_padded: bool = False):
    """Fused decoder attention block (eval).  xa, xb: (B, D, H, W, C)
    bf16 pair halves (C <= 64, equal); w1 (3,3,3,2C,C), w2 (3,3,3,C,1),
    w0 (3,3,3,2C,C), wr (1,1,1,2C,C); bn_scale/bn_shift are the folded
    eval BatchNorm affine ALREADY including unit0's conv bias (i.e.
    y = conv0(g)*bn_scale + bn_shift); alpha the PReLU slope; br the
    residual bias.  Returns (B, D, H, W, C).

    Channel-pad elision (nn/blocks.py pad64 stash): either half may arrive
    already padded to 64 lanes (a fused producer's pre-slice output — the
    extra lanes hit zero Toeplitz weight columns, so their content never
    matters); out_padded=True returns the raw 64-lane result (padded lanes
    exactly zero) for an adjacent consumer."""
    B, D, H, W = xa.shape[:4]
    C = w2.shape[3]
    assert xa.shape[:4] == xb.shape[:4] and C <= 64
    assert xa.shape[-1] in (C, 64) and xb.shape[-1] in (C, 64), (
        xa.shape, xb.shape, C)
    nb = (W * 64) // 128
    assert (W * 64) % 128 == 0 and nb % 8 == 0 and H % 8 == 0
    ht = pick_ht_l2(H, nb)
    assert ht, f"no row tile fits H={H} W={W}"
    dtype = xa.dtype

    def mats_for(w, cins):
        ms, es = [], []
        c0 = 0
        for cin in cins:
            a, b_ = _build_mats(w[:, :, :, c0:c0 + cin, :], 64, 64)
            ms += a
            es += b_
            c0 += cin
        return (jnp.stack(ms).astype(dtype), jnp.stack(es).astype(dtype))

    w1m, w1e = mats_for(w1, (C, C))
    w0m, w0e = mats_for(w0, (C, C))
    tap2 = tap2_enabled()
    if tap2:
        from vs_seg_tpu.ops.blockmats import (
            build_conv2_tap_mats, build_tap_bcast_mat,
        )
        m2, e2 = build_conv2_tap_mats(w2, C, 64)
        w2p = jnp.stack([m2, e2, build_tap_bcast_mat(64, 9)]).astype(dtype)
    else:
        m2, e2 = _colcast_mats(w2)
        w2p = jnp.stack(m2 + e2).astype(dtype)
    wrm = jnp.stack(_res_mats(wr, C, C, C)).astype(dtype)

    eps = jnp.stack([
        _pad_vec(b1, C, 0.0),                      # conv1 bias
        jnp.full((128,), jnp.asarray(b2, jnp.float32).reshape(()),
                 jnp.float32),                     # conv2 bias (scalar)
        _pad_vec(bn_scale, C, 1.0),                # unit0 BN scale
        _pad_vec(bn_shift, C, 0.0),                # unit0 BN shift (+bias)
        _pad_vec(alpha, C, 1.0),                   # PReLU slope
        _pad_vec(br, C, 0.0),                      # residual bias
    ])

    rows = B * D * H
    xvs = []
    for v in (xa, xb):
        vp = (v if v.shape[-1] == 64
              else jnp.pad(v, ((0, 0),) * 4 + ((0, 64 - C),)))
        # no row pad: the kernel's 3-piece clamped-source DMA covers the
        # OF*nb halo (dma_slab_3piece) — the pad was a full HBM copy
        xvs.append(vp.reshape(rows * nb, 128))

    srows = (ht + 2 * OF) * nb
    rows_a1 = (ht + 4) * nb
    rows_g = (ht + 2) * nb
    nt = H // ht

    grid = (B, nt, D + 3)
    xcache = xcache_enabled()
    dmapre = dmapre_enabled()
    rd = 4 if dmapre else 3
    if tap2:
        a1_rings = [pltpu.VMEM((3, rows_a1, 128), jnp.float32),  # P ring
                    pltpu.VMEM((1, 8, 128), dtype)]              # unused
    else:
        a1_rings = [pltpu.VMEM((3, rows_a1, 128), dtype),   # a1 main ring
                    pltpu.VMEM((3, rows_a1, 128), dtype)]   # a1 edge ring
    xe_shape = (rd, srows, 128) if xcache else (1, 8, 128)
    kernel = pl.pallas_call(
        partial(_l2block_kernel, ht=ht, h=H, nb=nb, d_per_b=D,
                out_dtype=dtype, tap2=tap2, xcache=xcache, dmapre=dmapre),
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 2 + [
            pl.BlockSpec(memory_space=pltpu.VMEM)] * 7,
        out_specs=pl.BlockSpec(
            (ht * nb, 128),
            lambda b, ti, s: ((b * D + jnp.clip(s - 3, 0, D - 1)) * nt + ti,
                              0),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows * nb, 128), dtype),
        scratch_shapes=[
            pltpu.VMEM((rd, srows, 128), dtype),     # xr_a
            pltpu.VMEM((rd, srows, 128), dtype),     # xr_b
            pltpu.VMEM(xe_shape, dtype),             # xe_a (edge cache)
            pltpu.VMEM(xe_shape, dtype),             # xe_b (edge cache)
        ] + a1_rings + [
            pltpu.VMEM((3, rows_g, 128), dtype),     # gated a main
            pltpu.VMEM((3, rows_g, 128), dtype),     # gated a edge
            pltpu.VMEM((3, rows_g, 128), dtype),     # gated b main
            pltpu.VMEM((3, rows_g, 128), dtype),     # gated b edge
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )
    out = kernel(*xvs, w1m, w1e, w2p, w0m, w0e, wrm, eps
                 ).reshape(B, D, H, W, 64)
    return out if out_padded else out[..., :C]


def xcache_enabled() -> bool:
    """x-edge cache: compute each input plane's edge-matmul operand once on
    DMA arrival (stage A) instead of re-deriving it at every depth-tap
    consumer, and zero the H-tile halo rows in-ring.  Costs one extra
    (3, srows, 128) ring per input (counted in the VMEM estimates)."""
    import os
    return FORCE_XCACHE or os.environ.get("VS_XCACHE", "0") == "1"


def dmapre_enabled() -> bool:
    """One-step DMA prefetch: plane s+1's slab copies start during step s's
    compute and are waited at step s+1, hiding the per-grid-step DMA
    latency the synchronous 3-piece wait exposes (stage A is the critical
    path: the r5 xcache negative measured +8 ms from adding VPU work
    there).  Costs one extra x-ring slot per input (depth 4)."""
    import os
    return FORCE_DMAPRE or os.environ.get("VS_DMAPRE", "0") == "1"


def _l2_vmem_est(ht: int, nb: int) -> int:
    srows = (ht + 2 * OF) * nb
    rd = 4 if dmapre_enabled() else 3
    bufs = (2 * rd * srows + 2 * 3 * (ht + 4) * nb + 4 * 3 * (ht + 2) * nb)
    if xcache_enabled():
        bufs += 2 * rd * srows                       # xe_a/xe_b edge caches
    mats = (36 + 36 + 18 + 2) * 128 * 128
    accs = 2 * ht * nb * 128 * 4 + ht * nb * 128 * 2
    temps = 4 * srows * 128 * 4                      # roll/select f32 views
    return bufs * 128 * 2 + mats * 2 + accs + temps


def pick_ht_l2(H: int, nb: int, budget: Optional[int] = None) -> int:
    # 14 MB default (hard Mosaic limit 16): at the flagship L2 site this
    # picks ht=16 over ht=8 — measured 68.4 -> 65.4 ms composed 2-window
    # forward (less H-halo recompute + half the x-slab DMA overfetch).
    if budget is None:
        import os
        budget = int(os.environ.get("VS_L2_BUDGET_MB", "14")) << 20
    for ht in (32, 24, 16, 8):
        if H % ht == 0 and _l2_vmem_est(ht, nb) <= budget:
            return ht
    return 0


def can_l2_block(shape, C: int) -> bool:
    B, D, H, W = shape[:4]
    nb = (W * 64) // 128
    return (C <= 64 and (W * 64) % 128 == 0 and nb % 8 == 0
            and H % 8 == 0 and pick_ht_l2(H, nb) > 0 and D >= 1)


# Tests set this to exercise the fused path on CPU via interpret mode.
FORCE_INTERPRET = False
# Tests set this to force the tap-packed conv2 variant regardless of env.
FORCE_TAP2 = False
# Tests set this to force the x-edge cache variant regardless of env.
FORCE_XCACHE = False
# Tests set this to force the DMA-prefetch variant regardless of env.
FORCE_DMAPRE = False


def tap2_enabled() -> bool:
    """Tap-packed conv2 inside the l2block (r5): replaces the 18 colcast
    matmuls per plane with one (main + edge) pair at stage B plus one
    ones-broadcast matmul at stage C (~16 % of the kernel's delivered
    FLOPs), at the cost of 9 masked-select passes assembling the tap
    columns.  Default ON: bench-loop A/B (same relay hour) 287.0/287.2 ->
    282.8 ms; the OF4-only leg pinned the credit to this change
    (docs/KERNELS.md r5 gate table).  VS_L2TAP=0 restores colcast."""
    import os

    if FORCE_TAP2:
        return True
    return os.environ.get("VS_L2TAP", "1") == "1"


def fusion_enabled() -> bool:
    import os

    if FORCE_INTERPRET:
        return True
    # Default ON: the only mega-kernel that wins the composed-forward A/B
    # (tools/gate_ab.sh, two paired runs: 80.1/80.0 -> 77.7/78.3 ms per
    # 2-window batch on v5e).  VS_L2BLOCK=0 restores the XLA path.
    # Allowed under spatial sharding since r4: the dispatcher extends the
    # local H block with exchanged halo rows and slices the exact center
    # (ops/halo.py:spatial_fused_halo) — the kernel itself is unchanged.
    return (os.environ.get("VS_L2BLOCK", "1") == "1"
            and jax.default_backend() == "tpu")
