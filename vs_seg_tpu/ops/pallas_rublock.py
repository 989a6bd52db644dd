"""Pallas TPU mega-kernel: one encoder ResidualUnit (2 subunits), end to end.

The reference encoder at each level runs (params/networks/nets/unet2d5_spvPA.py
:113-136, convolutions.py:159-255), at eval with BatchNorm folded:

    u0  = prelu(conv0(x) * bn0_s + bn0_h)      # Cin -> Cout, (3,3,3)
    u1  = prelu(conv1(u0) * bn1_s + bn1_h)     # Cout -> Cout, (3,3,3)
    out = u1 + conv1x1(x) + br                 # residual branch (Cin != Cout)

Same thesis as ops/pallas_l2block.py: a single-op Pallas call is a layout
barrier and loses, but ONE kernel for the whole two-conv block pays the
barrier twice (input, output) instead of at every producer->consumer edge
of the C-minor/W-minor layout ping-pong.  Applies to the flagship encoder
L2 (32->48ch at 96x96) and L3 (48->64ch at 48x48) down blocks.

Design (shares the conv333 v2/v3 machinery):
- MXU-native (rows, 128) tiles of the flat (B*D*H*nb, 128) view, channels
  padded to 64 (g = 2 W-positions per 128-lane block; required).
- Convs are banded block matmuls: per (depth-tap, h-tap) one within-block
  Toeplitz matmul + one packed edge matmul on the +-1-sublane-rolled rows.
- 3-stage software pipeline over depth planes (grid innermost s = 0..D+1)
  with VMEM ring buffers persisting across grid steps:
    stage A (plane s):    DMA the input slab           -> x ring (3 deep)
    stage B (plane s-1):  conv0 + BN/PReLU             -> u0 main/edge rings
    stage C (plane s-2):  conv1 + BN/PReLU + 1x1 residual -> out block
- Chained same-pad semantics: u0 halo rows outside the plane are forced to
  exact zeros after stage B (what the unfused conv1's zero padding sees).

Numerics pinned against the composed nn/blocks.py ResidualUnit in
tests/test_model.py (interpret mode) and on real Mosaic via
tools/l2block_probe.py (rublock mode).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vs_seg_tpu.ops.pallas_conv333 import _build_mats
from vs_seg_tpu.ops.pallas_l2block import (
    OF, _edge_prep, _mm, _pad_vec, slab_3piece_copies,
)


def _rublock_kernel(x_ref, w0m_ref, w0e_ref, w1m_ref, w1e_ref, wr_ref,
                    eps_ref, out_ref, xr, xer, u0m_r, u0x_r, sem,
                    *, ht, h, nb, d_per_b, out_dtype, xcache, dmapre):
    b = pl.program_id(0)
    ti = pl.program_id(1)
    s = pl.program_id(2)
    nt = h // ht
    srows = (ht + 2 * OF) * nb
    rows_u0 = (ht + 2) * nb
    rows_o = ht * nb

    rd = 4 if dmapre else 3  # x-ring depth (4 leaves the prefetch slot free)

    def _plane_copies(p):
        body_src = ((b * d_per_b + p) * h + ti * ht) * nb
        total = pl.num_programs(0) * d_per_b * h * nb
        return slab_3piece_copies(x_ref, xr.at[p % rd], sem, body_src,
                                  OF * nb, ht * nb, total)

    # ---- stage A: DMA plane s of the input into the x ring --------------
    # dmapre: plane s+1's copies start here, waited at step s+1 (see
    # pallas_l2block stage A) — readers span planes s-2..s, never the
    # in-flight slot (s+1) % 4.
    @pl.when(s < d_per_b)
    def _load():
        if dmapre:
            @pl.when(s == 0)
            def _first():
                for c in _plane_copies(0):
                    c.start()
            for c in _plane_copies(s):
                c.wait()
            @pl.when(s + 1 < d_per_b)
            def _next():
                for c in _plane_copies(s + 1):
                    c.start()
        else:
            cs = _plane_copies(s)
            for c in cs:
                c.start()
            for c in cs:
                c.wait()
        if xcache:
            # x-edge cache (VS_XCACHE, see pallas_l2block.xcache_enabled):
            # halo rows zeroed in-ring, edge operand computed once per plane.
            fr = jax.lax.broadcasted_iota(jnp.int32, (srows, 128), 0)
            halo_bad = (((ti == 0) & (fr < OF * nb))
                        | ((ti == nt - 1) & (fr >= srows - OF * nb)))
            slab = jnp.where(halo_bad, jnp.zeros((), xr.dtype), xr[s % rd])
            xr[s % rd] = slab
            xer[s % rd] = _edge_prep(slab, nb, slab.dtype)

    def x_slab(p):
        """Plane-p slab with invalid rows zeroed (out-of-range plane;
        H-tile halo rows that crossed a plane boundary — the latter already
        zeroed in-ring at arrival under xcache)."""
        slab = xr[jax.lax.rem(p + rd, rd)]
        bad = (p < 0) | (p >= d_per_b)
        if not xcache:
            fr = jax.lax.broadcasted_iota(jnp.int32, (srows, 128), 0)
            bad = (bad | ((ti == 0) & (fr < OF * nb))
                   | ((ti == nt - 1) & (fr >= srows - OF * nb)))
        return jnp.where(bad, jnp.zeros((), slab.dtype), slab)

    def x_edge(p):
        e = xer[jax.lax.rem(p + rd, rd)]
        return jnp.where((p < 0) | (p >= d_per_b),
                         jnp.zeros((), e.dtype), e)

    # ---- stage B: u0(s-1) = prelu(conv0(x)*bn0_s + bn0_h) ---------------
    @pl.when((s >= 1) & (s - 1 < d_per_b))
    def _u0():
        q = s - 1
        acc = jnp.zeros((rows_u0, 128), jnp.float32)
        k = 0
        for dd in range(3):
            slab = x_slab(q + dd - 1)
            xe = (x_edge(q + dd - 1) if xcache
                  else _edge_prep(slab, nb, slab.dtype))
            for dh in range(3):
                # u0 rows start at h0-1; tap dh reads input rows
                # h0-1+(dh-1) -> slab offset (OF-2+dh)*nb
                sl = slice((OF - 2 + dh) * nb, (OF - 2 + dh) * nb + rows_u0)
                acc += _mm(slab[sl], w0m_ref[k])
                acc += _mm(xe[sl], w0e_ref[k])
                k += 1
        y = acc * eps_ref[0][None] + eps_ref[1][None]
        u0 = jnp.where(y >= 0, y, eps_ref[2][None] * y)
        # rows outside the plane must be EXACT zeros (conv1 zero-pads its
        # input in the unfused computation, not prelu(bn_shift))
        fr = jax.lax.broadcasted_iota(jnp.int32, (rows_u0, 128), 0)
        bad = (((ti == 0) & (fr < nb))
               | ((ti == nt - 1) & (fr >= rows_u0 - nb)))
        u0 = jnp.where(bad, 0.0, u0)
        u0m_r[q % 3] = u0.astype(out_dtype)
        u0x_r[q % 3] = _edge_prep(u0, nb, out_dtype)

    def u0_bufs(p):
        valid = (p >= 0) & (p < d_per_b)
        zero = jnp.zeros((), out_dtype)
        i = jax.lax.rem(p + 3, 3)
        return (jnp.where(valid, u0m_r[i], zero),
                jnp.where(valid, u0x_r[i], zero))

    # ---- stage C: out(s-2) = prelu(conv1(u0)*bn1_s+bn1_h) + x*wr + br ---
    @pl.when(s >= 2)
    def _out():
        o = s - 2
        acc = jnp.zeros((rows_o, 128), jnp.float32)
        k = 0
        for dd in range(3):
            u0m, u0x = u0_bufs(o + dd - 1)
            for dh in range(3):
                sl = slice(dh * nb, dh * nb + rows_o)
                acc += _mm(u0m[sl], w1m_ref[k])
                acc += _mm(u0x[sl], w1e_ref[k])
                k += 1
        y = acc * eps_ref[3][None] + eps_ref[4][None]
        y = jnp.where(y >= 0, y, eps_ref[5][None] * y)
        res = _mm(x_slab(o)[OF * nb:OF * nb + rows_o], wr_ref[0])
        out_ref[...] = (y + res + eps_ref[6][None]).astype(out_dtype)


def _res_mat_single(wr, cin: int, cout: int):
    """1x1x1 residual conv as a position-preserving block-diagonal
    (128, 128) matrix.  wr: (1, 1, 1, cin, cout)."""
    blk = jnp.zeros((64, 64), jnp.float32)
    blk = blk.at[:cin, :cout].set(jnp.asarray(wr[0, 0, 0], jnp.float32))
    m = jnp.zeros((128, 128), jnp.float32)
    m = m.at[0:64, 0:64].set(blk)
    m = m.at[64:128, 64:128].set(blk)
    return m


def ru_block(x, *, w0, bn0_scale, bn0_shift, alpha0, w1, bn1_scale,
             bn1_shift, alpha1, wr, br, interpret: bool = False,
             out_padded: bool = False):
    """Fused 2-subunit ResidualUnit (eval).  x: (B, D, H, W, Cin) bf16
    (Cin, Cout <= 64); w0 (3,3,3,Cin,Cout), w1 (3,3,3,Cout,Cout), wr
    (1,1,1,Cin,Cout); bn*_scale/bn*_shift are the folded eval BatchNorm
    affines ALREADY including each conv's bias; alpha* the PReLU slopes;
    br the residual bias.  Returns (B, D, H, W, Cout).

    Channel-pad elision (nn/blocks.py pad64 stash): x may arrive already
    padded to 64 lanes (zeros beyond Cin — a fused producer's pre-slice
    output); out_padded=True returns the raw 64-lane result (padded lanes
    exactly zero: the Toeplitz weights, BN shift, and residual bias are all
    zero there) for an adjacent consumer to ingest without re-padding."""
    B, D, H, W = x.shape[:4]
    Cin, Cout = w0.shape[3], w0.shape[-1]
    assert x.shape[-1] in (Cin, 64), (x.shape, Cin)
    assert Cin <= 64 and Cout <= 64
    nb = (W * 64) // 128
    assert (W * 64) % 128 == 0 and nb % 8 == 0 and H % 8 == 0
    ht = pick_ht_ru(H, nb)
    assert ht, f"no row tile fits H={H} W={W}"
    dtype = x.dtype

    def mats(w):
        a, b_ = _build_mats(w, 64, 64)
        return (jnp.stack(a).astype(dtype), jnp.stack(b_).astype(dtype))

    w0m, w0e = mats(w0)
    w1m, w1e = mats(w1)
    wrm = _res_mat_single(wr, Cin, Cout).astype(dtype)[None]

    eps = jnp.stack([
        _pad_vec(bn0_scale, Cout, 1.0),            # unit0 BN scale
        _pad_vec(bn0_shift, Cout, 0.0),            # unit0 BN shift (+bias)
        _pad_vec(alpha0, Cout, 1.0),               # unit0 PReLU slope
        _pad_vec(bn1_scale, Cout, 1.0),            # unit1 BN scale
        _pad_vec(bn1_shift, Cout, 0.0),            # unit1 BN shift (+bias)
        _pad_vec(alpha1, Cout, 1.0),               # unit1 PReLU slope
        _pad_vec(br, Cout, 0.0),                   # residual bias
    ])

    rows = B * D * H
    xp = (x if x.shape[-1] == 64
          else jnp.pad(x, ((0, 0),) * 4 + ((0, 64 - Cin),)))
    # no row pad: 3-piece clamped-source DMA covers the OF*nb halo
    xv = xp.reshape(rows * nb, 128)

    srows = (ht + 2 * OF) * nb
    rows_u0 = (ht + 2) * nb
    nt = H // ht

    grid = (B, nt, D + 2)
    from vs_seg_tpu.ops.pallas_l2block import dmapre_enabled, xcache_enabled
    xcache = xcache_enabled()
    dmapre = dmapre_enabled()
    rd = 4 if dmapre else 3
    kernel = pl.pallas_call(
        partial(_rublock_kernel, ht=ht, h=H, nb=nb, d_per_b=D,
                out_dtype=dtype, xcache=xcache, dmapre=dmapre),
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] + [
            pl.BlockSpec(memory_space=pltpu.VMEM)] * 6,
        out_specs=pl.BlockSpec(
            (ht * nb, 128),
            lambda b, ti, s: ((b * D + jnp.clip(s - 2, 0, D - 1)) * nt + ti,
                              0),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows * nb, 128), dtype),
        scratch_shapes=[
            pltpu.VMEM((rd, srows, 128), dtype),     # x ring
            pltpu.VMEM((rd, srows, 128) if xcache else (1, 8, 128),
                       dtype),                       # x edge cache
            pltpu.VMEM((3, rows_u0, 128), dtype),    # u0 main ring
            pltpu.VMEM((3, rows_u0, 128), dtype),    # u0 edge ring
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )
    out = kernel(xv, w0m, w0e, w1m, w1e, wrm, eps).reshape(B, D, H, W, 64)
    return out if out_padded else out[..., :Cout]


def _ru_vmem_est(ht: int, nb: int) -> int:
    from vs_seg_tpu.ops.pallas_l2block import dmapre_enabled, xcache_enabled
    srows = (ht + 2 * OF) * nb
    rd = 4 if dmapre_enabled() else 3
    bufs = rd * srows + 2 * 3 * (ht + 2) * nb
    if xcache_enabled():
        bufs += rd * srows                           # x edge cache ring
    mats = (36 + 1) * 128 * 128
    accs = ht * nb * 128 * 4 * 2 + (ht + 2) * nb * 128 * 4
    temps = 4 * srows * 128 * 4                      # roll/select f32 views
    return bufs * 128 * 2 + mats * 2 + accs + temps


def pick_ht_ru(H: int, nb: int, budget=None) -> int:
    # 14 MB default to match pick_ht_l2 (measured neutral for rublock —
    # 65.2 vs 65.4 ms composed — but keeps one budget story; 16 is the
    # hard Mosaic scoped-VMEM limit).
    if budget is None:
        import os
        budget = int(os.environ.get("VS_RU_BUDGET_MB", "14")) << 20
    for ht in (32, 24, 16, 8):
        if H % ht == 0 and _ru_vmem_est(ht, nb) <= budget:
            return ht
    return 0


def can_ru_block(shape, cin: int, cout: int) -> bool:
    B, D, H, W = shape[:4]
    nb = (W * 64) // 128
    return (cin <= 64 and cout <= 64 and (W * 64) % 128 == 0 and nb % 8 == 0
            and H % 8 == 0 and pick_ht_ru(H, nb) > 0 and D >= 1)


# Tests set this to exercise the fused path on CPU via interpret mode.
FORCE_INTERPRET = False


def fusion_enabled() -> bool:
    import os

    if FORCE_INTERPRET:
        return True
    # Default ON: rublock alone loses the composed A/B (84.2 vs 80.1 ms)
    # but COMBINED with the default-on l2block it wins big — 68.4/68.5 ms
    # vs 80.0/80.1 baseline across paired runs (adjacent fused blocks share
    # the custom-call layout-barrier cost).  VS_RUBLOCK=0 restores XLA.
    # Allowed under spatial sharding since r4: the dispatcher extends the
    # local H block with exchanged halo rows and slices the exact center
    # (ops/halo.py:spatial_fused_halo) — the kernel itself is unchanged.
    return (os.environ.get("VS_RUBLOCK", "1") == "1"
            and jax.default_backend() == "tpu")
