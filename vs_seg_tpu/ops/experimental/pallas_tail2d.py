"""Pallas TPU kernel: the kd=1 decoder TAIL — conv2 (C->1) + sigmoid +
gate + unit0 conv + 1x1 residual + add, in one pass.  The att conv1 stays
on XLA.

Why this shape (r5 cost table, docs/KERNELS.md): at the bench shapes the
L0/L1 decoder blocks cost ~98 ms/volume on XLA, but the MAIN convs are NOT
the problem — upatt_0/conv1 runs at 87 TF/s (EmitInputBatchInLanes with
batch*depth = 512 lanes full).  The cost is every small-N op: conv2 (N=1,
1.8-1.9 TF/s), the cout=2 logit head (6 TF/s), and the 1x1 residuals
(0.8-6 TF/s) — ~67 ms/volume.  A full banded-Toeplitz block rewrite cannot
win here (MXU efficiency (3/2)*cin*cout/(128*cp) = 18.75 % at cp=16, a
~73 ms delivered-FLOPs floor for the up_0 block alone), and the r3 fused
attention tail (ops/pallas_att.py) lost by writing the gated pair back to
HBM for XLA's unit0/residual.  This kernel keeps the cheap-to-deliver ops
and ONLY them, with matmuls shaped so small N is free:

- conv2 is TAP-PACKED: one (main + edge) banded matmul pair computes all
  three dh tap partials into three output columns of each position block
  (columns q*cp + dh), then ~7 VPU roll/select passes combine them across
  rows and ONE block-diagonal ones matmul sums the taps and broadcasts the
  attention scalar over the block's cp lanes (the gate operand — no
  (..., 1) tensor ever exists).  3 matmuls instead of colcast's 6.
- the gate is two VPU FMAs per half.
- unit0 + residual are TAP-PACKED too when 4*Cout <= cp (the up_0 logit
  head, Cout=2): per input half one (main + edge) matmul pair computes the
  three dh tap partials at columns q*cp + dh*Cout + c and the 1x1 residual
  at columns q*cp + 3*Cout + c; lane/row rolls combine.  4 matmuls total
  for conv0 AND the residual.  When Cout is too wide (up_1, Cout=32=cp)
  they fall back to the standard banded form (ops/blockmats.py): 12 + 2
  matmuls — still ~2x fewer delivered FLOPs than XLA burns there.
- slab DMA is double-buffered across grid steps (tile i+1 prefetched while
  tile i computes) with clamped-source 3-piece copies (no global row pad),
  fixing the serialized-DMA failure mode of the r3 pallas_att attempt.

Reference semantics reproduced: attentionblock.py:6-47 (conv2 + sigmoid,
AttentionBlock2 gate), convolutions.py:159-255 (ResidualUnit subunit with
eval-folded BatchNorm or the conv-only logit head, 1x1x1 residual branch),
as composed by unet2d5_spvPA.py:174-202 at the (3,3,1) levels.

Numerics pinned in tests/test_pallas_tail2d.py (kernel vs composed jnp
oracle + model level, interpret mode).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vs_seg_tpu.ops.blockmats import build_mats_g, build_res_mats_g
from vs_seg_tpu.ops.experimental.pallas_block2d import _pad_vec_g
from vs_seg_tpu.ops.pallas_l2block import _edge_prep, _mm

HAL = 2  # slab halo lines each side (conv2 then unit0: 2 convs deep in H)


def _conv2_packed_mats(w2, ca: int, cp: int):
    """conv2 (C->1) tap-packed Toeplitz blocks: output column q*cp + dh
    holds the dh-tap W-contraction partial for position q.  w2:
    (3, 3, 1, Ca, 1)."""
    g = 128 // cp
    wf = jnp.zeros((3, 3, cp), jnp.float32)
    wf = wf.at[:, :, :ca].set(jnp.asarray(w2[:, :, 0, :, 0], jnp.float32))
    m = jnp.zeros((128, 128), jnp.float32)
    e = jnp.zeros((128, 128), jnp.float32)
    for dh in range(3):
        for q in range(g):
            for dw in range(3):
                p = q + dw - 1
                if 0 <= p < g:
                    m = m.at[p * cp:(p + 1) * cp, q * cp + dh].set(wf[dh, dw])
        e = e.at[0:cp, (g - 1) * cp + dh].set(wf[dh, 2])
        e = e.at[(g - 1) * cp:, 0 * cp + dh].set(wf[dh, 0])
    return m, e


def _bcast_mat(cp: int):
    """Block-diagonal ones: sums the 3 tap columns of each position block
    and broadcasts the result across the block's cp lanes."""
    g = 128 // cp
    b = jnp.zeros((128, 128), jnp.float32)
    for q in range(g):
        b = b.at[q * cp:q * cp + 3, q * cp:(q + 1) * cp].set(1.0)
    return b


def _u_packed_mats(w0h, wrh, ch: int, cout: int, cp: int):
    """unit0-half + residual-half tap-packed blocks: columns
    q*cp + dh*cout + c hold conv0's dh-tap partial for output channel c;
    columns q*cp + 3*cout + c hold the 1x1 residual (center tap only, so
    block-diagonal, no edge part).  w0h (3,3,1,ch,cout), wrh (ch,cout)."""
    g = 128 // cp
    w = jnp.zeros((3, 3, cp, cout), jnp.float32)
    w = w.at[:, :, :ch].set(jnp.asarray(w0h[:, :, 0], jnp.float32))
    wr = jnp.zeros((cp, cout), jnp.float32)
    wr = wr.at[:ch].set(jnp.asarray(wrh, jnp.float32))
    m = jnp.zeros((128, 128), jnp.float32)
    e = jnp.zeros((128, 128), jnp.float32)
    for dh in range(3):
        c0 = dh * cout
        for q in range(g):
            for dw in range(3):
                p = q + dw - 1
                if 0 <= p < g:
                    m = m.at[p * cp:(p + 1) * cp,
                             q * cp + c0:q * cp + c0 + cout].set(w[dh, dw])
        e = e.at[0:cp, (g - 1) * cp + c0:(g - 1) * cp + c0 + cout].set(
            w[dh, 2])
        e = e.at[(g - 1) * cp:, c0:c0 + cout].set(w[dh, 0])
    for q in range(g):
        m = m.at[q * cp:(q + 1) * cp,
                 q * cp + 3 * cout:q * cp + 4 * cout].set(wr)
    return m, e


def _slab_copies(x_ref, dst, sem, j, body, halo, total):
    """3-piece clamped-source slab copy objects for tile j (tiles are
    globally contiguous: body rows [j*body, (j+1)*body); the halo crossing
    a plane boundary is zeroed by the caller's t==0 / t==nt-1 masks)."""
    src = j * body
    return (
        pltpu.make_async_copy(
            x_ref.at[pl.ds(pl.multiple_of(jnp.maximum(src - halo, 0), 8),
                           halo)],
            dst.at[pl.ds(0, halo)], sem),
        pltpu.make_async_copy(
            x_ref.at[pl.ds(pl.multiple_of(src, 8), body)],
            dst.at[pl.ds(halo, body)], sem),
        pltpu.make_async_copy(
            x_ref.at[pl.ds(pl.multiple_of(
                jnp.minimum(src + body, total - halo), 8), halo)],
            dst.at[pl.ds(halo + body, halo)], sem),
    )


def _tail2d_kernel(a1_ref, xa_ref, xb_ref, mats_ref, eps_ref, out_ref,
                   s_a1, s_xa, s_xb, sem, *, ht, h, nb, cp, cout, packed,
                   out_dtype):
    i = pl.program_id(0)
    n = pl.num_programs(0)
    nt = h // ht
    t = jax.lax.rem(i, nt)
    srows = (ht + 2 * HAL) * nb
    grows = (ht + 2) * nb
    orows = ht * nb
    body = ht * nb
    halo = HAL * nb
    total = n * body
    refs = (a1_ref, xa_ref, xb_ref)
    slabs = (s_a1, s_xa, s_xb)

    def start(j, slot):
        for xi in range(3):
            for c in _slab_copies(refs[xi], slabs[xi].at[slot],
                                  sem.at[slot, xi], j, body, halo, total):
                c.start()

    def wait(j, slot):
        for xi in range(3):
            for c in _slab_copies(refs[xi], slabs[xi].at[slot],
                                  sem.at[slot, xi], j, body, halo, total):
                c.wait()

    @pl.when(i == 0)
    def _first():
        start(0, 0)

    @pl.when(i + 1 < n)
    def _prefetch():
        start(i + 1, (i + 1) % 2)

    wait(i, i % 2)
    slot = i % 2

    fr = jax.lax.broadcasted_iota(jnp.int32, (srows, 128), 0)
    bad = (((t == 0) & (fr < halo))
           | ((t == nt - 1) & (fr >= srows - halo)))

    def slab(xi):
        v = slabs[xi][slot]
        return jnp.where(bad, jnp.zeros((), v.dtype), v)

    lane = jax.lax.broadcasted_iota(jnp.int32, (grows, 128), 1)

    # ---- conv2 tap-packed: P cols q*cp+dh; combine; bcast; sigmoid ------
    a1s = slab(0)
    p = _mm(a1s, mats_ref[0]) + _mm(_edge_prep(a1s, nb, a1s.dtype),
                                    mats_ref[1])
    # T[r, col dh] = P[r + (dh-1)*nb, col dh]; rows sliced to the gate range
    lane_s = jax.lax.broadcasted_iota(jnp.int32, (srows, 128), 1)
    tt = jnp.where(lane_s % cp == 0, pltpu.roll(p, nb, 0), 0.0)
    tt = tt + jnp.where(lane_s % cp == 1, p, 0.0)
    tt = tt + jnp.where(lane_s % cp == 2, pltpu.roll(p, srows - nb, 0), 0.0)
    att = _mm(tt[nb:nb + grows].astype(out_dtype), mats_ref[2])
    att = jax.nn.sigmoid(att + eps_ref[4][None])

    # ---- gate + unit0 + residual ----------------------------------------
    gs, ges = [], []
    for xi in (1, 2):
        xv = slab(xi)[nb:nb + grows].astype(jnp.float32)
        gv = (att * xv + xv).astype(out_dtype)
        gs.append(gv)
        ges.append(_edge_prep(gv, nb, out_dtype))

    if packed:
        u = jnp.zeros((grows, 128), jnp.float32)
        for xi in range(2):
            u += _mm(gs[xi], mats_ref[3 + 2 * xi])
            u += _mm(ges[xi], mats_ref[4 + 2 * xi])
        # y0[r, q*cp+c] = sum_dh u[r+(dh-1)*nb, q*cp+dh*cout+c];
        # res[r, q*cp+c] = u[r, q*cp+3*cout+c]
        keep = lane % cp < cout
        y0 = jnp.where(keep, pltpu.roll(u, nb, 0), 0.0)
        y0 = y0 + jnp.where(keep, pltpu.roll(u, 128 - cout, 1), 0.0)
        y0 = y0 + jnp.where(
            keep, pltpu.roll(pltpu.roll(u, grows - nb, 0), 128 - 2 * cout, 1),
            0.0)
        res = jnp.where(keep, pltpu.roll(u, 128 - 3 * cout, 1), 0.0)
        y0 = y0[nb:nb + orows]
        res = res[nb:nb + orows]
    else:
        y0 = jnp.zeros((orows, 128), jnp.float32)
        res = jnp.zeros((orows, 128), jnp.float32)
        for xi in range(2):
            for dh in range(3):
                sl = slice(dh * nb, dh * nb + orows)
                y0 += _mm(gs[xi][sl], mats_ref[3 + xi * 3 + dh])
                y0 += _mm(ges[xi][sl], mats_ref[9 + xi * 3 + dh])
            res += _mm(gs[xi][nb:nb + orows], mats_ref[15 + xi])

    y = y0 * eps_ref[0][None] + eps_ref[1][None]
    y = jnp.where(y >= 0, y, eps_ref[2][None] * y)
    out_ref[...] = (y + res + eps_ref[3][None]).astype(out_dtype)


def tail_block(a1, xa, xb, *, w2, b2, w0, bn_scale, bn_shift, alpha, wr, br,
               cout: int, cp: int, interpret: bool = False):
    """Fused kd=1 decoder tail (eval).  a1 (B,D,H,W,Ca) = relu(att conv1)
    from XLA; xa, xb the skip-concat pair halves (B,D,H,W,Ch each);
    w2 (3,3,1,Ca,1), b2 (1,); w0 (3,3,1,2*Ch,cout) with the folded eval
    BatchNorm affine bn_scale/bn_shift (ALREADY including the conv bias) or
    conv-only head via bn_scale=None, bn_shift=bias, alpha=None;
    wr (1,1,1,2*Ch,cout), br (cout,).  Returns (B,D,H,W,cout)."""
    B, D, H, W, Ca = a1.shape
    Ch = xa.shape[-1]
    assert xa.shape == xb.shape == (B, D, H, W, Ch)
    assert max(Ca, Ch, cout, 3) <= cp and 128 % cp == 0
    g = 128 // cp
    nb = (W * cp) // 128
    assert (W * cp) % 128 == 0 and nb % 8 == 0 and g >= 2
    packed = 4 * cout <= cp
    ht = pick_ht_tail(H, nb)
    assert ht, f"no row tile fits H={H} W={W} cp={cp}"
    dtype = xa.dtype

    m2m, m2e = _conv2_packed_mats(w2, Ca, cp)
    mats = [m2m, m2e, _bcast_mat(cp)]
    if packed:
        for xi in range(2):
            m, e = _u_packed_mats(w0[:, :, :, xi * Ch:(xi + 1) * Ch, :],
                                  wr[0, 0, 0, xi * Ch:(xi + 1) * Ch, :],
                                  Ch, cout, cp)
            mats += [m, e]
    else:
        ms, es = [], []
        for xi in range(2):
            a, b_ = build_mats_g(w0[:, :, :, xi * Ch:(xi + 1) * Ch, :], cp)
            ms += a
            es += b_
        mats += ms + es + build_res_mats_g(wr, (Ch, Ch), cout, cp)
    mats = jnp.stack(mats).astype(dtype)

    eps = jnp.stack([
        _pad_vec_g(bn_scale, cp, 1.0),
        _pad_vec_g(bn_shift, cp, 0.0),
        _pad_vec_g(alpha, cp, 1.0),
        _pad_vec_g(br, cp, 0.0),
        jnp.full((128,), jnp.asarray(b2, jnp.float32).reshape(()),
                 jnp.float32),
    ])

    def flat(v, c):
        vp = v if c == cp else jnp.pad(v, ((0, 0),) * 4 + ((0, cp - c),))
        return vp.reshape(B * D * H * nb, 128)

    srows = (ht + 2 * HAL) * nb
    n = B * D * (H // ht)

    out = pl.pallas_call(
        partial(_tail2d_kernel, ht=ht, h=H, nb=nb, cp=cp, cout=cout,
                packed=packed, out_dtype=dtype),
        grid=(n,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 3 + [
            pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec((ht * nb, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B * D * H * nb, 128), dtype),
        scratch_shapes=[
            pltpu.VMEM((2, srows, 128), dtype),      # a1 slab ring
            pltpu.VMEM((2, srows, 128), dtype),      # xa slab ring
            pltpu.VMEM((2, srows, 128), dtype),      # xb slab ring
            pltpu.SemaphoreType.DMA((2, 3)),
        ],
        interpret=interpret,
    )(flat(a1, Ca), flat(xa, Ch), flat(xb, Ch), mats, eps)
    return out.reshape(B, D, H, W, cp)[..., :cout]


def _vmem_est_tail(ht: int, nb: int, itemsize: int) -> int:
    srows = (ht + 2 * HAL) * nb
    slabs = 2 * 3 * srows * 128 * itemsize
    live_f32 = 11 * srows * 128 * 4      # P/T/att/G pair/edges/U + roll temps
    mats = 17 * 128 * 128 * itemsize
    return slabs + live_f32 + mats


def pick_ht_tail(H: int, nb: int, itemsize: int = 2, budget=None) -> int:
    if budget is None:
        import os
        budget = int(os.environ.get("VS_TAIL_BUDGET_MB", "12")) << 20
    for ht in (64, 48, 32, 24, 16, 8):
        if H % ht == 0 and _vmem_est_tail(ht, nb, itemsize) <= budget:
            return ht
    return 0


def pick_cp(*channels: int):
    """Smallest cp in {16, 32, 64} holding every channel count (and the 3
    packed tap columns)."""
    need = max(3, *channels)
    for cp in (16, 32, 64):
        if need <= cp:
            return cp
    return 0


def can_tail2d(shape, ca: int, ch: int, cout: int) -> bool:
    cp = pick_cp(ca, ch, cout)
    if not cp:
        return False
    B, D, H, W = shape[:4]
    nb = (W * cp) // 128
    return ((W * cp) % 128 == 0 and nb % 8 == 0 and 128 // cp >= 2
            and H % 8 == 0 and pick_ht_tail(H, nb) > 0 and D >= 1)


# Tests set this to exercise the fused path on CPU via interpret mode.
FORCE_INTERPRET = False


def fusion_enabled(level: int) -> bool:
    """Per-level gates: VS_TAIL2D0 (up_0, packed logit head) and VS_TAIL2D1
    (up_1, banded-out).  Measured on the bench loop (tools/loop_attrib.py,
    r5): see docs/KERNELS.md gate table."""
    import os

    from vs_seg_tpu.nn import layers

    if layers._SPATIAL is not None:
        return False  # not halo-aware (same rule as the kd=1 block kernels)
    if FORCE_INTERPRET:
        return True
    default = "0"
    return (os.environ.get(f"VS_TAIL2D{level}", default) == "1"
            and jax.default_backend() == "tpu")
