"""Pallas TPU mega-kernels for the kd=1 ("2.5D") levels: one encoder
ResidualUnit or one decoder attention block per kernel, at 16/32 channels.

The reference net's L0/L1 levels use (3,3,1) kernels (params/VSparams.py
:355-369) — depth planes are independent, so unlike the (3,3,3) ring
kernels (ops/pallas_l2block.py, ops/pallas_rublock.py) no depth pipeline
is needed: each grid step computes one H row-tile of one plane end to end,
recomputing only the (ht+chain)/ht H-halo overlap.  What these kernels buy
is the same thing as their kd=3 siblings — the whole multi-conv block pays
the Pallas layout barrier twice (inputs, output) instead of at every
producer->consumer edge, and the C->1 attention conv2 is computed WIDE
(column-broadcast Toeplitz blocks) so the lane-starved (..., 1) tensor the
round-3 trace bills ~28 ms/2-window never exists.

Channels pad to cp in {16, 32} (g = 128//cp W positions per lane row,
ops/blockmats.py); every conv is 3 taps x (main + packed-edge) banded
matmuls on (rows, 128) tiles.

  ru_block2d:  u0 = prelu(conv0(x)*s0+h0); u1 = prelu(conv1(u0)*s1+h1);
               out = u1 + conv1x1(x) + br            (encoder down block)
  l2_block2d:  a1 = relu(conv1(xa,xb)+b1); att = sigmoid(conv2(a1)+b2);
               g* = att*x*+x*; y = act(conv0(ga,gb)*s+h);
               out = y + conv1x1(ga,gb) + br         (decoder up block;
               the i==0 logit head is the degenerate s=1, h=bias, alpha=1)

Numerics pinned in tests/test_model.py (interpret mode at model level) and
tests/test_pallas_block2d.py; real-Mosaic check via tools/l2block_probe.py.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vs_seg_tpu.ops.blockmats import (
    build_colcast_mats_g, build_mats_g, build_res_mats_g,
)
from vs_seg_tpu.ops.pallas_l2block import OF, _edge_prep, _mm


def _pad_vec_g(v, cp: int, default: float):
    g = 128 // cp
    if v is None:
        return jnp.full((128,), default, jnp.float32)
    v = jnp.asarray(v, jnp.float32).reshape(-1)
    if v.shape[0] == 1 and cp > 1:
        # torch-PReLU shared scalar: broadcast across every lane (padded
        # lanes carry zeros through the chain, so this is harmless there)
        return jnp.broadcast_to(v, (128,))
    return jnp.tile(jnp.pad(v, (0, cp - v.shape[0])), g)


def _slab_loader(x_refs, rings, sem, bd, t, h, ht, nb, nt):
    srows = (ht + 2 * OF) * nb
    start = (bd * h + t * ht) * nb   # incl. the global OF*nb front pad
    for xi, (x_ref, ring) in enumerate(zip(x_refs, rings)):
        cp = pltpu.make_async_copy(
            x_ref.at[pl.ds(start, srows)], ring, sem.at[xi])
        cp.start()
        cp.wait()

    def slab(xi):
        s = rings[xi][...]
        fr = jax.lax.broadcasted_iota(jnp.int32, (srows, 128), 0)
        bad = (((t == 0) & (fr < OF * nb))
               | ((t == nt - 1) & (fr >= srows - OF * nb)))
        return jnp.where(bad, jnp.zeros((), s.dtype), s)

    return slab


def _halo_zero(v, nb: int, lines: int, t, nt):
    """Zero `lines` H-halo line-blocks at the plane boundary tiles so the
    next conv's zero padding is exact."""
    rows = v.shape[0]
    fr = jax.lax.broadcasted_iota(jnp.int32, (rows, 128), 0)
    bad = (((t == 0) & (fr < lines * nb))
           | ((t == nt - 1) & (fr >= rows - lines * nb)))
    return jnp.where(bad, 0.0, v)


def _conv3(inputs, w_m, w_e, k0: int, nb: int, rows_out: int, off: int):
    """3-tap banded conv: inputs = (main, edge) value pair; taps read
    slices [off+dh*nb, off+dh*nb+rows_out)."""
    main, edge = inputs
    acc = jnp.zeros((rows_out, 128), jnp.float32)
    for dh in range(3):
        sl = slice(off + dh * nb, off + dh * nb + rows_out)
        acc += _mm(main[sl], w_m[k0 + dh])
        acc += _mm(edge[sl], w_e[k0 + dh])
    return acc


def _ru2d_kernel(x_ref, w0m_ref, w0e_ref, w1m_ref, w1e_ref, wr_ref, eps_ref,
                 out_ref, xr, sem, *, ht, h, nb, out_dtype):
    bd = pl.program_id(0)
    t = pl.program_id(1)
    nt = h // ht
    rows_u0 = (ht + 2) * nb
    rows_o = ht * nb

    slab = _slab_loader((x_ref,), (xr,), sem, bd, t, h, ht, nb, nt)
    x = slab(0)
    xe = _edge_prep(x, nb, x.dtype)

    acc = _conv3((x, xe), w0m_ref, w0e_ref, 0, nb, rows_u0, (OF - 2) * nb)
    y = acc * eps_ref[0][None] + eps_ref[1][None]
    u0 = jnp.where(y >= 0, y, eps_ref[2][None] * y)
    u0 = _halo_zero(u0, nb, 1, t, nt)
    u0 = u0.astype(out_dtype)
    u0e = _edge_prep(u0, nb, out_dtype)

    acc = _conv3((u0, u0e), w1m_ref, w1e_ref, 0, nb, rows_o, 0)
    y = acc * eps_ref[3][None] + eps_ref[4][None]
    y = jnp.where(y >= 0, y, eps_ref[5][None] * y)
    res = _mm(x[OF * nb:OF * nb + rows_o], wr_ref[0])
    out_ref[...] = (y + res + eps_ref[6][None]).astype(out_dtype)


def _l2_2d_kernel(xa_ref, xb_ref, w1m_ref, w1e_ref, w2m_ref, w2e_ref,
                  w0m_ref, w0e_ref, wr_ref, eps_ref, out_ref, xra, xrb, sem,
                  *, ht, h, nb, out_dtype):
    bd = pl.program_id(0)
    t = pl.program_id(1)
    nt = h // ht
    rows_a1 = (ht + 4) * nb
    rows_g = (ht + 2) * nb
    rows_o = ht * nb

    slab = _slab_loader((xa_ref, xb_ref), (xra, xrb), sem, bd, t, h, ht, nb,
                        nt)
    xs, xes = [], []
    for xi in range(2):
        x = slab(xi)
        xs.append(x)
        xes.append(_edge_prep(x, nb, x.dtype))

    acc = jnp.zeros((rows_a1, 128), jnp.float32)
    for xi in range(2):
        acc += _conv3((xs[xi], xes[xi]), w1m_ref, w1e_ref, 3 * xi, nb,
                      rows_a1, (OF - 3) * nb)
    a1 = jnp.maximum(acc + eps_ref[0][None], 0.0)
    a1 = _halo_zero(a1, nb, 2, t, nt)
    a1 = a1.astype(out_dtype)
    a1e = _edge_prep(a1, nb, out_dtype)

    acc = _conv3((a1, a1e), w2m_ref, w2e_ref, 0, nb, rows_g, 0)
    att = jax.nn.sigmoid(acc + eps_ref[1][None])

    acc = jnp.zeros((rows_o, 128), jnp.float32)
    accr = jnp.zeros((rows_o, 128), jnp.float32)
    for xi in range(2):
        xc = xs[xi][(OF - 1) * nb:(OF - 1) * nb + rows_g].astype(jnp.float32)
        gt = _halo_zero(att * xc + xc, nb, 1, t, nt).astype(out_dtype)
        gte = _edge_prep(gt, nb, out_dtype)
        acc += _conv3((gt, gte), w0m_ref, w0e_ref, 3 * xi, nb, rows_o, 0)
        accr += _mm(gt[nb:nb + rows_o], wr_ref[xi])
    y = acc * eps_ref[2][None] + eps_ref[3][None]
    y = jnp.where(y >= 0, y, eps_ref[4][None] * y)
    out_ref[...] = (y + accr + eps_ref[5][None]).astype(out_dtype)


def _flat_pad(x, cp: int):
    B, D, H, W, C = x.shape
    assert (W * cp) % 128 == 0 and C <= cp, (W, cp, C)
    nb = (W * cp) // 128
    xp = x if C == cp else jnp.pad(x, ((0, 0),) * 4 + ((0, cp - C),))
    return (jnp.pad(xp.reshape(B * D * H * nb, 128),
                    ((OF * nb, OF * nb), (0, 0))), nb)


def _stack(ms, dtype):
    return jnp.stack(ms).astype(dtype)


def ru_block2d(x, *, w0, bn0_scale, bn0_shift, alpha0, w1, bn1_scale,
               bn1_shift, alpha1, wr, br, cp: int,
               interpret: bool = False):
    """Fused 2-subunit (3,3,1) ResidualUnit (eval).  x: (B, D, H, W, Cin);
    w0 (3,3,1,Cin,Cout), w1 (3,3,1,Cout,Cout), wr (1,1,1,Cin,Cout);
    channels pad to cp.  bn*_scale/shift are folded eval BatchNorm affines
    ALREADY including each conv's bias."""
    B, D, H, W, Cin = x.shape
    Cout = w0.shape[-1]
    assert max(Cin, Cout) <= cp
    ht = pick_ht_2d(H, (W * cp) // 128, n_inputs=1)
    assert ht, f"no row tile fits H={H} W={W} cp={cp}"
    dtype = x.dtype

    w0m, w0e = build_mats_g(w0, cp)
    w1m, w1e = build_mats_g(w1, cp)
    wrm = build_res_mats_g(wr, (Cin,), Cout, cp)
    eps = jnp.stack([
        _pad_vec_g(bn0_scale, cp, 1.0), _pad_vec_g(bn0_shift, cp, 0.0),
        _pad_vec_g(alpha0, cp, 1.0),
        _pad_vec_g(bn1_scale, cp, 1.0), _pad_vec_g(bn1_shift, cp, 0.0),
        _pad_vec_g(alpha1, cp, 1.0), _pad_vec_g(br, cp, 0.0),
    ])

    xv, nb = _flat_pad(x, cp)
    srows = (ht + 2 * OF) * nb
    rows = B * D * H * nb

    out = pl.pallas_call(
        partial(_ru2d_kernel, ht=ht, h=H, nb=nb, out_dtype=dtype),
        grid=(B * D, H // ht),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] + [
            pl.BlockSpec(memory_space=pltpu.VMEM)] * 6,
        out_specs=pl.BlockSpec(
            (ht * nb, 128),
            lambda bd, t: (bd * (H // ht) + t, 0),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, 128), dtype),
        scratch_shapes=[pltpu.VMEM((srows, 128), dtype),
                        pltpu.SemaphoreType.DMA((1,))],
        interpret=interpret,
    )(xv, _stack(w0m, dtype), _stack(w0e, dtype), _stack(w1m, dtype),
      _stack(w1e, dtype), _stack(wrm, dtype), eps)
    return out.reshape(B, D, H, W, cp)[..., :Cout]


def l2_block2d(xa, xb, *, w1, b1, w2, b2, w0, bn_scale, bn_shift, alpha,
               wr, br, cp: int, interpret: bool = False):
    """Fused (3,3,1) decoder attention block (eval).  xa, xb: equal-shape
    pair halves (C <= cp each); w1 (3,3,1,2C,C), w2 (3,3,1,C,1),
    w0 (3,3,1,2C,Cout), wr (1,1,1,2C,Cout), Cout <= cp.  For the i==0
    logit head (conv-only unit0) pass bn_scale=None, bn_shift=bias,
    alpha=None."""
    B, D, H, W, C = xa.shape
    assert xb.shape == xa.shape and C <= cp
    Cout = w0.shape[-1]
    assert Cout <= cp
    ht = pick_ht_2d(H, (W * cp) // 128, n_inputs=2)
    assert ht, f"no row tile fits H={H} W={W} cp={cp}"
    dtype = xa.dtype

    def pair_mats(w, builder=build_mats_g):
        ms, es = [], []
        for c0 in (0, C):
            a, b_ = builder(w[:, :, :, c0:c0 + C, :], cp)
            ms += a
            es += b_
        return ms, es

    w1m, w1e = pair_mats(w1)
    w0m, w0e = pair_mats(w0)
    w2m, w2e = build_colcast_mats_g(w2, cp)
    wrm = build_res_mats_g(wr, (C, C), Cout, cp)
    eps = jnp.stack([
        _pad_vec_g(b1, cp, 0.0),
        jnp.full((128,), jnp.asarray(b2, jnp.float32).reshape(()),
                 jnp.float32),
        _pad_vec_g(bn_scale, cp, 1.0), _pad_vec_g(bn_shift, cp, 0.0),
        _pad_vec_g(alpha, cp, 1.0), _pad_vec_g(br, cp, 0.0),
    ])

    xav, nb = _flat_pad(xa, cp)
    xbv, _ = _flat_pad(xb, cp)
    srows = (ht + 2 * OF) * nb
    rows = B * D * H * nb

    out = pl.pallas_call(
        partial(_l2_2d_kernel, ht=ht, h=H, nb=nb, out_dtype=dtype),
        grid=(B * D, H // ht),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 2 + [
            pl.BlockSpec(memory_space=pltpu.VMEM)] * 8,
        out_specs=pl.BlockSpec(
            (ht * nb, 128),
            lambda bd, t: (bd * (H // ht) + t, 0),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, 128), dtype),
        scratch_shapes=[pltpu.VMEM((srows, 128), dtype),
                        pltpu.VMEM((srows, 128), dtype),
                        pltpu.SemaphoreType.DMA((2,))],
        interpret=interpret,
    )(xav, xbv, _stack(w1m, dtype), _stack(w1e, dtype), _stack(w2m, dtype),
      _stack(w2e, dtype), _stack(w0m, dtype), _stack(w0e, dtype),
      _stack(wrm, dtype), eps)
    return out.reshape(B, D, H, W, cp)[..., :Cout]


def _vmem_est_2d(ht: int, nb: int, n_inputs: int) -> int:
    srows = (ht + 2 * OF) * nb
    slabs = n_inputs * srows * 128 * 2
    inter = 2 * (ht + 4) * nb * 128 * 2 * (1 + n_inputs)
    mats = 40 * 128 * 128 * 2
    accs = 3 * (ht + 4) * nb * 128 * 4
    temps = 4 * srows * 128 * 4          # live f32 roll/select views
    return slabs + inter + mats + accs + temps


def pick_ht_2d(H: int, nb: int, n_inputs: int, budget=None) -> int:
    if budget is None:
        import os
        budget = int(os.environ.get("VS_2D_BUDGET_MB", "12")) << 20
    for ht in (64, 48, 32, 24, 16, 8):
        if H % ht == 0 and _vmem_est_2d(ht, nb, n_inputs) <= budget:
            return ht
    return 0


def pick_cp(*channels: int):
    """Smallest cp in {16, 32, 64} holding every channel count."""
    need = max(channels)
    for cp in (16, 32, 64):
        if need <= cp:
            return cp
    return 0


def can_block2d(shape, cp: int, n_inputs: int) -> bool:
    if not cp:
        return False
    B, D, H, W = shape[:4]
    nb = (W * cp) // 128
    return ((W * cp) % 128 == 0 and nb % 8 == 0 and H % 8 == 0
            and pick_ht_2d(H, nb, n_inputs) > 0)


# Tests set these to exercise the fused paths on CPU via interpret mode.
FORCE_INTERPRET = False


def ru_fusion_enabled() -> bool:
    import os

    from vs_seg_tpu.nn import layers

    if layers._SPATIAL is not None:
        return False
    if FORCE_INTERPRET:
        return True
    return (os.environ.get("VS_RUBLOCK2D", "0") == "1"
            and jax.default_backend() == "tpu")


def l2_fusion_enabled() -> bool:
    import os

    from vs_seg_tpu.nn import layers

    if layers._SPATIAL is not None:
        return False
    if FORCE_INTERPRET:
        return True
    return (os.environ.get("VS_L2BLOCK2D", "0") == "1"
            and jax.default_backend() == "tpu")
