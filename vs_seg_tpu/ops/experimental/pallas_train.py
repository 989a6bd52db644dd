"""Train-mode (3,3,3) conv with a Pallas banded backward (dx + dw + db).

VERDICT r3 task: the 338-340 ms reference-scale train step
(params/VSparams.py:456-463 hot loop) spends ~60 ms in backward
(transpose(jvp)) convolutions at the same mediocre emitter efficiencies as
the forward, plus the L2 two-layout ping-pong copies around them
(docs/KERNELS.md r3 train attribution). This module attacks that slice:

- FORWARD stays the exact XLA conv (zero risk, identical values — the
  forward emitter is not the problem at train).
- BACKWARD is custom:
    dx = conv333(dy, flip(w)^T)       — the stride-1 same-pad adjoint is
      itself a (3,3,3) same-pad conv, so it reuses the eval banded-matmul
      kernel (ops/pallas_conv333.py) verbatim with flipped/transposed
      Toeplitz mats.
    dw, db = conv333_dw(x, dy)        — ONE pass accumulating the 9
      main + 9 packed-edge (128, 128) Gram blocks G_k = A_k(x)^T @ dy in
      VMEM across the whole grid (A_k = the forward kernel's slab/roll/mask
      operand views, so the adjoint is exact by construction), then a tiny
      trace-time extraction mirrors ops/pallas_conv333._build_mats to read
      the (3, 3, 3, Cin, Cout) gradient off the blocks. XLA computes dw as
      a separate FeaturePacked convolution reading dy again; here dy is
      read once for both dx-taps and dw-blocks.

Wrapped as jax.custom_vjp and dispatched from nn/layers.conv3d at train
when the `train_conv_scope` is active (opened by the model at train) and
VS_TRAINCONV=1 (A/B-gated like every kernel: docs/KERNELS.md r4).
Exactness (values AND gradients) pinned vs the XLA path in
tests/test_pallas_train.py (interpret mode).

Geometry: single input, Cin/Cout <= 64 (cp = 64, g = 2 W positions per
128-lane row), (W*64) % 128 == 0, nb % 8 == 0, H % 8 == 0 — the flagship
L2/L3 encoder/decoder (3,3,3) sites (pair inputs arrive per-half through
nn/layers.Conv3d's split, each half <= 64 channels).
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vs_seg_tpu.ops.pallas_conv333 import conv333, can_conv333

_DN3 = ("NDHWC", "DHWIO", "NDHWC")


def _dw_kernel(x_ref, dc_ref, gm_ref, ge_ref, db_ref, slabs, sem,
               *, ht, h, nb, d_per_b):
    i = pl.program_id(0)
    ntiles = h // ht
    bd = i // ntiles
    t = i % ntiles
    d = bd % d_per_b
    n_bd = pl.num_programs(0) // ntiles
    rows_n = ht * nb
    srows = (ht + 2) * nb

    copies = []
    for dd in range(3):
        start = (jnp.clip(bd + dd - 1, 0, n_bd - 1) * h + t * ht) * nb
        copies.append(pltpu.make_async_copy(
            x_ref.at[pl.ds(start, srows)], slabs.at[dd], sem.at[dd]))
    for c in copies:
        c.start()
    for c in copies:
        c.wait()

    @pl.when(i == 0)
    def _init():
        gm_ref[...] = jnp.zeros_like(gm_ref)
        ge_ref[...] = jnp.zeros_like(ge_ref)
        db_ref[...] = jnp.zeros_like(db_ref)

    dc = dc_ref[...]
    db_ref[0, :] += jnp.sum(dc.astype(jnp.float32), axis=0)

    frs = jax.lax.broadcasted_iota(jnp.int32, (srows, 128), 0)
    lanes = jax.lax.broadcasted_iota(jnp.int32, (srows, 128), 1)
    zero = jnp.zeros((), slabs.dtype)

    def mm_t(lhs, rhs):
        # (rows, 128)^T @ (rows, 128) -> (128, 128), f32 accumulate
        return jax.lax.dot_general(lhs, rhs, (((0,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)

    for dd in range(3):
        doff = dd - 1
        slab = slabs[dd]
        # identical operand masking to the forward kernel
        # (ops/pallas_conv333._conv_kernel) — the adjoint must see the
        # same A_k(x) views
        invalid = jnp.logical_or(d + doff < 0, d + doff >= d_per_b)
        bad = (invalid | ((t == 0) & (frs < nb))
               | ((t == ntiles - 1) & (frs >= srows - nb)))
        slab = jnp.where(bad, zero, slab)
        s32 = slab.astype(jnp.float32)
        lo_s = pltpu.roll(s32, 1, 0)
        lo_s = jnp.where(frs % nb == 0, 0.0, lo_s)
        hi_s = pltpu.roll(s32, srows - 1, 0)
        hi_s = jnp.where(frs % nb == nb - 1, 0.0, hi_s)
        xr_s = jnp.where(lanes < 64, hi_s, lo_s).astype(slabs.dtype)
        for dh in range(3):
            sl = slice(dh * nb, dh * nb + rows_n)
            k = dd * 3 + dh
            gm_ref[k] += mm_t(slab[sl], dc)
            ge_ref[k] += mm_t(xr_s[sl], dc)


def conv333_dw(x, dy, *, interpret: bool = False):
    """Gram blocks for the weight gradient of a (3,3,3) stride-1 same-pad
    conv.  x: (B, D, H, W, Cin), dy: (B, D, H, W, Cout), both <= 64
    channels.  Returns (gm (9,128,128) f32, ge (9,128,128) f32,
    db (8,128) f32); extract with `dw_extract` / `db_extract`."""
    B, D, H, W, Cin = x.shape
    Cout = dy.shape[-1]
    assert dy.shape[:4] == x.shape[:4] and Cin <= 64 and Cout <= 64
    nb = (W * 64) // 128
    assert (W * 64) % 128 == 0 and nb % 8 == 0 and H % 8 == 0
    ht = pick_ht_dw(H, nb)
    assert ht, f"no row tile fits H={H} W={W}"
    dtype = x.dtype

    rows = B * D * H

    def flat(v, c, row_pad):
        vp = v if c == 64 else jnp.pad(v, ((0, 0),) * 4 + ((0, 64 - c),))
        vf = vp.reshape(rows * nb, 128)
        return jnp.pad(vf, ((nb, nb), (0, 0))) if row_pad else vf

    xv = flat(x, Cin, True)
    dcv = flat(dy.astype(dtype), Cout, False)

    grid = (B * D * (H // ht),)
    kernel = pl.pallas_call(
        partial(_dw_kernel, ht=ht, h=H, nb=nb, d_per_b=D),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),                   # x flat
            pl.BlockSpec((ht * nb, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),               # dy tile
        ],
        out_specs=[
            pl.BlockSpec((9, 128, 128), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9, 128, 128), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((9, 128, 128), jnp.float32),
            jax.ShapeDtypeStruct((9, 128, 128), jnp.float32),
            jax.ShapeDtypeStruct((8, 128), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((3, (ht + 2) * nb, 128), dtype),
            pltpu.SemaphoreType.DMA((3,)),
        ],
        interpret=interpret,
    )
    return kernel(xv, dcv)


def dw_extract(gm, ge, cin: int, cout: int) -> jnp.ndarray:
    """(3, 3, 3, Cin, Cout) weight gradient in reference (kh, kw, kd) order
    from the Gram blocks — the exact mirror of
    ops/pallas_conv333._build_mats' placements (g=2, cp=cpo=64)."""
    dw = jnp.zeros((3, 3, 3, cin, cout), jnp.float32)
    for dd in range(3):
        for dh in range(3):
            k = dd * 3 + dh
            for p in range(2):
                for q in range(2):
                    dwi = p - q + 1
                    if 0 <= dwi <= 2:
                        dw = dw.at[dh, dwi, dd].add(
                            gm[k, p * 64:p * 64 + cin, q * 64:q * 64 + cout])
            # packed edge: K half 0 = rolled-up rows -> dw=2;
            # K half 1 = rolled-down rows -> dw=0
            dw = dw.at[dh, 2, dd].add(ge[k, 0:cin, 64:64 + cout])
            dw = dw.at[dh, 0, dd].add(ge[k, 64:64 + cin, 0:cout])
    return dw


def db_extract(db, cout: int) -> jnp.ndarray:
    """(Cout,) bias gradient: sum the two W-position lane groups."""
    return db[0, :cout] + db[0, 64:64 + cout]


def _dw_vmem_est(ht: int, nb: int) -> int:
    slabs = 3 * (ht + 2) * nb * 128 * 2
    dc = ht * nb * 128 * 2
    grams = (2 * 9 * 128 * 128 + 8 * 128) * 4
    temps = 3 * (ht + 2) * nb * 128 * 4      # live f32 roll/select views
    return slabs + dc + grams + temps


def pick_ht_dw(H: int, nb: int, budget: int = 12 << 20) -> int:
    for ht in (48, 32, 24, 16, 8):
        if H % ht == 0 and _dw_vmem_est(ht, nb) <= budget:
            return ht
    return 0


def can_train_conv(x_shape, w_shape) -> bool:
    if len(w_shape) != 5 or tuple(w_shape[:3]) != (3, 3, 3):
        return False
    B, D, H, W, Cin = x_shape
    Cout = int(w_shape[4])
    if int(Cin) > 64 or Cout > 64 or int(w_shape[3]) != int(Cin):
        return False
    nb = (W * 64) // 128
    if (W * 64) % 128 or nb % 8 or H % 8:
        return False
    # dx runs through conv333 (dy has Cout channels, output Cin)
    return (pick_ht_dw(H, nb) > 0
            and can_conv333((B, D, H, W, Cout), (3, 3, 3, Cout, Cin)))


@lru_cache(maxsize=8)
def _train_conv_fn(dtype_name: str, interpret: bool):
    """custom_vjp'd (3,3,3) stride-1 same-pad conv+bias: XLA forward,
    Pallas banded backward."""
    dtype = jnp.dtype(dtype_name)

    def fwd_fn(x, w, b):
        # exact mirror of nn/layers.conv3d's 3D path for kd=3, stride 1,
        # same padding (precision=None: bf16 inputs)
        xc = x.astype(dtype)
        wc = w.astype(dtype)
        y = jax.lax.conv_general_dilated(
            xc, jnp.transpose(wc, (2, 0, 1, 3, 4)),
            window_strides=(1, 1, 1), padding=[(1, 1)] * 3,
            dimension_numbers=_DN3,
            precision=(jax.lax.Precision.HIGHEST
                       if dtype == jnp.float32 else None))
        return y + b.astype(y.dtype)

    @jax.custom_vjp
    def f(x, w, b):
        return fwd_fn(x, w, b)

    def f_fwd(x, w, b):
        return fwd_fn(x, w, b), (x, w)

    def f_bwd(res, dy):
        x, w = res
        xc = x.astype(dtype)
        dyc = dy.astype(dtype)
        # dx: the adjoint of a stride-1 same-pad odd conv is itself a
        # same-pad conv with spatially flipped, io-transposed weights —
        # reuse the eval banded kernel verbatim
        w_t = jnp.transpose(jnp.flip(jnp.asarray(w, jnp.float32),
                                     (0, 1, 2)), (0, 1, 2, 4, 3))
        dx = conv333(dyc, w_t, interpret=interpret)
        gm, ge, db = conv333_dw(xc, dyc, interpret=interpret)
        dw = dw_extract(gm, ge, w.shape[3], w.shape[4])
        return (dx.astype(x.dtype), dw.astype(w.dtype),
                db_extract(db, w.shape[4]).astype(w.dtype))

    f.defvjp(f_fwd, f_bwd)
    return f


def conv333_train(x, w, b, dtype=jnp.bfloat16, interpret: bool = False):
    """(B,D,H,W,Cin) x, (3,3,3,Cin,Cout) w (reference kh,kw,kd order),
    (Cout,) b -> conv + bias with the Pallas banded backward."""
    return _train_conv_fn(jnp.dtype(dtype).name, bool(interpret))(x, w, b)


# Tests set this to exercise the fused path on CPU via interpret mode.
FORCE_INTERPRET = False


def fusion_enabled() -> bool:
    """Train-conv backward dispatch gate (VS_TRAINCONV). Off under spatial
    sharding (conv333's zero H padding vs halo exchange). Default OFF: the
    r4 real-TPU train-step A/B measured 432.4 ms vs 344.3 baseline (batch
    1, 384x384x64, same relay day) — the custom-call boundary costs more
    than the one-pass dw/db saves when the neighbors are XLA BN-stats
    reduces rather than other Pallas calls (docs/KERNELS.md r4).
    VS_TRAINCONV=1 re-enables for re-evaluation."""
    import os

    from vs_seg_tpu.nn import layers

    if layers._SPATIAL is not None:
        return False
    if FORCE_INTERPRET:
        return True
    return (os.environ.get("VS_TRAINCONV", "0") == "1"
            and jax.default_backend() == "tpu")
