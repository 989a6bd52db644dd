"""General group-width block-Toeplitz matrices for MXU-native banded convs.

The (rows, 128) flat-row view (ops/pallas_conv333.py v2) packs
g = 128 // cp consecutive W positions of cp-padded channels into each
128-lane row.  A 3-wide W tap then becomes, per h/d tap:

  main: a (128, 128) within-block Toeplitz matmul — output position q
        reads input positions q-1, q, q+1 that live in the same row
        (0 <= p = q + dw - 1 < g)
  edge: the two cross-block contributions — output q=0 reads the previous
        row's position g-1 (dw=0) and q=g-1 reads the next row's position
        0 (dw=2).  Both land in DISJOINT lane ranges (last cp / first cp),
        so one packed operand row [next | 0 | prev] serves a single edge
        matmul per tap.

`_build_mats` in pallas_conv333 hardwires g in {1, 2}; these builders
support any g with cp = 128//g (g=4 for 32ch, g=8 for 16ch — the
reference net's L0/L1 levels, params/VSparams.py:355-369).  Reused by the
kd=1 fused block kernels (ops/pallas_block2d.py).

Math pinned against lax.conv in tests/test_blockmats.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def build_mats_g(w, cp: int):
    """Toeplitz blocks from (3, 3, kd, Cin, Cout) reference-order (kh, kw,
    kd) weights, both channel-padded to cp (Cin, Cout <= cp).  Returns
    (mains, edges): lists of kd*3 (128, 128) blocks indexed [dd*3 + dh].
    The edge operand packs next-row pos-0 lanes [0:cp) and prev-row
    pos-(g-1) lanes [128-cp:128) (see edge_prep_g)."""
    kh, kw, kd, cin, cout = w.shape
    assert (kh, kw) == (3, 3) and cin <= cp and cout <= cp and 128 % cp == 0
    g = 128 // cp
    assert g >= 2
    wf = jnp.zeros((3, 3, kd, cp, cp), jnp.float32)
    wf = wf.at[:, :, :, :cin, :cout].set(jnp.asarray(w, jnp.float32))
    mains, edges = [], []
    for dd in range(kd):
        for dh in range(3):
            m = jnp.zeros((128, 128), jnp.float32)
            for q in range(g):          # output position within block
                for dw in range(3):
                    p = q + dw - 1      # input position within block
                    if 0 <= p < g:
                        m = m.at[p * cp:(p + 1) * cp,
                                 q * cp:(q + 1) * cp].set(wf[dh, dw, dd])
            mains.append(m)
            e = jnp.zeros((128, 128), jnp.float32)
            # next row's position 0 -> output q = g-1 (dw = 2)
            e = e.at[0:cp, (g - 1) * cp:].set(wf[dh, 2, dd])
            # previous row's position g-1 -> output q = 0 (dw = 0)
            e = e.at[128 - cp:, 0:cp].set(wf[dh, 0, dd])
            edges.append(e)
    return mains, edges


def build_colcast_mats_g(w2, cp: int):
    """C->1 conv Toeplitz blocks with COLUMN-BROADCAST weights: the matmul
    reduces over channels and replicates the scalar across every output
    lane of the position block (wide attention map — the gate operand,
    no (..., 1) tensor ever exists).  w2: (3, 3, kd, C, 1), C <= cp."""
    kh, kw, kd, cin, _ = w2.shape
    assert (kh, kw) == (3, 3) and cin <= cp and 128 % cp == 0
    g = 128 // cp
    assert g >= 2
    wf = jnp.zeros((3, 3, kd, cp), jnp.float32)
    wf = wf.at[:, :, :, :cin].set(jnp.asarray(w2[..., 0], jnp.float32))
    mains, edges = [], []
    for dd in range(kd):
        for dh in range(3):
            m = jnp.zeros((128, 128), jnp.float32)
            for q in range(g):
                for dw in range(3):
                    p = q + dw - 1
                    if 0 <= p < g:
                        col = wf[dh, dw, dd]
                        m = m.at[p * cp:(p + 1) * cp,
                                 q * cp:(q + 1) * cp].set(
                            jnp.broadcast_to(col[:, None], (cp, cp)))
            mains.append(m)
            e = jnp.zeros((128, 128), jnp.float32)
            e = e.at[0:cp, (g - 1) * cp:].set(
                jnp.broadcast_to(wf[dh, 2, dd][:, None], (cp, cp)))
            e = e.at[128 - cp:, 0:cp].set(
                jnp.broadcast_to(wf[dh, 0, dd][:, None], (cp, cp)))
            edges.append(e)
    return mains, edges


def build_conv2_tap_mats(w2, ca: int, cp: int):
    """conv2 (C->1) TAP-PACKED Toeplitz blocks: output column q*cp + dd*3
    + dh holds the (dd, dh)-tap W-contraction partial for position q — one
    (main + edge) matmul pair per input plane computes every tap's partial,
    instead of colcast's 2 matmuls per (dd, dh) tap (3*kd matmuls -> 2).
    The caller combines the partials with row slices/shifts and one
    `build_tap_bcast_mat` matmul that sums the tap columns and broadcasts
    the attention scalar across the block's cp lanes.  w2: (3, 3, kd, Ca,
    1); requires 3*kd <= cp."""
    kh, kw, kd, cin, _ = w2.shape
    assert (kh, kw) == (3, 3) and cin <= cp and 128 % cp == 0
    assert 3 * kd <= cp
    g = 128 // cp
    assert g >= 2
    wf = jnp.zeros((3, 3, kd, cp), jnp.float32)
    wf = wf.at[:, :, :, :ca].set(jnp.asarray(w2[..., 0], jnp.float32))
    m = jnp.zeros((128, 128), jnp.float32)
    e = jnp.zeros((128, 128), jnp.float32)
    for dd in range(kd):
        for dh in range(3):
            col = dd * 3 + dh
            for q in range(g):
                for dw in range(3):
                    p = q + dw - 1
                    if 0 <= p < g:
                        m = m.at[p * cp:(p + 1) * cp,
                                 q * cp + col].set(wf[dh, dw, dd])
            e = e.at[0:cp, (g - 1) * cp + col].set(wf[dh, 2, dd])
            e = e.at[(g - 1) * cp:, col].set(wf[dh, 0, dd])
    return m, e


def build_tap_bcast_mat(cp: int, ncols: int):
    """Block-diagonal ones: sums the first `ncols` tap columns of each
    position block and broadcasts the result across the block's cp lanes."""
    g = 128 // cp
    b = jnp.zeros((128, 128), jnp.float32)
    for q in range(g):
        b = b.at[q * cp:q * cp + ncols, q * cp:(q + 1) * cp].set(1.0)
    return b


def build_res_mats_g(wr, cins, cout: int, cp: int):
    """1x1x1 residual conv as per-input position-preserving block-diagonal
    (128, 128) matrices.  wr: (1, 1, 1, sum(cins), cout)."""
    g = 128 // cp
    mats = []
    c0 = 0
    for cin in cins:
        blk = jnp.zeros((cp, cp), jnp.float32)
        blk = blk.at[:cin, :cout].set(
            jnp.asarray(wr[0, 0, 0, c0:c0 + cin], jnp.float32))
        m = jnp.zeros((128, 128), jnp.float32)
        for q in range(g):
            m = m.at[q * cp:(q + 1) * cp, q * cp:(q + 1) * cp].set(blk)
        mats.append(m)
        c0 += cin
    return mats


def flat_rows(x, cp: int):
    """(B, D, H, W, C) -> the (B*D*H*nb, 128) flat-row view (channel-pad to
    cp; requires W*cp % 128 == 0).  Free HBM reshape."""
    B, D, H, W, C = x.shape
    assert C <= cp and (W * cp) % 128 == 0
    if C < cp:
        x = jnp.pad(x, ((0, 0),) * 4 + ((0, cp - C),))
    return x.reshape(B * D * H * (W * cp) // 128, 128)


def unflat_rows(rows, shape, cp: int):
    """Inverse of flat_rows: (B*D*H*nb, 128) -> (B, D, H, W, C)."""
    B, D, H, W, C = shape
    return rows.reshape(B, D, H, W, cp)[..., :C]


def reference_conv_flat(x_rows, mains, edges, nb: int, planes: int):
    """Pure-jnp oracle of the banded-matmul kd=1 conv on the flat-row view
    (the math the Pallas kernels implement): per dh tap, a main
    within-block matmul plus one packed edge matmul on the +-1-row rolls.
    x_rows: (planes*h*nb, 128); returns same-shape f32 output rows.

    Test-only (tests/test_blockmats.py): validates the matrices against
    lax.conv without any Pallas machinery."""
    total, _ = x_rows.shape
    rows_per_plane = total // planes
    h_lines = rows_per_plane // nb
    line = (jnp.arange(total) // nb) % h_lines
    fr = jnp.arange(total)
    out = jnp.zeros((total, 128), jnp.float32)
    x32 = x_rows.astype(jnp.float32)

    for dh in range(3):
        # tap dh reads H line h + (dh-1): shift rows UP by (dh-1)*nb,
        # zeroing lines that crossed the plane's H boundary
        s = dh - 1
        if s == 0:
            xt = x32
        else:
            xt = jnp.roll(x32, -s * nb, axis=0)
            ok = (line < h_lines - 1) if s > 0 else (line >= 1)
            xt = jnp.where(ok[:, None], xt, 0.0)
        out = out + xt @ mains[dh]
        # packed edge operand: next row (W block +1) in the low lanes,
        # previous row in the high lanes — the edge matrix only reads
        # lanes [0:cp) and [128-cp:128), so the split at 64 serves every
        # g >= 2 (middle rows of the matrix are zero).
        lo = jnp.roll(xt, 1, axis=0)
        lo = jnp.where((fr % nb == 0)[:, None], 0.0, lo)
        hi = jnp.roll(xt, -1, axis=0)
        hi = jnp.where((fr % nb == nb - 1)[:, None], 0.0, hi)
        packed = jnp.where(jnp.arange(128)[None, :] < 64, hi, lo)
        out = out + packed @ edges[dh]
    return out
