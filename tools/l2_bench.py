#!/usr/bin/env python3
"""Microbench: the L2-level (3,3,3) conv family at reference scale
(96x96, BD=2*64, C=48) — the FLOP-heaviest level of the flagship forward
(docs/KERNELS.md, VERDICT round-2 task 1) — plus the transpose-conv and
strided downsample forms whose isolated cost was never measured.

Each op is timed in a small in-graph scan chain (dispatch-latency free,
scalar-readback sync). Programs are kept small so the remote compile
service accepts them.

Usage: python tools/l2_bench.py [all|conv|tconv|att]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

CHAIN = 8
STEPS = 2
REPS = 3


def sync(x):
    return float(jnp.sum(x.astype(jnp.float32)))


def chain_timed(op, x, *consts, n=CHAIN * STEPS):
    """Time op(x, *consts) -> y (any shape) in a scan chain; the carry
    perturbs x each iteration so XLA cannot hoist or CSE the body."""

    def step(acc, _):
        y = op(x + acc.astype(x.dtype), *consts)
        return jnp.max(jnp.abs(y)).astype(jnp.float32) * 1e-12, ()

    @jax.jit
    def run(x, *consts):
        acc, _ = jax.lax.scan(step, jnp.float32(0.0), None, length=n)
        return acc[None]

    sync(run(x, *consts))
    best = float("inf")
    for _ in range(REPS):
        t0 = time.perf_counter()
        sync(run(x, *consts))
        best = min(best, time.perf_counter() - t0)
    return best / n


def report(name, dt, useful_flops):
    print(f"{name:34s} {dt*1e3:8.3f} ms  {useful_flops/dt/1e12:6.2f} TFLOP/s")
    sys.stdout.flush()


_DN3 = ("NDHWC", "DHWIO", "NDHWC")


def conv3d_op(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1, 1), [(1, 1), (1, 1), (1, 1)], dimension_numbers=_DN3)


def conv3d_strided(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (2, 2, 2), [(1, 1), (1, 1), (1, 1)], dimension_numbers=_DN3)


def tconv3d_op(x, w):
    # ConvTranspose3d k3 s2 as input-dilated conv (nn/layers.py:191-233):
    # pad (k-1-p, k-1-p+op) = (1, 2), lhs_dilation 2
    return jax.lax.conv_general_dilated(
        x, w, (1, 1, 1), [(1, 2), (1, 2), (1, 2)], lhs_dilation=(2, 2, 2),
        dimension_numbers=_DN3)


def tconv3d_subpixel(x, w):
    """Same transpose conv as one (2,2,2) dense conv to 8*Co channels +
    depth-to-space interleave. w (2,2,2,Ci,8*Co) pre-restructured."""
    b, d, h, wd, ci = x.shape
    co = w.shape[-1] // 8
    xp = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 1), (0, 0)))
    y = jax.lax.conv_general_dilated(
        xp, w, (1, 1, 1), [(0, 0), (0, 0), (0, 0)], dimension_numbers=_DN3)
    y = y.reshape(b, d, h, wd, 2, 2, 2, co)
    y = jnp.transpose(y, (0, 1, 4, 2, 5, 3, 6, 7))
    return y.reshape(b, 2 * d, 2 * h, 2 * wd, co)


def subpixel_weights(w3, co):
    """Restructure (3,3,3,Ci,Co) transpose-conv weights (stored reference
    order, pre-flip) into the (2,2,2,Ci,8*Co) dense-conv equivalent.

    1D k=3 s=2 transpose conv: even output o=2i  <- x[i]   * w[1]
                               odd  output o=2i+1 <- x[i]*w[2] + x[i+1]*w[0]
    Class (pd,ph,pw) lives at dense-conv tap (t0..): even dim -> tap0 w[1];
    odd dim -> tap0 w[2], tap1 w[0].
    """
    ci = w3.shape[3]
    w2 = np.zeros((2, 2, 2, ci, 8, co), np.float32)
    w3 = np.asarray(w3, np.float32)
    taps = {0: [(0, 1)], 1: [(0, 2), (1, 0)]}  # parity -> [(dense_tap, k3_idx)]
    for pd in range(2):
        for ph in range(2):
            for pw in range(2):
                cls = (pd << 2) | (ph << 1) | pw
                for td, kd in taps[pd]:
                    for th, kh in taps[ph]:
                        for tw, kw in taps[pw]:
                            w2[td, th, tw, :, cls, :] = w3[kd, kh, kw]
    return jnp.asarray(w2.reshape(2, 2, 2, ci, 8 * co), jnp.bfloat16)


def depthpair_packed(x, w2):
    """(3,3,3) stride-1 conv via depth-pair packing: overlapped 4-tap depth
    channels (192) -> 2D conv -> 96 out channels -> unpack. w2 (3,3,192,96)
    pre-built by depthpair_weights."""
    b, d, h, wd, c = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 2), (0, 0), (0, 0), (0, 0)))
    xg = jnp.concatenate([xp[:, 0:d:2], xp[:, 1:d + 1:2], xp[:, 2:d + 2:2],
                          xp[:, 3:d + 3:2]], axis=-1)  # (B, D/2, H, W, 4C)
    y = jax.lax.conv_general_dilated(
        xg.reshape(b * d // 2, h, wd, 4 * c), w2, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    y = y.reshape(b, d // 2, h, wd, 2, c)
    return jnp.transpose(y, (0, 1, 4, 2, 3, 5)).reshape(b, d, h, wd, c)


def depthpair_weights(w3, c):
    """(3,3,3,C,C) (spatial order D,H,W as used by conv3d's 3D path) ->
    (3,3,4C,2C) packed 2D weights."""
    w3 = np.asarray(w3, np.float32)  # (kd, kh, kw, C, C)
    w2 = np.zeros((3, 3, 4 * c, 2 * c), np.float32)
    for kd in range(3):
        # out slot 0 (even d): depth taps d-1,d,d+1 = input slots 0,1,2
        w2[:, :, kd * c:(kd + 1) * c, 0:c] = w3[kd]
        # out slot 1 (odd d): taps = input slots 1,2,3
        w2[:, :, (kd + 1) * c:(kd + 2) * c, c:2 * c] = w3[kd]
    return jnp.asarray(w2, jnp.bfloat16)


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    print(f"devices: {jax.devices()}")
    rng = np.random.default_rng(0)
    BD, H, W, C = 2 * 64, 96, 96, 48  # L2: window batch 2, depth 64

    if which in ("all", "conv"):
        x = jnp.asarray(rng.normal(size=(2, 64, H, W, C)), jnp.bfloat16)
        w = jnp.asarray(rng.normal(size=(3, 3, 3, C, C)) / (3 * np.sqrt(3 * C)),
                        jnp.bfloat16)
        useful = 2 * x.shape[0] * 64 * H * W * C * 27 * C
        dt = chain_timed(conv3d_op, x, w)
        report("L2 conv3d 48->48 XLA 3D", dt, useful)
        w2 = depthpair_weights(np.asarray(w, np.float32), C)
        dt = chain_timed(depthpair_packed, x, w2)
        report("L2 conv3d depth-pair packed", dt, useful)
        dt = chain_timed(conv3d_strided, x, w)
        report("L2 downsample conv s2", dt, useful / 8)
        # pair-input site (96 -> 48): two convs summed
        xb = jnp.asarray(rng.normal(size=(2, 64, H, W, C)), jnp.bfloat16)
        wb = jnp.asarray(rng.normal(size=(3, 3, 3, C, C)) / (3 * np.sqrt(3 * C)),
                         jnp.bfloat16)

        def pair_conv(x, w, xb, wb):
            return conv3d_op(x, w) + conv3d_op(xb, wb)

        dt = chain_timed(pair_conv, x, w, xb, wb)
        report("L2 pair conv 96->48", dt, 2 * useful)

    if which in ("all", "tconv"):
        xs = jnp.asarray(rng.normal(size=(2, 32, 48, 48, 64)), jnp.bfloat16)
        wt = jnp.asarray(rng.normal(size=(3, 3, 3, 64, 48)) / (3 * np.sqrt(3 * 64)),
                         jnp.bfloat16)
        useful_t = 2 * 2 * 64 * 96 * 96 * 48 * 27 * 64 // 8  # avg 27/8 taps
        dt = chain_timed(tconv3d_op, xs, wt)
        report("L2 tconv 64->48 dilated-XLA", dt, useful_t)
        wsp = subpixel_weights(np.asarray(wt, np.float32), 48)
        dt = chain_timed(tconv3d_subpixel, xs, wsp)
        report("L2 tconv 64->48 subpixel", dt, useful_t)

    if which in ("all", "att"):
        # attention conv2 (C -> 1) + sigmoid + gate at L1/L0 scale
        for (d, h, w_, cm, cx, kd) in ((64, 384, 384, 16, 32, 1),
                                       (64, 192, 192, 32, 64, 1),
                                       (64, 96, 96, 48, 96, 3)):
            a1 = jnp.asarray(rng.normal(size=(2, d, h, w_, cm)), jnp.bfloat16)
            xg = jnp.asarray(rng.normal(size=(2, d, h, w_, cx)), jnp.bfloat16)
            wv = jnp.asarray(rng.normal(size=(3, 3, kd, cm, 1)) / np.sqrt(9 * cm),
                             jnp.bfloat16)

            def att_gate(a1, xg, wv, kd=kd):
                from vs_seg_tpu.nn.layers import conv3d
                att = jax.nn.sigmoid(conv3d(
                    a1, wv, None, (1, 1, 1),
                    [(1, 1), (1, 1), ((kd - 1) // 2,) * 2]))
                return att * xg + xg

            taps = 9 * kd
            useful = 2 * 2 * d * h * w_ * cm * taps
            dt = chain_timed(att_gate, a1, xg, wv)
            report(f"att conv2+gate Cm={cm} {h}x{w_} kd={kd}", dt, useful)


if __name__ == "__main__":
    main()
