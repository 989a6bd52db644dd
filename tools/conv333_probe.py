#!/usr/bin/env python3
"""TPU probe for the banded-matmul (3,3,3) conv kernel (ops/pallas_conv333.py):
numerics vs lax.conv on real Mosaic, then in-chain timing at the flagship
L2/L3 shapes (XLA 3D conv measured 8.4 ms @ 17.5 TFLOP/s at L2 — the
FLOP-heaviest level; docs/KERNELS.md).

Usage: python tools/conv333_probe.py [check|time|all]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from vs_seg_tpu.nn.layers import conv3d
from vs_seg_tpu.ops.pallas_conv333 import conv333

REPS = 6
# Relay dispatch + scalar-readback overhead is ~30 ms per sync — at D=16
# shapes that dwarfs the op. Difference two chain lengths so the fixed
# overhead cancels: dt = (t_hi - t_lo) / (CHAIN_HI - CHAIN_LO).
CHAIN_LO = 2
CHAIN_HI = 18


def sync(x):
    return float(jnp.sum(x.astype(jnp.float32)))


def xla_conv(x, w):
    if isinstance(x, tuple):  # model pair path (nn/layers.py:Conv3d): two
        ca = x[0].shape[-1]   # convs summed, no materialized concat
        ya = conv3d(x[0], w[..., :ca, :], None, (1, 1, 1), [(1, 1)] * 3,
                    dtype=x[0].dtype)
        yb = conv3d(x[1], w[..., ca:, :], None, (1, 1, 1), [(1, 1)] * 3,
                    dtype=x[1].dtype)
        return ya + yb
    return conv3d(x, w, None, (1, 1, 1), [(1, 1)] * 3, dtype=x.dtype)


def make(rng, B, D, H, W, cin, cout, dtype=jnp.bfloat16):
    cins = cin if isinstance(cin, tuple) else (cin,)
    xs = tuple(jnp.asarray(rng.normal(size=(B, D, H, W, c)), dtype)
               for c in cins)
    w = jnp.asarray(
        rng.normal(size=(3, 3, 3, sum(cins), cout)) / np.sqrt(27 * sum(cins)),
        jnp.float32)
    return (xs if len(xs) > 1 else xs[0]), w


def check(rng):
    for name, dims in (("L2 48->48 96x96", (1, 8, 96, 96, 48, 48)),
                       ("pair 96->48 96x96", (1, 8, 96, 96, 96, 48)),
                       ("L3 64->64 48x48", (1, 8, 48, 48, 64, 64))):
        x, w = make(rng, *dims)
        ref = jax.jit(xla_conv)(x, w)
        out = conv333(x, w)
        err = float(jnp.max(jnp.abs(out.astype(jnp.float32)
                                    - ref.astype(jnp.float32))))
        scale = float(jnp.max(jnp.abs(ref.astype(jnp.float32))))
        print(f"{name}: max abs err {err:.3e} (ref max {scale:.2f})")
        sys.stdout.flush()


def chain_timed(fn, args):
    # perturb EVERY input by the carry so XLA cannot hoist any part of the
    # body (perturbing only one pair half lets XLA hoist the other conv)
    def step(acc, _):
        x0 = args[0]
        if isinstance(x0, tuple):
            x0 = tuple(v + acc.astype(v.dtype) for v in x0)
        else:
            x0 = x0 + acc.astype(x0.dtype)
        y = fn(x0, *args[1:])
        return jnp.max(jnp.abs(y)).astype(jnp.float32) * 1e-12, ()

    def make(n):
        @jax.jit
        def run(*args):
            acc, _ = jax.lax.scan(step, jnp.float32(0.0), None, length=n)
            return acc[None]
        return run

    bests = []
    for n in (CHAIN_LO, CHAIN_HI):
        run = make(n)
        sync(run(*args))
        best = float("inf")
        for _ in range(REPS):
            t0 = time.perf_counter()
            sync(run(*args))
            best = min(best, time.perf_counter() - t0)
        bests.append(best)
    return (bests[1] - bests[0]) / (CHAIN_HI - CHAIN_LO)


def timing(rng):
    # D shrunk 64->16 (per-element behavior unchanged; keeps the remote
    # compiler's program size under its crash threshold)
    for name, dims in (("truepair (48,48)->48 96x96", (2, 16, 96, 96, (48, 48), 48)),
                       ("L4 80->80 (2,16,24,24) g=1", (2, 16, 24, 24, 80, 80)),
                       ("L4 pair (80,80)->80 g=1", (2, 16, 24, 24, (80, 80), 80)),
                       ("L2 48->48 (2,16,96,96)", (2, 16, 96, 96, 48, 48)),
                       ("pair 96->48 (2,16,96,96)", (2, 16, 96, 96, 96, 48)),
                       ("L3 64->64 (2,16,48,48)", (2, 16, 48, 48, 64, 64))):
        B, D, H, W, cin, cout = dims
        x, w = make(rng, *dims)
        cin_t = sum(cin) if isinstance(cin, tuple) else cin
        useful = 2 * B * D * H * W * cout * 27 * cin_t
        dt_x = chain_timed(xla_conv, (x, w))
        dt_p = chain_timed(lambda x, w: conv333(x, w, out_padded=True),
                           (x, w))
        # epilogue-fused variant (scale/shift/prelu)
        sc = jnp.ones((cout,), jnp.float32)
        sh = jnp.zeros((cout,), jnp.float32)
        al = jnp.full((cout,), 0.25, jnp.float32)
        dt_e = chain_timed(
            lambda x, w, sc, sh, al: conv333(x, w, sc, sh, al,
                                             out_padded=True),
            (x, w, sc, sh, al))
        print(f"{name}: xla {dt_x*1e3:7.2f} ms ({useful/dt_x/1e12:5.1f} TF/s)"
              f"  pallas {dt_p*1e3:7.2f} ms ({useful/dt_p/1e12:5.1f} TF/s)"
              f"  +epilogue {dt_e*1e3:7.2f} ms  ({dt_x/dt_p:.2f}x)")
        sys.stdout.flush()


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    print(f"devices: {jax.devices()}")
    rng = np.random.default_rng(0)
    if which in ("all", "check"):
        check(rng)
    if which in ("all", "time"):
        timing(rng)


if __name__ == "__main__":
    main()
