#!/usr/bin/env python3
"""Microbench: candidate formulations for the small-channel 2.5D convs that
dominate the flagship forward (reference levels L0/L1, kernels (3,3,1),
C=16/32 — see docs/KERNELS.md). In-graph lax.scan chains (dispatch-latency
free), scalar-readback sync (block_until_ready is a no-op on axon).

Usage: python tools/conv_bench.py [L0|L1|all]
"""

import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from vs_seg_tpu.ops.experimental.widthpack import widthpack_kernel

CHAIN = 16  # convs chained per scan step
STEPS = 4


def timed(fn, *args, reps=3):
    fn_j = jax.jit(fn)
    out = fn_j(*args)
    float(jnp.sum(out.astype(jnp.float32)))  # compile+sync
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn_j(*args)
        float(jnp.sum(out.astype(jnp.float32)))
        best = min(best, time.perf_counter() - t0)
    return best / (CHAIN * STEPS)


def chain(op, x, w):
    """Run op(x, w) CHAIN*STEPS times in-graph; op must map (x, w) -> y with
    y.shape == x.shape (C_in == C_out)."""

    def step(carry, _):
        y = carry
        for _ in range(CHAIN):
            y = op(y, w)
        # keep magnitudes bounded
        y = y * (0.9 / jnp.maximum(jnp.max(jnp.abs(y)), 1e-3))
        return y, ()

    y, _ = jax.lax.scan(step, x, None, length=STEPS)
    return y


def conv2d_xla(x, w):
    # x (BD, H, W, C), w (3, 3, C, C)
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def conv2d_widthpack(p):
    def op(x, w):
        bd, h, W, c = x.shape
        w2 = widthpack_kernel(w, p)
        xp = x.reshape(bd, h, W // p, p * c)
        y = jax.lax.conv_general_dilated(
            xp, w2, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return y.reshape(bd, h, W, c)
    return op


def matmul_rate(m, k, n, dtype=jnp.bfloat16):
    a = jnp.ones((m, k), dtype)
    ws = jnp.asarray(np.random.default_rng(0).normal(
        size=(CHAIN * STEPS, k, n)) * 0.01, dtype)

    def run(a, ws):
        def step(acc, w):
            return acc + jnp.sum(jnp.dot(a, w, preferred_element_type=jnp.float32)), ()
        acc, _ = jax.lax.scan(step, jnp.float32(0.0), ws)
        return acc[None]

    fn = jax.jit(run)
    float(jnp.sum(fn(a, ws)))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(jnp.sum(fn(a, ws)))
        best = min(best, time.perf_counter() - t0)
    dt = best / (CHAIN * STEPS)
    return 2 * m * k * n / dt / 1e12, dt


def bench_level(name, bd, h, W, c):
    x = jnp.asarray(np.random.default_rng(0).normal(size=(bd, h, W, c)),
                    jnp.bfloat16)
    w = jnp.asarray(np.random.default_rng(1).normal(
        size=(3, 3, c, c)) / (3 * np.sqrt(c)), jnp.bfloat16)
    flops = 2 * bd * h * W * c * 9 * c
    print(f"--- {name}: x ({bd},{h},{W},{c}) useful {flops/1e9:.1f} GFLOP/conv")
    dt = timed(lambda x, w: chain(conv2d_xla, x, w), x, w)
    print(f"xla_folded2d     {dt*1e3:8.3f} ms  {flops/dt/1e12:6.2f} TFLOP/s")
    for p in (2, 4, 8):
        if (p * c) % 8 or W % p:
            continue
        dt = timed(lambda x, w: chain(conv2d_widthpack(p), x, w), x, w)
        print(f"widthpack p={p}    {dt*1e3:8.3f} ms  {flops/dt/1e12:6.2f} TFLOP/s "
              f"(packed C={p*c})")
    sys.stdout.flush()


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    print(f"devices: {jax.devices()}")
    if which in ("L0", "all"):
        bench_level("L0 (16ch, 384x384, BD=64)", 64, 384, 384, 16)
    if which in ("L1", "all"):
        bench_level("L1 (32ch, 192x192, BD=64)", 64, 192, 192, 32)
    if which in ("mm", "all"):
        # matmul ceilings for the Pallas block-matmul design (M scaled 1/8 of
        # L0 to keep operands uploadable over the relay; rate is M-invariant
        # at this size)
        m = 64 * 384 * 6
        for (k, n) in ((384, 128), (128, 128), (96, 128)):
            rate, dt = matmul_rate(m, k, n)
            print(f"matmul M={m} K={k} N={n}: {dt*1e3:8.3f} ms {rate:6.1f} TFLOP/s")
            sys.stdout.flush()


if __name__ == "__main__":
    main()
