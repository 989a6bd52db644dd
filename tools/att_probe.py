#!/usr/bin/env python3
"""TPU probe for the fused attention-gate kernel (ops/pallas_att.py):
numerics vs the XLA path on real Mosaic, then in-chain timing at the
flagship attention-site shapes (docs: upatt_0/1/2 cost ~33 ms/volume of
copies+conv2+gate in the round-2 inference trace).

Usage: python tools/att_probe.py [check|time|all]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from vs_seg_tpu.nn.layers import conv3d
from vs_seg_tpu.ops.experimental.pallas_att import fused_attention_gate

REPS = 3


def sync(x):
    return float(jnp.sum(x.astype(jnp.float32)))


def xla_path(a1, xs, w2, b2, kd):
    pad = [(1, 1), (1, 1), ((kd - 1) // 2,) * 2]
    att = jax.nn.sigmoid(conv3d(a1, w2, b2, (1, 1, 1), pad, dtype=a1.dtype))
    return att, tuple(att.astype(x.dtype) * x + x for x in xs)


def make_site(rng, B, D, H, W, cm, cx, kd, dtype=jnp.bfloat16):
    a1 = jnp.asarray(rng.normal(size=(B, D, H, W, cm)), dtype)
    xs = tuple(jnp.asarray(rng.normal(size=(B, D, H, W, cx)), dtype)
               for _ in range(2))
    w2 = jnp.asarray(rng.normal(size=(3, 3, kd, cm, 1)) / np.sqrt(9 * cm),
                     jnp.float32)
    b2 = jnp.asarray(rng.normal(size=(1,)), jnp.float32)
    return a1, xs, w2, b2


def check(rng):
    # L2-like shape, bf16, real Mosaic lowering
    a1, xs, w2, b2 = make_site(rng, 1, 8, 96, 96, 48, 48, 3)
    att_r, outs_r = jax.jit(lambda *a: xla_path(*a, kd=3))(a1, xs, w2, b2)
    att, outs = fused_attention_gate(a1, xs, w2, b2, kd=3, ht=48)
    err_att = float(jnp.max(jnp.abs(att[..., :1].astype(jnp.float32)
                                    - att_r.astype(jnp.float32))))
    errs = [float(jnp.max(jnp.abs(o.astype(jnp.float32)
                                  - r.astype(jnp.float32))))
            for o, r in zip(outs, outs_r)]
    print(f"kd=3 L2 96x96: att err {err_att:.3e}, gate errs {errs}")
    a1, xs, w2, b2 = make_site(rng, 1, 8, 384, 384, 16, 16, 1)
    att_r, outs_r = jax.jit(lambda *a: xla_path(*a, kd=1))(a1, xs, w2, b2)
    att, outs = fused_attention_gate(a1, xs, w2, b2, kd=1, ht=64)
    err_att = float(jnp.max(jnp.abs(att[..., :1].astype(jnp.float32)
                                    - att_r.astype(jnp.float32))))
    print(f"kd=1 L0 384x384: att err {err_att:.3e}")
    sys.stdout.flush()


def chain_timed(fn, args, n=8):
    def step(acc, _):
        att, outs = fn(*args)
        s = jnp.max(jnp.abs(outs[0])).astype(jnp.float32)
        return acc + s * 1e-12, ()

    @jax.jit
    def run(*args):
        acc, _ = jax.lax.scan(step, jnp.float32(0.0), None, length=n)
        return acc[None]

    sync(run(*args))
    best = float("inf")
    for _ in range(REPS):
        t0 = time.perf_counter()
        sync(run(*args))
        best = min(best, time.perf_counter() - t0)
    return best / n


def timing(rng):
    for name, (B, D, H, W, cm, cx, kd) in (
            ("L0 (16ch 384x384)", (2, 64, 384, 384, 16, 16, 1)),
            ("L1 (32ch 192x192)", (2, 64, 192, 192, 32, 32, 1)),
            ("L2 (48ch 96x96)", (2, 64, 96, 96, 48, 48, 3))):
        args = make_site(rng, B, D, H, W, cm, cx, kd)
        dt_x = chain_timed(lambda *a: xla_path(*a, kd=kd), args)
        ht = 64 if H % 64 == 0 else 48
        dt_p = chain_timed(
            lambda *a: fused_attention_gate(*a, kd=kd, ht=ht,
                                            att_out="none"), args)
        print(f"{name}: xla {dt_x*1e3:7.2f} ms   pallas {dt_p*1e3:7.2f} ms "
              f"({dt_x/dt_p:.2f}x)")
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
