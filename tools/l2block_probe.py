#!/usr/bin/env python3
"""TPU probe for the fused block mega-kernels (ops/pallas_l2block.py and
ops/pallas_rublock.py): numerics on real Mosaic, then dependent-chain
two-length differenced timing vs the composed XLA blocks at the flagship
L2 shapes.

Usage: python tools/l2block_probe.py [check|time|all|ru]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from vs_seg_tpu.nn.blocks import AttentionBlock1, ResidualUnit, attention_gate
from vs_seg_tpu.ops.pallas_l2block import l2_block
from vs_seg_tpu.ops.pallas_rublock import ru_block

REPS = 6
CHAIN_LO = 2
CHAIN_HI = 10


def sync(x):
    return float(jnp.sum(x.astype(jnp.float32)))


def build(C, dtype):
    att = AttentionBlock1((3, 3, 3), dtype=dtype)
    ru = ResidualUnit(features=C, kernel_size=(3, 3, 3), subunits=1,
                      dropout=None, dtype=dtype)
    return att, ru


def make_vars(att, ru, xa, xb):
    att_vars = att.init({"params": jax.random.key(0)}, (xa, xb),
                        train=False, gate=False)
    ru_vars = ru.init({"params": jax.random.key(1)}, (xa, xb), train=False)
    bs = ru_vars["batch_stats"]["unit0"]["norm"]
    bs = {"mean": bs["mean"] + 0.2, "var": bs["var"] * 1.5}
    ru_vars = {"params": ru_vars["params"],
               "batch_stats": {"unit0": {"norm": bs}}}
    return att_vars, ru_vars


def xla_block(att, ru, att_vars, ru_vars, xa, xb):
    a, _ = att.apply(att_vars, (xa, xb), train=False, gate=False)
    ga, gb = attention_gate(a, (xa, xb))
    return ru.apply(ru_vars, (ga, gb), train=False)


def fused_args(att_vars, ru_vars):
    p = att_vars["params"]
    rp = ru_vars["params"]
    bs = ru_vars["batch_stats"]["unit0"]["norm"]
    inv = rp["unit0"]["norm"]["scale"] * jax.lax.rsqrt(bs["var"] + 1e-5)
    shift = (rp["unit0"]["norm"]["bias"] - bs["mean"] * inv
             + rp["unit0"]["conv"]["bias"] * inv)
    return dict(
        w1=p["conv1"]["conv"]["kernel"], b1=p["conv1"]["conv"]["bias"],
        w2=p["conv2"]["conv"]["kernel"], b2=p["conv2"]["conv"]["bias"],
        w0=rp["unit0"]["conv"]["kernel"], bn_scale=inv, bn_shift=shift,
        alpha=rp["unit0"]["act"]["alpha"],
        wr=rp["residual"]["kernel"], br=rp["residual"]["bias"])


def chain_timed(fn, xa, xb):
    def step(acc, _):
        y = fn(xa + acc.astype(xa.dtype), xb + acc.astype(xb.dtype))
        return jnp.max(jnp.abs(y)).astype(jnp.float32) * 1e-12, ()

    bests = []
    for n in (CHAIN_LO, CHAIN_HI):
        @jax.jit
        def run(xa, xb):
            acc, _ = jax.lax.scan(step, jnp.float32(0.0), None, length=n)
            return acc[None]

        sync(run(xa, xb))
        best = float("inf")
        for _ in range(REPS):
            t0 = time.perf_counter()
            sync(run(xa, xb))
            best = min(best, time.perf_counter() - t0)
            time.sleep(0.5)
        bests.append(best)
    return (bests[1] - bests[0]) / (CHAIN_HI - CHAIN_LO)


def ru_fused_args(ru_vars):
    p = ru_vars["params"]
    bs = ru_vars["batch_stats"]

    def folded(u):
        up, ub = p[u], bs[u]["norm"]
        inv = up["norm"]["scale"] * jax.lax.rsqrt(ub["var"] + 1e-5)
        sh = (up["norm"]["bias"] - ub["mean"] * inv
              + up["conv"]["bias"] * inv)
        return up["conv"]["kernel"], inv, sh, up["act"]["alpha"]

    w0, s0, h0, a0 = folded("unit0")
    w1, s1, h1, a1 = folded("unit1")
    return dict(w0=w0, bn0_scale=s0, bn0_shift=h0, alpha0=a0,
                w1=w1, bn1_scale=s1, bn1_shift=h1, alpha1=a1,
                wr=p["residual"]["kernel"], br=p["residual"]["bias"])


def run_ru():
    """Encoder-block probe: flagship L2 down block (32->48ch at 96x96)."""
    rng = np.random.default_rng(0)
    for name, (B, D, H, W), check in (("enc-L2 (1,8,96,96)", (1, 8, 96, 96),
                                       True),
                                      ("enc-L2 (2,16,96,96)",
                                       (2, 16, 96, 96), False)):
        Cin, Cout = 32, 48
        x = jnp.asarray(rng.normal(size=(B, D, H, W, Cin)), jnp.bfloat16)
        ru = ResidualUnit(features=Cout, kernel_size=(3, 3, 3), subunits=2,
                          dropout=None, dtype=jnp.bfloat16)
        ru_vars = ru.init({"params": jax.random.key(0)}, x, train=False)
        ru_vars = jax.tree.map(lambda t: t + 0.1 if t.ndim == 1 else t,
                               ru_vars)
        fa = ru_fused_args(ru_vars)
        if check:
            ref = jax.jit(lambda a: ru.apply(ru_vars, a, train=False))(x)
            out = ru_block(x, **fa)
            err = float(jnp.max(jnp.abs(out.astype(jnp.float32)
                                        - ref.astype(jnp.float32))))
            print(f"{name}: max abs err {err:.3e} "
                  f"(ref absmax {float(jnp.max(jnp.abs(ref))):.2f})")
        else:
            useful = 2 * B * D * H * W * (27 * Cin * Cout + 27 * Cout * Cout
                                          + Cin * Cout)
            dt_x = chain_timed_single(
                lambda a: ru.apply(ru_vars, a, train=False), x)
            dt_p = chain_timed_single(lambda a: ru_block(a, **fa), x)
            print(f"{name}: xla {dt_x*1e3:7.2f} ms ({useful/dt_x/1e12:5.1f}"
                  f" TF/s)  fused {dt_p*1e3:7.2f} ms "
                  f"({useful/dt_p/1e12:5.1f} TF/s)  ({dt_x/dt_p:.2f}x)")
        sys.stdout.flush()


def chain_timed_single(fn, x):
    def step(acc, _):
        y = fn(x + acc.astype(x.dtype))
        return jnp.max(jnp.abs(y)).astype(jnp.float32) * 1e-12, ()

    bests = []
    for n in (CHAIN_LO, CHAIN_HI):
        @jax.jit
        def run(x):
            acc, _ = jax.lax.scan(step, jnp.float32(0.0), None, length=n)
            return acc[None]

        sync(run(x))
        best = float("inf")
        for _ in range(REPS):
            t0 = time.perf_counter()
            sync(run(x))
            best = min(best, time.perf_counter() - t0)
            time.sleep(0.5)
        bests.append(best)
    return (bests[1] - bests[0]) / (CHAIN_HI - CHAIN_LO)


def run_2d():
    """kd=1 kernels on real Mosaic: numerics at flagship-like L0/L1 shapes
    (reduced D), then chain timing at L1."""
    from vs_seg_tpu.ops.experimental.pallas_block2d import l2_block2d, pick_cp, ru_block2d

    rng = np.random.default_rng(0)
    # encoder L1: 16->32 at 192x192
    B, D, H, W, Cin, Cout = 1, 4, 192, 192, 16, 32
    x = jnp.asarray(rng.normal(size=(B, D, H, W, Cin)), jnp.bfloat16)
    ru = ResidualUnit(features=Cout, kernel_size=(3, 3, 1), subunits=2,
                      dropout=None, dtype=jnp.bfloat16)
    rv = ru.init({"params": jax.random.key(0)}, x, train=False)
    rv = jax.tree.map(lambda t: t + 0.1 if t.ndim == 1 else t, rv)
    fa = ru_fused_args(rv)
    ref = jax.jit(lambda a: ru.apply(rv, a, train=False))(x)
    out = ru_block2d(x, cp=pick_cp(Cin, Cout), **fa)
    err = float(jnp.max(jnp.abs(out.astype(jnp.float32)
                                - ref.astype(jnp.float32))))
    print(f"ru2d enc-L1 (1,4,192,192) 16->32: max abs err {err:.3e} "
          f"(ref absmax {float(jnp.max(jnp.abs(ref))):.2f})")
    sys.stdout.flush()
    dt_x = chain_timed_single(lambda a: ru.apply(rv, a, train=False), x)
    dt_p = chain_timed_single(
        lambda a: ru_block2d(a, cp=pick_cp(Cin, Cout), **fa), x)
    print(f"ru2d enc-L1 timing: xla {dt_x*1e3:7.2f} ms  "
          f"fused {dt_p*1e3:7.2f} ms  ({dt_x/dt_p:.2f}x)")
    sys.stdout.flush()

    # decoder L1: halves 32 at 192x192
    C = 32
    xa = jnp.asarray(rng.normal(size=(B, D, H, W, C)), jnp.bfloat16)
    xb = jnp.asarray(rng.normal(size=(B, D, H, W, C)), jnp.bfloat16)
    att = AttentionBlock1((3, 3, 1), dtype=jnp.bfloat16)
    ru1 = ResidualUnit(features=C, kernel_size=(3, 3, 1), subunits=1,
                       dropout=None, dtype=jnp.bfloat16)
    av = att.init({"params": jax.random.key(0)}, (xa, xb), train=False,
                  gate=False)
    r1v = ru1.init({"params": jax.random.key(1)}, (xa, xb), train=False)
    av = jax.tree.map(lambda t: t + 0.1 if t.ndim == 1 else t, av)
    r1v = jax.tree.map(lambda t: t + 0.1 if t.ndim == 1 else t, r1v)

    def xla_dec(a, b):
        m, _ = att.apply(av, (a, b), train=False, gate=False)
        ga, gb = attention_gate(m, (a, b))
        return ru1.apply(r1v, (ga, gb), train=False)

    p = av["params"]
    rp = r1v["params"]
    bs = r1v["batch_stats"]["unit0"]["norm"]
    inv = rp["unit0"]["norm"]["scale"] * jax.lax.rsqrt(bs["var"] + 1e-5)
    shift = (rp["unit0"]["norm"]["bias"] - bs["mean"] * inv
             + rp["unit0"]["conv"]["bias"] * inv)
    fd = dict(w1=p["conv1"]["conv"]["kernel"], b1=p["conv1"]["conv"]["bias"],
              w2=p["conv2"]["conv"]["kernel"], b2=p["conv2"]["conv"]["bias"],
              w0=rp["unit0"]["conv"]["kernel"], bn_scale=inv, bn_shift=shift,
              alpha=rp["unit0"]["act"]["alpha"],
              wr=rp["residual"]["kernel"], br=rp["residual"]["bias"])
    ref = jax.jit(xla_dec)(xa, xb)
    out = l2_block2d(xa, xb, cp=pick_cp(C, C), **fd)
    err = float(jnp.max(jnp.abs(out.astype(jnp.float32)
                                - ref.astype(jnp.float32))))
    print(f"l2_2d dec-L1 (1,4,192,192) C32: max abs err {err:.3e} "
          f"(ref absmax {float(jnp.max(jnp.abs(ref))):.2f})")
    sys.stdout.flush()
    dt_x = chain_timed(xla_dec, xa, xb)
    dt_p = chain_timed(lambda a, b: l2_block2d(a, b, cp=pick_cp(C, C), **fd),
                       xa, xb)
    print(f"l2_2d dec-L1 timing: xla {dt_x*1e3:7.2f} ms  "
          f"fused {dt_p*1e3:7.2f} ms  ({dt_x/dt_p:.2f}x)")


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    print(f"devices: {jax.devices()}")
    if which == "ru":
        run_ru()
        return
    if which == "2d":
        run_2d()
        return
    rng = np.random.default_rng(0)
    C = 48
    for name, (B, D, H, W) in (("L2 (1,8,96,96)", (1, 8, 96, 96)),
                               ("L2 (2,16,96,96)", (2, 16, 96, 96))):
        xa = jnp.asarray(rng.normal(size=(B, D, H, W, C)), jnp.bfloat16)
        xb = jnp.asarray(rng.normal(size=(B, D, H, W, C)), jnp.bfloat16)
        att, ru = build(C, jnp.bfloat16)
        att_vars, ru_vars = make_vars(att, ru, xa, xb)
        fa = fused_args(att_vars, ru_vars)

        if which in ("all", "check") and B == 1:
            ref = jax.jit(lambda a, b: xla_block(att, ru, att_vars, ru_vars,
                                                 a, b))(xa, xb)
            out = l2_block(xa, xb, **fa)
            err = float(jnp.max(jnp.abs(out.astype(jnp.float32)
                                        - ref.astype(jnp.float32))))
            print(f"{name}: max abs err {err:.3e} "
                  f"(ref absmax {float(jnp.max(jnp.abs(ref))):.2f})")
            sys.stdout.flush()
        if which in ("all", "time") and B == 2:
            useful = 2 * B * D * H * W * 27 * C * (96 + 96 + 1) + \
                2 * B * D * H * W * 96 * C
            dt_x = chain_timed(
                lambda a, b: xla_block(att, ru, att_vars, ru_vars, a, b),
                xa, xb)
            dt_p = chain_timed(lambda a, b: l2_block(a, b, **fa), xa, xb)
            print(f"{name}: xla {dt_x*1e3:7.2f} ms ({useful/dt_x/1e12:5.1f}"
                  f" TF/s)  fused {dt_p*1e3:7.2f} ms "
                  f"({useful/dt_p/1e12:5.1f} TF/s)  ({dt_x/dt_p:.2f}x)")
            sys.stdout.flush()


if __name__ == "__main__":
    main()
