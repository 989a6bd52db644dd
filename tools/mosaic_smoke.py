#!/usr/bin/env python3
"""Smallest-shape real-Mosaic smoke of every fused block kernel: compiles
are tiny (fastest possible miscompile signal after a relay outage), and
each kernel's output is checked exactly against the composed XLA blocks.

Usage: python tools/mosaic_smoke.py
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np

from vs_seg_tpu.nn.blocks import AttentionBlock1, ResidualUnit, attention_gate


def err_of(out, ref):
    return float(jnp.max(jnp.abs(out.astype(jnp.float32)
                                 - ref.astype(jnp.float32))))


def folded(p, bs, unit):
    up, ub = p[unit], bs[unit]["norm"]
    inv = up["norm"]["scale"] * jax.lax.rsqrt(ub["var"] + 1e-5)
    sh = up["norm"]["bias"] - ub["mean"] * inv + up["conv"]["bias"] * inv
    return up["conv"]["kernel"], inv, sh, up["act"]["alpha"]


def perturb(v):
    return jax.tree.map(lambda t: t + 0.1 if t.ndim == 1 else t, v)


def smoke_ru(kernel_size, fn, fn_kwargs, shape, cin, cout, tol):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(*shape, cin)), jnp.bfloat16)
    ru = ResidualUnit(features=cout, kernel_size=kernel_size, subunits=2,
                      dropout=None, dtype=jnp.bfloat16)
    v = perturb(ru.init({"params": jax.random.key(0)}, x, train=False))
    ref = jax.jit(lambda a: ru.apply(v, a, train=False))(x)
    p, bs = v["params"], v["batch_stats"]
    w0, s0, h0, a0 = folded(p, bs, "unit0")
    w1, s1, h1, a1 = folded(p, bs, "unit1")
    out = fn(x, w0=w0, bn0_scale=s0, bn0_shift=h0, alpha0=a0,
             w1=w1, bn1_scale=s1, bn1_shift=h1, alpha1=a1,
             wr=p["residual"]["kernel"], br=p["residual"]["bias"],
             **fn_kwargs)
    return err_of(out, ref), float(jnp.max(jnp.abs(ref)))


def smoke_l2(kernel_size, fn, fn_kwargs, shape, c, tol):
    rng = np.random.default_rng(1)
    xa = jnp.asarray(rng.normal(size=(*shape, c)), jnp.bfloat16)
    xb = jnp.asarray(rng.normal(size=(*shape, c)), jnp.bfloat16)
    att = AttentionBlock1(kernel_size, dtype=jnp.bfloat16)
    ru = ResidualUnit(features=c, kernel_size=kernel_size, subunits=1,
                      dropout=None, dtype=jnp.bfloat16)
    av = perturb(att.init({"params": jax.random.key(0)}, (xa, xb),
                          train=False, gate=False))
    rv = perturb(ru.init({"params": jax.random.key(1)}, (xa, xb),
                         train=False))

    def xla(a, b):
        m, _ = att.apply(av, (a, b), train=False, gate=False)
        ga, gb = attention_gate(m, (a, b))
        return ru.apply(rv, (ga, gb), train=False)

    ref = jax.jit(xla)(xa, xb)
    p, rp = av["params"], rv["params"]
    bs = rv["batch_stats"]["unit0"]["norm"]
    inv = rp["unit0"]["norm"]["scale"] * jax.lax.rsqrt(bs["var"] + 1e-5)
    sh = (rp["unit0"]["norm"]["bias"] - bs["mean"] * inv
          + rp["unit0"]["conv"]["bias"] * inv)
    out = fn(xa, xb,
             w1=p["conv1"]["conv"]["kernel"], b1=p["conv1"]["conv"]["bias"],
             w2=p["conv2"]["conv"]["kernel"], b2=p["conv2"]["conv"]["bias"],
             w0=rp["unit0"]["conv"]["kernel"], bn_scale=inv, bn_shift=sh,
             alpha=rp["unit0"]["act"]["alpha"],
             wr=rp["residual"]["kernel"], br=rp["residual"]["bias"],
             **fn_kwargs)
    return err_of(out, ref), float(jnp.max(jnp.abs(ref)))


def smoke_ds(tol):
    from vs_seg_tpu.nn.layers import conv3d
    from vs_seg_tpu.ops.experimental.pallas_dsconv import ds_conv

    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(1, 2, 8, 32, 16)), jnp.bfloat16)
    w = jnp.asarray(rng.normal(size=(3, 3, 3, 16, 24)) / np.sqrt(27 * 16),
                    jnp.bfloat16)
    sh = jnp.asarray(rng.normal(size=(24,)), jnp.float32)
    al = jnp.asarray(rng.uniform(0.1, 0.4, size=(24,)), jnp.float32)
    y = conv3d(x, w, None, (2, 2, 2), [(1, 1)] * 3,
               dtype=jnp.bfloat16).astype(jnp.float32) + sh
    ref = jnp.where(y >= 0, y, al * y).astype(jnp.bfloat16)
    out = ds_conv(x, w, None, sh, al)
    return err_of(out, ref), float(jnp.max(jnp.abs(ref)))


def halo_checks(tol):
    """The h-EXTENDED H blocks `halo_block_input` produces under spatial
    sharding (VERDICT r4 item 4): the fused kernels run on H = local + 2h
    geometries never exercised by the standard smokes, and this project's
    documented hazard is Mosaic DMA geometry that MISCOMPILES silently.
    Shards of the flagship L2 (H=96, W=96) and L3 (H=48, W=48) levels for
    n in {2, 4, 8}; h computed by the same helpers the model dispatch uses,
    so these rows track the real spatial path.  Output compared against the
    composed XLA blocks at the SAME extended shape (the kept-rows
    equivalence is pinned separately on the CPU mesh,
    tests/test_spatial.py)."""
    from vs_seg_tpu.models.unet2d5_spvpa import _l2_spatial_halo
    from vs_seg_tpu.nn.blocks import _ru_spatial_halo
    from vs_seg_tpu.ops.pallas_l2block import l2_block
    from vs_seg_tpu.ops.pallas_rublock import ru_block

    checks = []
    for name, full_h, w, cin, cout in (("L2", 96, 96, 32, 48),
                                       ("L3", 48, 48, 48, 64)):
        for n in (2, 4, 8):
            local = full_h // n
            shape = (1, 2, local, w)
            h_ru = _ru_spatial_halo((*shape, cin), cin, cout)
            if h_ru:
                ext = (1, 2, local + 2 * h_ru, w)
                checks.append((
                    f"rublock {name}/{n}shard Hext={ext[2]}",
                    lambda e=ext, ci=cin, co=cout: smoke_ru(
                        (3, 3, 3), ru_block, {}, e, ci, co, tol)))
            h_l2 = _l2_spatial_halo((*shape, cout), cout)
            if h_l2:
                ext = (1, 2, local + 2 * h_l2, w)
                checks.append((
                    f"l2block {name}/{n}shard Hext={ext[2]}",
                    lambda e=ext, co=cout: smoke_l2(
                        (3, 3, 3), l2_block, {}, e, co, tol)))
    return checks


def main():
    from vs_seg_tpu.ops.experimental.pallas_block2d import l2_block2d, ru_block2d
    from vs_seg_tpu.ops.pallas_l2block import l2_block
    from vs_seg_tpu.ops.pallas_rublock import ru_block

    print(f"devices: {jax.devices()}")
    tol = 8e-2
    checks = [
        ("dsconv (3,3,3)s2", lambda: smoke_ds(tol)),
        ("rublock (3,3,3)", lambda: smoke_ru(
            (3, 3, 3), ru_block, {}, (1, 2, 8, 16), 8, 16, tol)),
        ("block2d ru (3,3,1)", lambda: smoke_ru(
            (3, 3, 1), ru_block2d, {"cp": 16}, (1, 2, 8, 64), 8, 16, tol)),
        ("l2block (3,3,3)", lambda: smoke_l2(
            (3, 3, 3), l2_block, {}, (1, 2, 8, 16), 16, tol)),
        ("block2d l2 (3,3,1)", lambda: smoke_l2(
            (3, 3, 1), l2_block2d, {"cp": 16}, (1, 2, 8, 64), 16, tol)),
    ]
    if "halo" in sys.argv or "all" in sys.argv:
        checks += halo_checks(tol)
    if "halo" in sys.argv and "all" not in sys.argv:
        checks = halo_checks(tol)
    failed = False
    for name, f in checks:
        try:
            err, amax = f()
            ok = err < tol
            failed |= not ok
            print(f"{name}: max abs err {err:.3e} (absmax {amax:.2f}) "
                  f"{'OK' if ok else 'FAIL'}")
        except Exception as e:  # compile/lowering failures are the point
            failed = True
            print(f"{name}: EXCEPTION {type(e).__name__}: {e}")
        sys.stdout.flush()
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
