"""kd=1 fused block kernels (ops/pallas_block2d.py) vs the composed
nn/blocks.py modules, interpret mode."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vs_seg_tpu.nn.blocks import AttentionBlock1, ResidualUnit, attention_gate
from vs_seg_tpu.ops.experimental.pallas_block2d import l2_block2d, pick_cp, ru_block2d


def folded_affine(params, stats, unit):
    up, ub = params[unit], stats[unit]["norm"]
    inv = up["norm"]["scale"] * jax.lax.rsqrt(ub["var"] + 1e-5)
    shift = (up["norm"]["bias"] - ub["mean"] * inv
             + up["conv"]["bias"] * inv)
    return up["conv"]["kernel"], inv, shift, up["act"]["alpha"]


@pytest.mark.parametrize("shape,cin,cout,dtype", [
    ((1, 2, 16, 32), 8, 16, jnp.float32),     # cp16 g8
    ((1, 2, 16, 32), 16, 32, jnp.float32),    # cp32 g4, mixed channels
    ((2, 3, 32, 32), 1, 16, jnp.float32),     # Cin=1 (flagship L0 encoder)
    ((1, 2, 64, 32), 16, 32, jnp.float32),    # multi-H-tile
    ((1, 2, 16, 32), 16, 32, jnp.bfloat16),
])
def test_ru_block2d_matches_composed(rng, shape, cin, cout, dtype):
    B, D, H, W = shape
    x = jnp.asarray(rng.normal(size=(B, D, H, W, cin)), dtype)
    ru = ResidualUnit(features=cout, kernel_size=(3, 3, 1), subunits=2,
                      dropout=None, dtype=dtype)
    v = ru.init({"params": jax.random.key(0)}, x, train=False)
    v = jax.tree.map(lambda t: t + 0.1 if t.ndim == 1 else t, v)
    ref = ru.apply(v, x, train=False)
    p, bs = v["params"], v["batch_stats"]
    w0, s0, h0, a0 = folded_affine(p, bs, "unit0")
    w1, s1, h1, a1 = folded_affine(p, bs, "unit1")
    out = ru_block2d(x, w0=w0, bn0_scale=s0, bn0_shift=h0, alpha0=a0,
                     w1=w1, bn1_scale=s1, bn1_shift=h1, alpha1=a1,
                     wr=p["residual"]["kernel"], br=p["residual"]["bias"],
                     cp=pick_cp(cin, cout), interpret=True)
    tol = 2e-4 if dtype == jnp.float32 else 6e-2
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        atol=tol, rtol=tol)


@pytest.mark.parametrize("shape,c,cout,head,dtype", [
    ((1, 2, 16, 32), 16, 16, False, jnp.float32),   # cp16 g8
    ((1, 2, 16, 32), 32, 32, False, jnp.float32),   # cp32 g4
    ((1, 2, 16, 32), 16, 2, True, jnp.float32),     # i==0 logit head
    ((1, 2, 64, 32), 16, 16, False, jnp.float32),   # multi-H-tile
    ((2, 3, 32, 64), 16, 16, False, jnp.bfloat16),
])
def test_l2_block2d_matches_composed(rng, shape, c, cout, head, dtype):
    B, D, H, W = shape
    xa = jnp.asarray(rng.normal(size=(B, D, H, W, c)), dtype)
    xb = jnp.asarray(rng.normal(size=(B, D, H, W, c)), dtype)
    att = AttentionBlock1((3, 3, 1), dtype=dtype)
    ru = ResidualUnit(features=cout, kernel_size=(3, 3, 1), subunits=1,
                      dropout=None, last_conv_only=head, dtype=dtype)
    av = att.init({"params": jax.random.key(0)}, (xa, xb), train=False,
                  gate=False)
    rv = ru.init({"params": jax.random.key(1)}, (xa, xb), train=False)
    av = jax.tree.map(lambda t: t + 0.1 if t.ndim == 1 else t, av)
    rv = jax.tree.map(lambda t: t + 0.1 if t.ndim == 1 else t, rv)
    a, _ = att.apply(av, (xa, xb), train=False, gate=False)
    ga, gb = attention_gate(a, (xa, xb))
    ref = ru.apply(rv, (ga, gb), train=False)
    p, rp = av["params"], rv["params"]
    if head:
        scale, shift, alpha = None, rp["unit0"]["conv"]["bias"], None
    else:
        _, scale, shift, alpha = folded_affine(
            rp, rv["batch_stats"], "unit0")
    out = l2_block2d(
        xa, xb,
        w1=p["conv1"]["conv"]["kernel"], b1=p["conv1"]["conv"]["bias"],
        w2=p["conv2"]["conv"]["kernel"], b2=p["conv2"]["conv"]["bias"],
        w0=rp["unit0"]["conv"]["kernel"], bn_scale=scale, bn_shift=shift,
        alpha=alpha, wr=rp["residual"]["kernel"], br=rp["residual"]["bias"],
        cp=pick_cp(c, cout), interpret=True)
    tol = 2e-4 if dtype == jnp.float32 else 6e-2
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        atol=tol, rtol=tol)


def test_flagship_geometry_dispatch_coverage():
    """Pin which flagship sites each kernel family covers — a refactor of
    the geometry predicates must not silently shrink fused coverage
    (trace-time audit values from the round-3 build)."""
    from vs_seg_tpu.ops.experimental.pallas_block2d import can_block2d, pick_cp
    from vs_seg_tpu.ops.pallas_l2block import can_l2_block
    from vs_seg_tpu.ops.pallas_rublock import can_ru_block

    # kd=1 sites (window 384x384x64, D in dim 1)
    assert pick_cp(1, 16) == 16
    assert can_block2d((1, 64, 384, 384), 16, 1)      # encoder stem
    assert can_block2d((1, 64, 192, 192), pick_cp(16, 32), 1)  # enc L1
    assert can_block2d((1, 64, 192, 192), pick_cp(32, 32), 2)  # dec L1
    assert can_block2d((1, 64, 384, 384), pick_cp(16, 2), 2)   # logit head
    # kd=3 sites
    assert can_ru_block((1, 64, 96, 96), 32, 48)      # enc L2
    assert can_ru_block((1, 32, 48, 48), 48, 64)      # enc L3
    assert can_l2_block((1, 64, 96, 96), 48)          # dec L2
    assert can_l2_block((1, 32, 48, 48), 64)          # dec L3
    # deep levels stay on XLA (too-wide channels / misaligned nb)
    assert pick_cp(80, 80) == 0
    assert not can_ru_block((1, 16, 24, 24), 64, 80)
