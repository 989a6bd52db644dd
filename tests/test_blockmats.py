"""General-g block-Toeplitz conv math (ops/blockmats.py) vs lax.conv."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vs_seg_tpu.ops.blockmats import (
    build_colcast_mats_g, build_mats_g, build_res_mats_g, flat_rows,
    reference_conv_flat, unflat_rows,
)


def dense_conv2d(x, w):
    """(planes, H, W, Cin) (3,3) same-pad conv via lax."""
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


@pytest.mark.parametrize("cp,cin,cout", [(64, 48, 48), (32, 16, 32),
                                         (32, 32, 32), (16, 16, 16),
                                         (16, 1, 16), (16, 9, 11)])
def test_build_mats_g_matches_lax_conv(rng, cp, cin, cout):
    planes, H, W = 3, 8, 128 // cp * 8
    x = jnp.asarray(rng.normal(size=(planes, H, W, cin)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(3, 3, 1, cin, cout)) * 0.2, jnp.float32)
    ref = dense_conv2d(x, w[:, :, 0])

    mains, edges = build_mats_g(w, cp)
    nb = (W * cp) // 128
    rows = flat_rows(x[:, None], cp)  # (planes,1,H,W,C) -> plane-major rows
    out = reference_conv_flat(rows, mains, edges, nb, planes)
    got = unflat_rows(out, (planes, 1, H, W, cout), cp)[:, 0]
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("cp,cin", [(32, 16), (16, 8), (64, 48)])
def test_colcast_mats_g_broadcast_attention(rng, cp, cin):
    """C->1 colcast conv: every lane of a position block must hold that
    position's attention value."""
    planes, H, W = 2, 8, 128 // cp * 8
    g = 128 // cp
    x = jnp.asarray(rng.normal(size=(planes, H, W, cin)), jnp.float32)
    w2 = jnp.asarray(rng.normal(size=(3, 3, 1, cin, 1)) * 0.2, jnp.float32)
    ref = dense_conv2d(x, w2[:, :, 0])  # (planes, H, W, 1)

    mains, edges = build_colcast_mats_g(w2, cp)
    nb = (W * cp) // 128
    rows = flat_rows(x[:, None], cp)
    out = reference_conv_flat(rows, mains, edges, nb, planes)
    wide = out.reshape(planes, H, nb, g, cp)
    # every channel lane of each position equals the scalar conv output
    ref_pos = np.asarray(ref[..., 0]).reshape(planes, H, nb, g)
    np.testing.assert_allclose(np.asarray(wide),
                               ref_pos[..., None] * np.ones(cp), atol=1e-4,
                               rtol=1e-4)


def test_res_mats_g_position_preserving(rng):
    cp, cins, cout = 32, (16, 16), 24
    g = 128 // cp
    planes, H, W = 1, 8, g * 8
    xs = [jnp.asarray(rng.normal(size=(planes, H, W, c)), jnp.float32)
          for c in cins]
    wr = jnp.asarray(rng.normal(size=(1, 1, 1, sum(cins), cout)) * 0.3,
                     jnp.float32)
    ref = jax.lax.conv_general_dilated(
        jnp.concatenate(xs, -1), wr[:, :, 0], (1, 1), [(0, 0), (0, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))

    mats = build_res_mats_g(wr, cins, cout, cp)
    acc = 0
    for x, m in zip(xs, mats):
        acc = acc + flat_rows(x[:, None], cp).astype(jnp.float32) @ m
    got = unflat_rows(acc, (planes, 1, H, W, cout), cp)[:, 0]
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)
