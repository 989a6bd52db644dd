"""Pallas grouped 2.5D conv kernel vs lax conv (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vs_seg_tpu.ops.pallas_conv2p5 import pallas_conv2p5


@pytest.mark.parametrize("c,co,shape,ht", [
    (16, 16, (2, 16, 32), 8),
    (16, 32, (1, 32, 16), 16),
    (32, 16, (2, 8, 16), 8),
])
def test_pallas_conv_matches_lax(rng, c, co, shape, ht):
    b, h, wdim = shape
    x = jnp.asarray(rng.normal(size=(b, h, wdim, c)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(3, 3, c, co)).astype(np.float32) * 0.1)
    ref = jax.lax.conv_general_dilated(
        x, w, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    got = pallas_conv2p5(x, w, ht=ht, interpret=True, out_dtype=jnp.float32)
    assert got.shape == ref.shape
    # bf16 weights inside the kernel -> bf16-level tolerance
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=0.05, rtol=0.05)


def test_pallas_conv_boundary_rows_zero_padded(rng):
    # delta at the H borders must match zero padding, not row clamping
    c, co = 16, 16
    x = jnp.asarray(rng.normal(size=(1, 8, 16, c)).astype(np.float32))
    w = jnp.zeros((3, 3, c, co), jnp.float32).at[0, 1, 0, 0].set(1.0)
    # kernel tap (dh=0) reads row h-1: first output row must be 0
    got = pallas_conv2p5(x, w, ht=8, interpret=True, out_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(got[0, 0, :, 0]), 0.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(got[0, 1, :, 0]),
                               np.asarray(x[0, 0, :, 0]), atol=5e-3, rtol=5e-3)


def test_pallas_conv_multi_tile_grid(rng):
    # multiple H tiles + multiple batch entries exercise the linearized
    # double-buffered grid (slot reuse across b boundaries)
    c, co = 16, 16
    x = jnp.asarray(rng.normal(size=(3, 24, 16, c)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(3, 3, c, co)).astype(np.float32) * 0.1)
    ref = jax.lax.conv_general_dilated(
        x, w, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    got = pallas_conv2p5(x, w, ht=8, interpret=True, out_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=0.05, rtol=0.05)
