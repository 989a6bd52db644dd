"""Exactness of the strided downsample kernel (ops/pallas_dsconv.py) vs
lax.conv (via nn/layers.py:conv3d semantics) in Pallas interpret mode,
including the fused scale/shift + PReLU epilogue and the model-site
dispatch (reference downsample Convolution, params/VSparams.py:355-369)."""

import jax.numpy as jnp
import numpy as np
import pytest

from vs_seg_tpu.nn.layers import conv3d
from vs_seg_tpu.ops.experimental.pallas_dsconv import can_ds_conv, ds_conv


def _ref(x, w, b=None):
    return conv3d(x, w, b, (2, 2, 2), [(1, 1)] * 3, dtype=x.dtype)


@pytest.mark.parametrize("shape,cin,cout", [
    ((1, 4, 8, 32), 48, 48),      # downsample_2-like
    ((2, 2, 8, 32), 40, 64),      # channel padding both sides, B > 1
    ((1, 2, 4, 64), 64, 32),      # wider W, Cout < Cin
])
def test_ds_conv_matches_lax(shape, cin, cout):
    rng = np.random.default_rng(0)
    B, D, H, W = shape
    x = jnp.asarray(rng.normal(size=(B, D, H, W, cin)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(3, 3, 3, cin, cout)) / np.sqrt(27 * cin),
                    jnp.float32)
    assert can_ds_conv(x.shape, w.shape)
    ref = _ref(x, w)
    out = ds_conv(x, w, interpret=True)
    assert out.shape == ref.shape == (B, D // 2, H // 2, W // 2, cout)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_ds_conv_epilogue():
    rng = np.random.default_rng(1)
    B, D, H, W, cin, cout = 1, 4, 8, 32, 48, 48
    x = jnp.asarray(rng.normal(size=(B, D, H, W, cin)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(3, 3, 3, cin, cout)) / np.sqrt(27 * cin),
                    jnp.float32)
    scale = jnp.asarray(rng.normal(size=(cout,)) * 0.5 + 1.0, jnp.float32)
    shift = jnp.asarray(rng.normal(size=(cout,)), jnp.float32)
    alpha = jnp.asarray(rng.uniform(0.1, 0.4, size=(cout,)), jnp.float32)

    y = _ref(x, w) * scale + shift
    ref = jnp.where(y >= 0, y, alpha * y)
    out = ds_conv(x, w, scale, shift, alpha, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)

    # bias-only epilogue (norm=None Convolution)
    ref_b = _ref(x, w, shift)
    out_b = ds_conv(x, w, shift=shift, interpret=True)
    np.testing.assert_allclose(np.asarray(out_b), np.asarray(ref_b),
                               atol=2e-5, rtol=2e-5)


def test_ds_conv_geometry_gate():
    # W/4 not a multiple of 8 (the downsample_3 site) must be rejected
    assert not can_ds_conv((1, 4, 8, 48, 64), (3, 3, 3, 64, 64))
    assert not can_ds_conv((1, 3, 8, 32, 48), (3, 3, 3, 48, 48))  # odd D
    assert not can_ds_conv((1, 4, 8, 32, 96), (3, 3, 3, 96, 48))  # Cin > 64
    assert can_ds_conv((1, 4, 8, 32, 48), (3, 3, 3, 48, 48))


def test_ds_conv_bf16():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(1, 4, 8, 32, 48)), jnp.bfloat16)
    w = jnp.asarray(rng.normal(size=(3, 3, 3, 48, 48)) / np.sqrt(27 * 48),
                    jnp.float32)
    ref = _ref(x, w.astype(jnp.bfloat16))
    out = ds_conv(x, w.astype(jnp.bfloat16), interpret=True)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        atol=1e-2, rtol=1e-2)
