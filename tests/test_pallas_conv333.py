"""Exactness of the banded-matmul (3,3,3) conv kernel (ops/pallas_conv333.py)
vs lax.conv (via nn/layers.py:conv3d semantics) in Pallas interpret mode,
including the fused scale/shift + PReLU epilogue."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vs_seg_tpu.nn.layers import conv3d
from vs_seg_tpu.ops.pallas_conv333 import can_conv333, conv333


def _ref(x, w, b=None):
    return conv3d(x, w, b, (1, 1, 1), [(1, 1)] * 3, dtype=x.dtype)


@pytest.mark.parametrize("shape,cin,cout", [
    ((1, 3, 16, 16), 48, 48),     # L2-like: cp=64, g=2
    ((2, 2, 16, 16), 40, 64),     # channel padding both sides, g=2
    ((1, 2, 16, 16), 96, 48),     # pair-conv: cp=128, g=1
    ((1, 2, 16, 8), 128, 128),    # full 128 channels, g=1
])
def test_conv333_matches_lax(shape, cin, cout):
    rng = np.random.default_rng(0)
    B, D, H, W = shape
    x = jnp.asarray(rng.normal(size=(B, D, H, W, cin)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(3, 3, 3, cin, cout)) / np.sqrt(27 * cin),
                    jnp.float32)
    assert can_conv333(x.shape, w.shape)
    ref = _ref(x, w)
    out = conv333(x, w, interpret=True)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_conv333_epilogue():
    rng = np.random.default_rng(1)
    B, D, H, W, cin, cout = 1, 2, 16, 16, 48, 48
    x = jnp.asarray(rng.normal(size=(B, D, H, W, cin)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(3, 3, 3, cin, cout)) / np.sqrt(27 * cin),
                    jnp.float32)
    scale = jnp.asarray(rng.normal(size=(cout,)) * 0.5 + 1.0, jnp.float32)
    shift = jnp.asarray(rng.normal(size=(cout,)), jnp.float32)
    alpha = jnp.asarray(rng.uniform(0.1, 0.4, size=(cout,)), jnp.float32)

    y = _ref(x, w) * scale + shift
    ref = jnp.where(y >= 0, y, alpha * y)
    out = conv333(x, w, scale, shift, alpha, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)

    # bias-only epilogue
    ref_b = _ref(x, w, shift)
    out_b = conv333(x, w, shift=shift, interpret=True)
    np.testing.assert_allclose(np.asarray(out_b), np.asarray(ref_b),
                               atol=2e-5, rtol=2e-5)


def test_conv333_out_padded():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(1, 2, 8, 16, 48)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(3, 3, 3, 48, 48)) / 36, jnp.float32)
    out = conv333(x, w, out_padded=True, interpret=True)
    assert out.shape == (1, 2, 8, 16, 64)
    np.testing.assert_allclose(np.asarray(out[..., 48:]), 0.0)
    np.testing.assert_allclose(np.asarray(out[..., :48]),
                               np.asarray(_ref(x, w)), atol=2e-5, rtol=2e-5)


def test_can_conv333_rejects():
    assert not can_conv333((1, 2, 8, 15, 48), (3, 3, 3, 48, 48))  # W*64%128
    assert not can_conv333((1, 2, 12, 16, 48), (3, 3, 3, 48, 48))  # H%8
    assert not can_conv333((1, 2, 8, 16, 48), (3, 3, 1, 48, 48))   # kd=1
    assert not can_conv333((1, 2, 8, 16, 130), (3, 3, 3, 130, 48))  # C>128
    assert can_conv333((2, 64, 96, 96, 48), (3, 3, 3, 48, 48))     # L2
    assert can_conv333((2, 64, 96, 96, 96), (3, 3, 3, 96, 48))     # pair
    assert can_conv333((2, 32, 48, 48, 64), (3, 3, 3, 64, 64))     # L3


def test_conv333_pair_input():
    """Pair input (xa, xb) == conv of their channel concat (the model's
    skip-connection representation, nn/layers.py:Conv3d pair path)."""
    rng = np.random.default_rng(3)
    B, D, H, W, ca, cb, cout = 1, 2, 16, 16, 48, 48, 48
    xa = jnp.asarray(rng.normal(size=(B, D, H, W, ca)), jnp.float32)
    xb = jnp.asarray(rng.normal(size=(B, D, H, W, cb)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(3, 3, 3, ca + cb, cout))
                    / np.sqrt(27 * (ca + cb)), jnp.float32)
    assert can_conv333([xa.shape, xb.shape], w.shape)
    ref = _ref(jnp.concatenate([xa, xb], axis=-1), w)
    out = conv333((xa, xb), w, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)
