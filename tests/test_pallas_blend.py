"""Pallas blend-scatter kernel vs the XLA reference implementation
(interpret mode on CPU; the same kernel runs compiled on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vs_seg_tpu.infer.sliding_window import _scatter_accumulate
from vs_seg_tpu.ops.pallas_blend import pallas_blend_scatter


@pytest.mark.parametrize("oc", [2, 4])
def test_pallas_blend_matches_xla(rng, oc):
    D, H, W = 12, 16, 16
    rd, rh, rw = 4, 8, 8
    n = 3
    preds = rng.normal(size=(n, rd, rh, rw, oc)).astype(np.float32)
    starts = np.array([[0, 0, 0], [4, 8, 8], [8, 4, 2]], dtype=np.int32)
    mask = np.array([1.0, 1.0, 0.0], dtype=np.float32)  # one masked window
    imp = rng.random((rd, rh, rw)).astype(np.float32) + 0.1

    # nonzero initial accumulators: verifies the aliased output refs see the
    # input values before the first write
    init_out = rng.normal(size=(D, H, W, oc)).astype(np.float32)
    init_w = rng.random((D, H, W, 1)).astype(np.float32)
    ref_out, ref_w = _scatter_accumulate(jnp.asarray(init_out), jnp.asarray(init_w),
                                         jnp.asarray(preds),
                                         jnp.asarray(starts), jnp.asarray(mask),
                                         jnp.asarray(imp))

    got_out, got_w = pallas_blend_scatter(jnp.asarray(init_out), jnp.asarray(init_w),
                                          jnp.asarray(preds),
                                          jnp.asarray(starts), jnp.asarray(mask),
                                          jnp.asarray(imp), interpret=True)
    np.testing.assert_allclose(np.asarray(got_out), np.asarray(ref_out),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(got_w), np.asarray(ref_w),
                               atol=1e-5, rtol=1e-5)


def test_pallas_blend_overlapping_windows(rng):
    # overlapping windows accumulate (sequential grid read-modify-write)
    D, H, W, oc = 8, 8, 8, 2
    rd, rh, rw = 4, 4, 4
    preds = np.ones((2, rd, rh, rw, oc), np.float32)
    starts = np.array([[0, 0, 0], [2, 2, 2]], dtype=np.int32)
    mask = np.ones(2, np.float32)
    imp = np.ones((rd, rh, rw), np.float32)
    out0 = jnp.zeros((D, H, W, oc), jnp.float32)
    w0 = jnp.zeros((D, H, W, 1), jnp.float32)
    out, w = pallas_blend_scatter(out0, w0, jnp.asarray(preds),
                                  jnp.asarray(starts), jnp.asarray(mask),
                                  jnp.asarray(imp), interpret=True)
    assert float(w[3, 3, 3, 0]) == 2.0  # overlap region
    assert float(w[0, 0, 0, 0]) == 1.0
    assert float(out[3, 3, 3, 0]) == 2.0
