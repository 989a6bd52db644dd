"""Exactness of the fused attention-gate kernel (ops/pallas_att.py) vs the
reference composition conv3d(C->1) + sigmoid + attention_gate
(nn/blocks.py:AttentionBlock1 tail + attention_gate; reference
params/networks/blocks/attentionblock.py:6-47), in Pallas interpret mode."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vs_seg_tpu.nn.layers import conv3d
from vs_seg_tpu.ops.experimental.pallas_att import can_fuse, fused_attention_gate, pick_ht


def _xla_reference(a1, xs, w2, b2, kd):
    pad = [(1, 1), (1, 1), ((kd - 1) // 2,) * 2]
    att = jax.nn.sigmoid(
        conv3d(a1, w2, b2, (1, 1, 1), pad, dtype=a1.dtype))
    return att, tuple(att.astype(x.dtype) * x + x for x in xs)


@pytest.mark.parametrize("kd,shape,cm,n_x", [
    (1, (1, 3, 16, 32), 4, 2),      # L0/L1-like (W*Cm=128)
    (3, (2, 4, 16, 16), 8, 2),      # L2-like, depth taps
    (1, (1, 2, 16, 16), 8, 1),      # single gate input
    (3, (1, 2, 16, 16), 24, 2),     # non-power-of-two Cm (L2 is 48)
])
def test_fused_attention_gate_matches_xla(kd, shape, cm, n_x):
    rng = np.random.default_rng(0)
    B, D, H, W = shape
    a1 = jnp.asarray(rng.normal(size=(B, D, H, W, cm)), jnp.float32)
    xs = tuple(jnp.asarray(rng.normal(size=(B, D, H, W, cm)), jnp.float32)
               for _ in range(n_x))
    w2 = jnp.asarray(rng.normal(size=(3, 3, kd, cm, 1)) / np.sqrt(9 * cm),
                     jnp.float32)
    b2 = jnp.asarray(rng.normal(size=(1,)), jnp.float32)

    assert can_fuse(a1.shape, [x.shape for x in xs], kd)
    att_ref, outs_ref = _xla_reference(a1, xs, w2, b2, kd)
    att, outs = fused_attention_gate(a1, xs, w2, b2, kd=kd, ht=H // 2,
                                     interpret=True)

    # wide att output: every channel lane holds the attention value
    np.testing.assert_allclose(np.asarray(att[..., :1]), np.asarray(att_ref),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(att[..., -1:]), np.asarray(att_ref),
                               atol=1e-5, rtol=1e-5)
    for o, o_ref in zip(outs, outs_ref):
        np.testing.assert_allclose(np.asarray(o), np.asarray(o_ref),
                                   atol=1e-5, rtol=1e-5)


def test_att_out_none_skips_map():
    rng = np.random.default_rng(1)
    B, D, H, W, cm = 1, 2, 16, 16, 8
    a1 = jnp.asarray(rng.normal(size=(B, D, H, W, cm)), jnp.float32)
    xs = (jnp.asarray(rng.normal(size=(B, D, H, W, cm)), jnp.float32),)
    w2 = jnp.asarray(rng.normal(size=(3, 3, 1, cm, 1)), jnp.float32)
    b2 = jnp.zeros((1,), jnp.float32)
    _, outs_ref = _xla_reference(a1, xs, w2, b2, 1)
    att, outs = fused_attention_gate(a1, xs, w2, b2, kd=1, ht=8,
                                     att_out="none", interpret=True)
    assert att is None
    np.testing.assert_allclose(np.asarray(outs[0]), np.asarray(outs_ref[0]),
                               atol=1e-5, rtol=1e-5)


def test_can_fuse_rejects_misaligned():
    assert not can_fuse((1, 2, 16, 10, 4), [(1, 2, 16, 10, 4)], 1)  # W*Cm=40
    assert not can_fuse((1, 2, 15, 32, 4), [(1, 2, 15, 32, 4)], 1)  # H=15
    assert not can_fuse((1, 2, 16, 32, 4), [(1, 2, 16, 32, 4)], 2)  # kd=2
    # channel mismatch between a1 and gate input
    assert not can_fuse((1, 2, 16, 32, 4), [(1, 2, 16, 32, 8)], 1)
    assert pick_ht(384) == 64 and pick_ht(96) == 48 and pick_ht(15) == 0
