"""Exactness tests for the fused kd=1 decoder tail (ops/pallas_tail2d.py):
conv2 + sigmoid + gate + unit0 + 1x1 residual, kernel vs a composed jnp
oracle and at model level (interpret mode on CPU).

Reference semantics: attentionblock.py:6-47, convolutions.py:159-255 as
composed at the (3,3,1) decoder levels of unet2d5_spvPA.py:174-202.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vs_seg_tpu.nn.layers import conv3d, same_padding
from vs_seg_tpu.ops.experimental import pallas_tail2d


def _ref_tail(a1, xa, xb, w2, b2, w0, scale, shift, alpha, wr, br):
    """Composed-ops oracle (f32): what the unfused XLA chain computes."""
    pads = [(p, p) for p in same_padding((3, 3, 1))]
    att = jax.nn.sigmoid(
        conv3d(a1, w2, b2, (1, 1, 1), pads, dtype=jnp.float32))
    ga = att * xa + xa
    gb = att * xb + xb
    ch = xa.shape[-1]
    y = (conv3d(ga, w0[..., :ch, :], None, (1, 1, 1), pads,
                dtype=jnp.float32)
         + conv3d(gb, w0[..., ch:, :], None, (1, 1, 1), pads,
                  dtype=jnp.float32))
    if scale is not None:
        y = y * scale + shift
        y = jnp.maximum(y, 0) + alpha * jnp.minimum(y, 0)
    else:
        y = y + shift
    z = [(0, 0)] * 3
    res = (conv3d(ga, wr[..., :ch, :], None, (1, 1, 1), z, dtype=jnp.float32)
           + conv3d(gb, wr[..., ch:, :], br, (1, 1, 1), z,
                    dtype=jnp.float32))
    return y + res


@pytest.mark.parametrize("ca,ch,cout,head", [
    (8, 16, 2, True),     # up_0-style: packed logit head (4*cout <= cp)
    (16, 16, 16, False),  # up_1-style: banded out (cout == cp)
])
def test_tail2d_matches_oracle(rng, ca, ch, cout, head):
    B, D, H, W = 1, 3, 96, 64   # nb = 8, ht = 48 -> 2 H tiles, 3 planes
    f = lambda *s: jnp.asarray(rng.normal(size=s), jnp.float32) * 0.5
    a1 = jnp.maximum(f(B, D, H, W, ca), 0)
    xa, xb = f(B, D, H, W, ch), f(B, D, H, W, ch)
    w2, b2 = f(3, 3, 1, ca, 1), f(1)
    w0 = f(3, 3, 1, 2 * ch, cout)
    wr, br = f(1, 1, 1, 2 * ch, cout), f(cout)
    if head:
        scale = alpha = None
        shift = f(cout)
    else:
        scale, shift = f(cout) + 1.0, f(cout)
        alpha = f(1) * 0.1 + 0.25
    ref = _ref_tail(a1, xa, xb, w2, b2, w0, scale, shift, alpha, wr, br)
    cp = pallas_tail2d.pick_cp(ca, ch, cout)
    assert pallas_tail2d.can_tail2d(a1.shape, ca, ch, cout)
    out = pallas_tail2d.tail_block(
        a1, xa, xb, w2=w2, b2=b2, w0=w0, bn_scale=scale, bn_shift=shift,
        alpha=alpha, wr=wr, br=br, cout=cout, cp=cp, interpret=True)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)


def test_tail2d_single_tile_single_plane(rng):
    """Degenerate grid (one tile, one plane): the clamped halo DMAs read
    in-bounds garbage that the t==0/t==nt-1 masks must fully zero."""
    B, D, H, W, ch, cout = 1, 1, 48, 64, 8, 2
    f = lambda *s: jnp.asarray(rng.normal(size=s), jnp.float32) * 0.5
    a1 = jnp.maximum(f(B, D, H, W, ch), 0)
    xa, xb = f(B, D, H, W, ch), f(B, D, H, W, ch)
    w2, b2 = f(3, 3, 1, ch, 1), f(1)
    w0, wr, br = f(3, 3, 1, 2 * ch, cout), f(1, 1, 1, 2 * ch, cout), f(cout)
    shift = f(cout)
    ref = _ref_tail(a1, xa, xb, w2, b2, w0, None, shift, None, wr, br)
    out = pallas_tail2d.tail_block(
        a1, xa, xb, w2=w2, b2=b2, w0=w0, bn_scale=None, bn_shift=shift,
        alpha=None, wr=wr, br=br, cout=cout,
        cp=pallas_tail2d.pick_cp(ch, ch, cout), interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)


def test_fused_tail2d_matches_reference_model():
    """Model-level: with the tail2d route forced (interpret), the full
    forward must reproduce the unfused XLA path at eval.  The 3-level
    config fuses BOTH kd=1 decoder levels: up_0 (packed logit head) and
    up_1 (banded out, cout == cp)."""
    from vs_seg_tpu.models.unet2d5_spvpa import UNet2d5_spvPA

    cfg = dict(channels=(8, 16, 32), strides=((2, 2, 1), (2, 2, 2)),
               kernel_sizes=((3, 3, 1), (3, 3, 1), (3, 3, 3)),
               sample_kernel_sizes=((3, 3, 1), (3, 3, 3)))
    model = UNet2d5_spvPA(out_channels=2, num_res_units=2, dropout=None,
                          attention_module=True, dtype=jnp.float32, **cfg)
    x = jnp.asarray(
        np.random.default_rng(5).normal(size=(1, 4, 128, 128, 1)),
        jnp.float32)
    variables = model.init({"params": jax.random.key(0)}, x, train=False)
    variables = jax.tree.map(
        lambda v: v + 0.1 if v.ndim == 1 else v, variables)

    logits_ref, atts_ref = model.apply(variables, x, train=False)
    assert not pallas_tail2d.fusion_enabled(0)
    pallas_tail2d.FORCE_INTERPRET = True
    try:
        assert pallas_tail2d.fusion_enabled(0)
        logits, atts = model.apply(variables, x, train=False)
    finally:
        pallas_tail2d.FORCE_INTERPRET = False

    np.testing.assert_allclose(np.asarray(logits), np.asarray(logits_ref),
                               atol=2e-4, rtol=2e-4)
    for a, r in zip(atts, atts_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                   atol=2e-4, rtol=2e-4)
