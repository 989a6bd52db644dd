"""Exactness of the fused decoder-block mega-kernel (ops/pallas_l2block.py)
vs the composed nn/blocks.py modules (AttentionBlock1 gate + ResidualUnit)
in Pallas interpret mode."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vs_seg_tpu.nn.blocks import AttentionBlock1, ResidualUnit, attention_gate
from vs_seg_tpu.ops.pallas_l2block import can_l2_block, l2_block


def _reference(xa, xb, att_vars, ru_vars):
    att_mod = AttentionBlock1((3, 3, 3), dtype=jnp.float32)
    att, _ = att_mod.apply(att_vars, (xa, xb), train=False, gate=False)
    ga, gb = attention_gate(att, (xa, xb))
    ru = ResidualUnit(features=xa.shape[-1], kernel_size=(3, 3, 3),
                      subunits=1, dropout=None, dtype=jnp.float32)
    return ru.apply(ru_vars, (ga, gb), train=False)


@pytest.mark.parametrize("xcache,dmapre", [
    (False, False), (True, False), (False, True), (True, True)])
@pytest.mark.parametrize("tap2", [False, True])
@pytest.mark.parametrize("dims", [
    (1, 4, 16, 16, 48),   # flagship-like channels
    (1, 3, 16, 16, 33),   # odd channel count, odd depth
    (2, 5, 16, 16, 64),   # full cp, multi-batch
    (1, 1, 16, 16, 48),   # single depth plane (pipeline flush edge)
    (3, 2, 32, 16, 24),   # multi-H-tile x multi-batch
])
def test_l2block_matches_composed_blocks(dims, tap2, xcache, dmapre):
    from vs_seg_tpu.ops import pallas_l2block
    B, D, H, W, C = dims
    rng = np.random.default_rng(0)
    xa = jnp.asarray(rng.normal(size=(B, D, H, W, C)), jnp.float32)
    xb = jnp.asarray(rng.normal(size=(B, D, H, W, C)), jnp.float32)
    assert can_l2_block(xa.shape, C)

    att_mod = AttentionBlock1((3, 3, 3), dtype=jnp.float32)
    att_vars = att_mod.init({"params": jax.random.key(0)}, (xa, xb),
                            train=False, gate=False)
    ru = ResidualUnit(features=C, kernel_size=(3, 3, 3), subunits=1,
                      dropout=None, dtype=jnp.float32)
    # gate before init so shapes match the gated pair (values don't matter
    # for parameter shapes)
    ru_vars = ru.init({"params": jax.random.key(1)}, (xa, xb), train=False)
    # non-trivial BN stats so the folded affine is exercised
    bs = ru_vars["batch_stats"]["unit0"]["norm"]
    bs = {"mean": bs["mean"] + 0.2, "var": bs["var"] * 1.5}
    ru_vars = {"params": ru_vars["params"],
               "batch_stats": {"unit0": {"norm": bs}}}

    ref = _reference(xa, xb, att_vars, ru_vars)

    p = att_vars["params"]
    rp = ru_vars["params"]
    eps = 1e-5
    inv = (rp["unit0"]["norm"]["scale"]
           * jax.lax.rsqrt(bs["var"] + eps))
    shift = (rp["unit0"]["norm"]["bias"] - bs["mean"] * inv
             + rp["unit0"]["conv"]["bias"] * inv)
    pallas_l2block.FORCE_TAP2 = tap2
    pallas_l2block.FORCE_XCACHE = xcache
    pallas_l2block.FORCE_DMAPRE = dmapre
    try:
        out = l2_block(
            xa, xb,
            w1=p["conv1"]["conv"]["kernel"], b1=p["conv1"]["conv"]["bias"],
            w2=p["conv2"]["conv"]["kernel"], b2=p["conv2"]["conv"]["bias"],
            w0=rp["unit0"]["conv"]["kernel"],
            bn_scale=inv, bn_shift=shift,
            alpha=rp["unit0"]["act"]["alpha"],
            wr=rp["residual"]["kernel"], br=rp["residual"]["bias"],
            interpret=True)
    finally:
        pallas_l2block.FORCE_TAP2 = False
        pallas_l2block.FORCE_XCACHE = False
        pallas_l2block.FORCE_DMAPRE = False
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=5e-4, rtol=5e-4)
