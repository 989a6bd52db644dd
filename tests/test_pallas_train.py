"""Train-mode conv with Pallas banded backward (ops/pallas_train.py):
value and GRADIENT parity vs the XLA conv path, interpret mode on CPU.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vs_seg_tpu.ops.experimental import pallas_train
from vs_seg_tpu.ops.experimental.pallas_train import (
    can_train_conv, conv333_dw, conv333_train, db_extract, dw_extract,
)

_DN3 = ("NDHWC", "DHWIO", "NDHWC")


def _xla_conv(x, w, b, dtype):
    xc = x.astype(dtype)
    wc = w.astype(dtype)
    y = jax.lax.conv_general_dilated(
        xc, jnp.transpose(wc, (2, 0, 1, 3, 4)), (1, 1, 1), [(1, 1)] * 3,
        dimension_numbers=_DN3,
        precision=(jax.lax.Precision.HIGHEST
                   if dtype == jnp.float32 else None))
    return y + b.astype(y.dtype)


@pytest.mark.parametrize("cin,cout", [(8, 16), (16, 16), (3, 5)])
def test_dw_gram_matches_vjp(rng, cin, cout):
    """conv333_dw Gram blocks + extraction == jax.vjp's dw/db (f32)."""
    B, D, H, W = 1, 3, 16, 32
    x = jnp.asarray(rng.normal(size=(B, D, H, W, cin)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(3, 3, 3, cin, cout)) * 0.2, jnp.float32)
    b = jnp.asarray(rng.normal(size=(cout,)), jnp.float32)
    dy = jnp.asarray(rng.normal(size=(B, D, H, W, cout)), jnp.float32)

    _, vjp = jax.vjp(lambda w_, b_: _xla_conv(x, w_, b_, jnp.float32), w, b)
    dw_ref, db_ref = vjp(dy)

    gm, ge, db = conv333_dw(x, dy, interpret=True)
    dw = dw_extract(gm, ge, cin, cout)
    np.testing.assert_allclose(np.asarray(dw), np.asarray(dw_ref),
                               atol=1e-3, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(db_extract(db, cout)),
                               np.asarray(db_ref), atol=1e-3, rtol=1e-4)


def test_conv333_train_value_and_grads_f32(rng):
    """The custom_vjp wrapper (f32): identical forward, matching grads."""
    B, D, H, W, cin, cout = 1, 4, 8, 32, 12, 20
    assert can_train_conv((B, D, H, W, cin), (3, 3, 3, cin, cout))
    x = jnp.asarray(rng.normal(size=(B, D, H, W, cin)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(3, 3, 3, cin, cout)) * 0.2, jnp.float32)
    b = jnp.asarray(rng.normal(size=(cout,)), jnp.float32)

    def loss(f):
        return lambda x_, w_, b_: jnp.sum(jnp.square(f(x_, w_, b_)))

    v_ref, g_ref = jax.value_and_grad(
        loss(lambda *a: _xla_conv(*a, jnp.float32)), argnums=(0, 1, 2))(
        x, w, b)
    v, g = jax.value_and_grad(
        loss(lambda *a: conv333_train(*a, dtype=jnp.float32,
                                      interpret=True)),
        argnums=(0, 1, 2))(x, w, b)
    assert float(v) == float(v_ref)  # identical forward (same XLA program)
    for got, want in zip(g, g_ref):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-3, rtol=1e-3)


def test_conv333_train_grads_bf16_vs_f32_truth(rng):
    """bf16: the fused backward must match the EXACT backward of the same
    bf16-rounded operands (computed in f32). XLA's own bf16 backward
    accumulates dw/db in bf16 and deviates from this truth by up to ~18%
    on cancellation-heavy sums (measured on this data) — our f32
    accumulation is strictly closer, so the truth, not XLA, is the
    reference here."""
    B, D, H, W, cin, cout = 1, 4, 8, 32, 12, 20
    x = jnp.asarray(rng.normal(size=(B, D, H, W, cin)), jnp.bfloat16)
    w = jnp.asarray(rng.normal(size=(3, 3, 3, cin, cout)) * 0.2, jnp.float32)
    b = jnp.asarray(rng.normal(size=(cout,)), jnp.float32)

    fused = lambda x_, w_, b_: conv333_train(x_, w_, b_,
                                             dtype=jnp.bfloat16,
                                             interpret=True)
    y, vjp = jax.vjp(fused, x, w, b)
    dy = (2.0 * y.astype(jnp.float32)).astype(jnp.bfloat16)
    dx, dw, db = vjp(dy)

    # exact backward of the same bf16-rounded operands, f32 arithmetic
    x32 = x.astype(jnp.float32)
    w32 = w.astype(jnp.bfloat16).astype(jnp.float32)
    dy32 = dy.astype(jnp.float32)
    _, vjp32 = jax.vjp(
        lambda x_, w_: _xla_conv(x_, w_, jnp.zeros((cout,)), jnp.float32),
        x32, w32)
    dx_t, dw_t = vjp32(dy32)
    db_t = jnp.sum(dy32, axis=(0, 1, 2, 3))

    # dx is bf16-rounded on output; dw/db are f32 (reassociation only)
    np.testing.assert_allclose(np.asarray(dx, np.float32),
                               np.asarray(dx_t), atol=1e-3, rtol=1e-2)
    np.testing.assert_allclose(np.asarray(dw), np.asarray(dw_t),
                               atol=1e-2, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(db), np.asarray(db_t),
                               atol=1e-2, rtol=1e-3)


def test_train_step_gradients_match_with_fused_backward(rng, monkeypatch):
    """Model-level pin: a full spvPA train-mode loss gradient with the
    fused conv backward force-enabled equals the XLA gradient."""
    from tests.test_model import SMALL
    from vs_seg_tpu.losses.dice import dice_spvpa_loss
    from vs_seg_tpu.models import UNet2d5_spvPA

    model = UNet2d5_spvPA(out_channels=2, num_res_units=2, dropout=0.1,
                          attention_module=True, dtype=jnp.float32, **SMALL)
    x = jnp.asarray(rng.normal(size=(1, 8, 16, 32, 1)), jnp.float32)
    yl = jnp.asarray((rng.random((1, 8, 16, 32, 1)) > 0.8), jnp.float32)
    variables = model.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        x, train=True)

    def loss_fn(params):
        out, new_bs = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            x, train=True, mutable=["batch_stats"],
            rngs={"dropout": jax.random.key(7)})
        logits, atts = out
        return dice_spvpa_loss(logits, atts, yl)

    ref_loss, ref_grads = jax.value_and_grad(loss_fn)(variables["params"])

    monkeypatch.setattr(pallas_train, "FORCE_INTERPRET", True)
    calls = {"n": 0}
    real = pallas_train.conv333_train

    def counting(*a, **k):
        calls["n"] += 1
        return real(*a, **k)

    monkeypatch.setattr(pallas_train, "conv333_train", counting)
    loss, grads = jax.value_and_grad(loss_fn)(variables["params"])
    assert calls["n"] > 0, "fused train conv never dispatched"
    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-6)
    flat_r, _ = jax.tree_util.tree_flatten(ref_grads)
    flat_g, _ = jax.tree_util.tree_flatten(grads)
    for got, want in zip(flat_g, flat_r):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-4, rtol=2e-3)
