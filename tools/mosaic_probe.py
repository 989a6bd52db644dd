#!/usr/bin/env python3
"""Probe which Mosaic primitives compile (and how fast) for the attention
kernel's channel-group reduction: in-kernel reshape variants, 3D tiles,
dot_general against a 0/1 group matrix, interleaved lane repeat, sublane
rolls.  Each case is a tiny standalone pallas_call run on the real TPU.

Usage: python tools/mosaic_probe.py [case ...]   (default: all)
"""

import sys
import traceback
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

HT, W, CM = 48, 96, 48
WC = W * CM


def sync(x):
    return float(jnp.sum(x.astype(jnp.float32)))


def run(name, fn):
    try:
        out = fn()
        print(f"[OK]   {name}: {out}")
    except Exception as e:
        msg = str(e).split("\n")[0][:160]
        print(f"[FAIL] {name}: {type(e).__name__}: {msg}")
    sys.stdout.flush()


# 1. the failing op: 2D -> 3D lane-split reshape + lane reduce
def case_reshape3d(cm=CM):
    w = WC // cm

    def k(x_ref, o_ref):
        x = x_ref[...]
        o_ref[...] = jnp.sum(x.reshape(HT, w, cm), axis=-1)

    x = jnp.ones((HT, WC), jnp.float32)
    out = pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((HT, w), jnp.float32))(x)
    return f"sum={sync(out)} (expect {HT*w*cm})"


# 2. 3D tile in, lane reduce keeping 3D
def case_3dtile():
    def k(x_ref, o_ref):
        o_ref[...] = jnp.sum(x_ref[...], axis=-1)

    x = jnp.ones((HT, W, CM), jnp.float32)
    out = pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((HT, W), jnp.float32))(x)
    return f"sum={sync(out)}"


# 3. 3D tile sublane roll (axis=-2) for W taps
def case_3droll():
    def k(x_ref, o_ref):
        x = x_ref[...]
        o_ref[...] = x + pltpu.roll(x, 1, 1) + pltpu.roll(x, -1, 1)

    x = jnp.ones((HT, W, CM), jnp.float32)
    out = pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((HT, W, CM), jnp.float32))(x)
    return f"sum={sync(out)}"


# 4. dot_general f32 against 0/1 group matrix (reduce)
def case_dotreduce():
    m = (np.arange(WC)[:, None] // CM == np.arange(W)[None, :])

    def k(x_ref, m_ref, o_ref):
        o_ref[...] = jax.lax.dot_general(
            x_ref[...], m_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    x = jnp.ones((HT, WC), jnp.float32)
    out = pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((HT, W), jnp.float32))(
            x, jnp.asarray(m, jnp.float32))
    return f"sum={sync(out)}"


# 5. dot_general broadcast back (contract dim 1 with dim 1 of M)
def case_dotbcast():
    m = (np.arange(WC)[:, None] // CM == np.arange(W)[None, :])

    def k(a_ref, m_ref, o_ref):
        o_ref[...] = jax.lax.dot_general(
            a_ref[...], m_ref[...], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)

    a = jnp.ones((HT, W), jnp.float32)
    out = pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((HT, WC), jnp.float32))(
            a, jnp.asarray(m, jnp.float32))
    return f"sum={sync(out)} (expect {HT*WC})"


# 6. interleaved lane repeat (48, 96) -> (48, 96*48)
def case_repeat():
    def k(a_ref, o_ref):
        o_ref[...] = jnp.repeat(a_ref[...], CM, axis=1)

    a = jnp.ones((HT, W), jnp.float32)
    out = pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((HT, WC), jnp.float32))(a)
    return f"sum={sync(out)}"


# 7. lane-split reshape keeping 128 lanes: (HT, WC) -> (HT, WC//128, 128)
def case_reshape128():
    def k(x_ref, o_ref):
        x = x_ref[...]
        o_ref[...] = jnp.sum(x.reshape(HT, WC // 128, 128), axis=-1)

    x = jnp.ones((HT, WC), jnp.float32)
    out = pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((HT, WC // 128), jnp.float32))(x)
    return f"sum={sync(out)}"


# 8. power-of-two group: (48, 6144) -> (48, 384, 16) reduce (L0 shape)
def case_reshape3d_pow2():
    return case_reshape3d(cm=16)


# 9. narrow-lane 2D: (R, 48) tile with full-lane reduce + splat gate
def case_narrow():
    def k(x_ref, g_ref, o_ref):
        x = x_ref[...]
        s = jnp.sum(x, axis=1, keepdims=True)
        o_ref[...] = s * g_ref[...] + g_ref[...]

    x = jnp.ones((512, CM), jnp.float32)
    out = pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((512, CM), jnp.float32))(x, x)
    return f"sum={sync(out)}"


CASES = {n[5:]: f for n, f in list(globals().items())
         if n.startswith("case_")}


def main():
    names = sys.argv[1:] or list(CASES)
    print(f"devices: {jax.devices()}")
    for n in names:
        run(n, CASES[n])


if __name__ == "__main__":
    main()
