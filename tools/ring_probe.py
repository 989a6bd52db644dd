#!/usr/bin/env python3
"""Mosaic de-risk probe for the l2block mega-kernel's new constructs:
software-pipelined rings in VMEM scratch indexed by dynamic slot (s % k),
pl.when-predicated stages, and an out BlockSpec revisited via a clipped
index_map (pipeline drain).  A toy 3-stage pipeline: load plane s, double
it at stage s-1, write plane s-2 = doubled(s-2) + doubled(s-1) masked.

Usage: python tools/ring_probe.py [interpret]
"""

import sys
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, o_ref, ring, sem, *, rows, d):
    s = pl.program_id(0)

    # stage A: load plane s into ring slot s % 3 (DMA), s < d only
    @pl.when(s < d)
    def _():
        cp = pltpu.make_async_copy(
            x_ref.at[pl.ds(s * rows, rows)], ring.at[s % 3], sem)
        cp.start()
        cp.wait()

    # stage B: write out plane s-2 from ring slots (s-2) and (s-1)
    @pl.when(s >= 2)
    def _():
        p = s - 2
        a = ring[p % 3] * 2.0
        nxt = ring[(p + 1) % 3] * 2.0
        valid = (p + 1 < d)
        o_ref[...] = a + jnp.where(valid, nxt, 0.0)


def run(interpret=False):
    rows, d = 16, 5
    x = jnp.arange(d * rows * 128, dtype=jnp.float32).reshape(d * rows, 128)
    out = pl.pallas_call(
        partial(_kernel, rows=rows, d=d),
        grid=(d + 2,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (rows, 128), lambda s: (jnp.clip(s - 2, 0, d - 1), 0),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((d * rows, 128), jnp.float32),
        scratch_shapes=[pltpu.VMEM((3, rows, 128), jnp.float32),
                        pltpu.SemaphoreType.DMA],
        interpret=interpret,
    )(x)
    ref = x.reshape(d, rows, 128) * 2.0
    expect = ref + jnp.concatenate([ref[1:], jnp.zeros_like(ref[:1])], 0)
    err = float(jnp.max(jnp.abs(out.reshape(d, rows, 128) - expect)))
    print(f"ring probe err={err} (interpret={interpret})")


if __name__ == "__main__":
    run(interpret=len(sys.argv) > 1 and sys.argv[1] == "interpret")
