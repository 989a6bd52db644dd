#!/usr/bin/env python3
"""A/B the flagship forward at window scale with the Pallas fusions on/off.

Chain microbenches of the conv333/att kernels are unmeasurable through the
relay (+-40% on sub-ms ops); the decisive number is the full (2, 64, 384,
384, 1) eval forward — the fused-window-loop work unit — timed in a
dependent scan chain with two lengths so dispatch overhead cancels.

Env: VS_CONV333=0 / VS_ATT_FUSE=0 select the variant (set by the caller).
Usage: python tools/fwd_probe.py [label]
"""

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

CHAIN_LO = 1
CHAIN_HI = 5
REPS = 6


def sync(x):
    return float(jnp.sum(x.astype(jnp.float32)))


def main():
    label = sys.argv[1] if len(sys.argv) > 1 else "fwd"
    from vs_seg_tpu.infer.engine import make_predictor
    from vs_seg_tpu.models.unet2d5_spvpa import UNet2d5_spvPA
    from vs_seg_tpu.train.trainer import init_model

    model = UNet2d5_spvPA(dtype=jnp.bfloat16)
    variables = init_model(model, 0)
    predictor = make_predictor(model, variables["params"],
                               variables.get("batch_stats", {}),
                               dtype=jnp.bfloat16)

    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 64, 384, 384, 1)),
                    jnp.bfloat16)

    def step(acc, _):
        y = predictor(x + acc.astype(x.dtype))
        return jnp.max(jnp.abs(y)).astype(jnp.float32) * 1e-12, ()

    bests = []
    for n in (CHAIN_LO, CHAIN_HI):
        @jax.jit
        def run(x):
            acc, _ = jax.lax.scan(step, jnp.float32(0.0), None, length=n)
            return acc[None]

        sync(run(x))
        best = float("inf")
        for r in range(REPS):
            t0 = time.perf_counter()
            sync(run(x))
            best = min(best, time.perf_counter() - t0)
            time.sleep(1.0)
        bests.append(best)
        print(f"  chain {n}: best {best*1e3:.1f} ms")
        sys.stdout.flush()
    dt = (bests[1] - bests[0]) / (CHAIN_HI - CHAIN_LO)
    on_by_default = ("VS_L2BLOCK", "VS_RUBLOCK")
    gates = " ".join(f"{k.lower().replace('vs_', '')}="
                     f"{os.environ.get(k, '1' if k in on_by_default else '0')}"
                     for k in ("VS_CONV333", "VS_ATT_FUSE", "VS_L2BLOCK",
                               "VS_RUBLOCK", "VS_L2BLOCK2D", "VS_RUBLOCK2D",
                               "VS_DSCONV"))
    print(f"{label}: {gates} forward {dt*1e3:.1f} ms / 2-window batch")


if __name__ == "__main__":
    main()
