#!/usr/bin/env python3
"""Isolated real-TPU timing of the kd=1 fused block kernels at the TRUE
flagship L0/L1 shapes (the 6-way gate A/B showed catastrophic composed
regressions — 274/160 ms vs 80 ms — this probe localizes where the time
goes: kernel body vs boundary pads vs shape pathology).

Usage: python tools/block2d_probe.py [l1|l0|all] [budget_mb ...]
Each budget is a VS_2D_BUDGET_MB value to re-measure with (changes the
row-tile ht).
"""

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from vs_seg_tpu.nn.blocks import ResidualUnit
from vs_seg_tpu.ops.experimental import pallas_block2d
from vs_seg_tpu.ops.experimental.pallas_block2d import pick_cp, pick_ht_2d, ru_block2d
from tools.l2block_probe import chain_timed_single, ru_fused_args, sync


def probe(name, B, D, H, W, Cin, Cout, budgets):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, D, H, W, Cin)), jnp.bfloat16)
    ru = ResidualUnit(features=Cout, kernel_size=(3, 3, 1), subunits=2,
                      dropout=None, dtype=jnp.bfloat16)
    ru_vars = ru.init({"params": jax.random.key(0)}, x, train=False)
    fa = ru_fused_args(ru_vars)
    cp = pick_cp(Cin, Cout)
    useful = 2 * B * D * H * W * (9 * Cin * Cout + 9 * Cout * Cout
                                  + Cin * Cout)

    dt_x = chain_timed_single(lambda a: ru.apply(ru_vars, a, train=False), x)
    print(f"{name}: xla {dt_x*1e3:7.2f} ms ({useful/dt_x/1e12:5.1f} TF/s)")
    sys.stdout.flush()
    for mb in budgets:
        os.environ["VS_2D_BUDGET_MB"] = str(mb)
        ht = pick_ht_2d(H, (W * cp) // 128, n_inputs=1)
        if not ht:
            print(f"  budget {mb} MB: no ht fits")
            continue
        dt_p = chain_timed_single(lambda a: ru_block2d(a, cp=cp, **fa), x)
        print(f"  budget {mb} MB (ht={ht}): fused {dt_p*1e3:7.2f} ms "
              f"({useful/dt_p/1e12:5.1f} TF/s)  ({dt_x/dt_p:.2f}x)")
        sys.stdout.flush()


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    budgets = [int(a) for a in sys.argv[2:]] or [12, 4]
    if which in ("l1", "all"):
        probe("ru2d L1 (2,64,192,192) 16->32", 2, 64, 192, 192, 16, 32,
              budgets)
    if which in ("l0", "all"):
        probe("ru2d L0 (2,64,384,384) 16->16", 2, 64, 384, 384, 16, 16,
              budgets)


if __name__ == "__main__":
    main()
