#!/usr/bin/env python3
"""Decompose bench.py's volumes/sec into staging (H2D over the relay) vs
device compute, and compare sw_batch sizes. Diagnostic only."""

import sys
import time

import jax.numpy as jnp
import numpy as np

VOLUME_SHAPE = (448, 448, 80)
ROI = (384, 384, 64)
REPS = 4


def main():
    from vs_seg_tpu.infer.engine import make_predictor
    from vs_seg_tpu.infer.sliding_window import (sliding_window_inference,
                                                 stage_volume)
    from vs_seg_tpu.models.unet2d5_spvpa import UNet2d5_spvPA
    from vs_seg_tpu.train.trainer import init_model

    model = UNet2d5_spvPA(dtype=jnp.bfloat16)
    variables = init_model(model, 0)
    predictor = make_predictor(model, variables["params"],
                               variables.get("batch_stats", {}),
                               dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    vol = rng.normal(size=(*VOLUME_SHAPE, 1)).astype(np.float32)

    for sw_batch in (2, 4, 8):
        staged = stage_volume(vol, ROI, overlap=0.25, sw_batch_size=sw_batch,
                              quantize=True, predictor_layout="dfirst")
        out = sliding_window_inference(staged, ROI, predictor, overlap=0.25,
                                       sw_batch_size=sw_batch, mode="gaussian",
                                       predictor_layout="dfirst")
        float(jnp.sum(out[..., 0]))  # warm compile

        best_stage, best_comp = float("inf"), float("inf")
        for _ in range(REPS):
            t0 = time.perf_counter()
            staged = stage_volume(vol, ROI, overlap=0.25,
                                  sw_batch_size=sw_batch, quantize=True,
                                  predictor_layout="dfirst")
            # staging is async; force the upload to finish
            float(jnp.sum(staged.vol_dev[0, 0, :8].astype(jnp.float32)))
            t1 = time.perf_counter()
            out = sliding_window_inference(staged, ROI, predictor,
                                           overlap=0.25,
                                           sw_batch_size=sw_batch,
                                           mode="gaussian",
                                           predictor_layout="dfirst")
            float(jnp.sum(out[..., 0]))
            t2 = time.perf_counter()
            best_stage = min(best_stage, t1 - t0)
            best_comp = min(best_comp, t2 - t1)
        print(f"sw_batch={sw_batch}: stage {best_stage*1e3:7.1f} ms   "
              f"compute {best_comp*1e3:7.1f} ms")
        sys.stdout.flush()


if __name__ == "__main__":
    main()
