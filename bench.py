#!/usr/bin/env python3
"""Benchmark: sliding-window whole-volume inference throughput (the reference
north-star path, params/VSparams.py:568-574).

Runs the flagship UNet2d5_spvPA over a synthetic whole volume with the
reference inference protocol (ROI 384x384x64, overlap 0.25, Gaussian blending)
on the available accelerator, and prints ONE JSON line with volumes/sec plus
hardware-relative numbers (achieved conv TFLOP/s and MFU vs the v5e bf16
peak) so progress is meaningful independent of the baseline anchor.

vs_baseline is a ratio to an ESTIMATED A100 anchor for the same serial
sw_batch_size=1 torch pipeline (BASELINE.md: the reference repo publishes no
numbers; the anchor must be re-measured on reference hardware when available).

Asserts the fused Pallas blend path actually engaged on TPU — a silent
fallback to the XLA scatter would otherwise masquerade as relay noise.
"""

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

# Reference-protocol volume: a typical TCIA T2 volume is ~448x448x80 after
# RAS reorientation; ROI 384x384x64, overlap 0.25 -> 2x2x2 = 8 windows.
VOLUME_SHAPE = (448, 448, 80)
ROI = (384, 384, 64)
SW_BATCH = 8
WARMUP = 1
ITERS = 3
REPS = 14

# Conservative measured-estimate anchor for the reference pipeline
# (torch+MONAI 0.4, sw_batch_size=1, A100): ~0.55 volumes/sec for this
# volume/ROI. Re-measure per BASELINE.md when reference hardware is available.
A100_BASELINE_VPS = 0.55


def main():
    from vs_seg_tpu.infer.engine import make_predictor
    from vs_seg_tpu.infer.sliding_window import sliding_window_inference
    from vs_seg_tpu.models.unet2d5_spvpa import UNet2d5_spvPA

    from vs_seg_tpu.train.trainer import init_model
    model = UNet2d5_spvPA(dtype=jnp.bfloat16)
    variables = init_model(model, 0)
    predictor = make_predictor(model, variables["params"],
                               variables.get("batch_stats", {}),
                               dtype=jnp.bfloat16)

    from concurrent.futures import ThreadPoolExecutor

    from vs_seg_tpu.infer.sliding_window import stage_volume

    rng = np.random.default_rng(0)
    volumes = [rng.normal(size=(*VOLUME_SHAPE, 1)).astype(np.float32)
               for _ in range(ITERS)]

    def stage(vol):
        return stage_volume(vol, ROI, overlap=0.25, sw_batch_size=SW_BATCH,
                            quantize=True, predictor_layout="dfirst")

    def run(staged):
        return sliding_window_inference(staged, ROI, predictor, overlap=0.25,
                                        sw_batch_size=SW_BATCH, mode="gaussian",
                                        predictor_layout="dfirst")

    # warmup (compile); sync via scalar readback — block_until_ready is not a
    # reliable sync on remote-tunneled platforms.
    for _ in range(WARMUP):
        float(jnp.sum(run(stage(volumes[0]))[..., 0]))

    # Steady-state serving pipeline: a background thread stages (prepares +
    # uploads) volume i+1 while volume i computes. The first volume's staging
    # is pipeline fill (like model load) and is excluded: the clock starts
    # once volume 1 is resident, so dt measures the true steady-state
    # cadence max(stage, compute) a serving loop sustains.
    # Repeat the whole pipeline and report the best repetition — the shared
    # TPU relay in this environment adds multi-second contention stalls that
    # would otherwise dominate the measurement.
    pool = ThreadPoolExecutor(1)
    rep_dts = []
    for rep in range(REPS):
        if rep:
            time.sleep(4.0)  # spread reps over ~1 min: relay contention
            # comes in multi-second bursts, and sampling across a longer
            # span is the only defense
        first = pool.submit(stage, volumes[0]).result()
        t0 = time.perf_counter()
        futures = [pool.submit(stage, v) for v in volumes[1:]]
        outs = [run(first)] + [run(f.result()) for f in futures]
        # one combined readback (depends on every output, so it syncs all
        # volumes) — per-volume scalar readbacks each cost a relay RTT
        float(sum(jnp.sum(o[..., 0]) for o in outs))
        rep_dts.append((time.perf_counter() - t0) / ITERS)
    # best-of remains the headline (relay contention bursts are environment
    # noise, not pipeline cost), but median catches regressions best-of masks.
    dt = min(rep_dts)
    median_dt = float(np.median(rep_dts))

    # Stage-vs-compute split: time the compute leg alone on a resident staged
    # volume (min of 3), then attribute the remainder of the pipeline cadence
    # to staging overlap.
    staged0 = stage(volumes[0])
    compute_dt = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(jnp.sum(run(staged0)[..., 0]))
        compute_dt = min(compute_dt, time.perf_counter() - t0)

    # Staging-leg decomposition (VERDICT r3 task 5): the steady-state cadence
    # is max(stage, compute); any stage_overlap is the stage leg exceeding
    # compute. Measure the stage wall and the PURE H2D leg of the same bytes
    # so the overlap is attributable: on this relay the tunnel moves the
    # ~17 MB uint8 transfer at ~45 MB/s (~370 ms — the whole stage leg);
    # a real TPU host moves it over PCIe at >10 GB/s (<2 ms), where staging
    # fully hides behind compute and the overlap term vanishes.
    stage_dt = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        s = stage(volumes[1])
        float(jnp.sum(s.vol_dev[0, 0].astype(jnp.float32)))  # sync upload
        stage_dt = min(stage_dt, time.perf_counter() - t0)
    stage_bytes = int(np.prod(s.vol_dev.shape))  # uint8 transfer
    del s
    h2d_buf = np.zeros(stage_bytes, np.uint8)
    h2d_dt = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        d = jax.device_put(h2d_buf)
        float(jnp.sum(d[:8].astype(jnp.float32)))
        h2d_dt = min(h2d_dt, time.perf_counter() - t0)
        del d

    platform = jax.devices()[0].platform
    from vs_seg_tpu.infer import sliding_window as sw
    if platform == "tpu":
        assert sw.LAST_USED_PALLAS is True, (
            "fused Pallas blend path did not engage — perf regression "
            f"(LAST_USED_PALLAS={sw.LAST_USED_PALLAS})")

    # Achieved useful conv FLOP/s: analytic forward FLOPs x real (unmasked)
    # windows per volume / wall-clock. MFU vs one v5e chip's bf16 peak.
    from vs_seg_tpu.eval.flops import V5E_PEAK_BF16, forward_conv_flops
    from vs_seg_tpu.infer.sliding_window import dense_patch_starts
    roi_d = (ROI[2], ROI[0], ROI[1])
    vol_d = (VOLUME_SHAPE[2], VOLUME_SHAPE[0], VOLUME_SHAPE[1])
    padded = tuple(max(v, r) for v, r in zip(vol_d, roi_d))
    n_windows = len(dense_patch_starts(padded, roi_d, 0.25))
    window_flops = forward_conv_flops(model, variables, (1, *roi_d, 1))
    flops_per_volume = window_flops * n_windows

    vps = 1.0 / dt
    tflops = flops_per_volume * vps / 1e12
    # Device-side utilization: the same FLOPs over the measured device compute
    # leg alone.  The pipeline numbers above include the H2D staging cadence,
    # which on this relay-tunneled environment is bounded by a ~45 MB/s debug
    # tunnel (a real TPU host moves the same 16 MB in <2 ms); device_mfu is
    # the number that transfers to production hardware.
    device_tflops = flops_per_volume / compute_dt / 1e12
    print(json.dumps({
        "metric": "sliding_window_volumes_per_sec",
        "value": round(vps, 4),
        "unit": "volumes/sec",
        "vs_baseline": round(vps / A100_BASELINE_VPS, 3),
        "baseline_anchor": "estimated (BASELINE.md)",
        "median_vps": round(1.0 / median_dt, 4),
        # Round-over-round comparisons gate on median_vps (BASELINE.md rule:
        # best-of-N cannot resolve +-1%/round regressions); rep_dts shows
        # the relay-contention dispersion behind both numbers.
        "rep_dts_ms": [round(d * 1e3, 1) for d in sorted(rep_dts)],
        "ms_per_window": round(dt * 1e3 / n_windows, 2),
        "compute_ms_per_volume": round(compute_dt * 1e3, 1),
        # device-only throughput (1/compute leg): what the pipeline sustains
        # on a production host where the H2D upload (<2 ms over PCIe) hides
        # behind compute — the relay-independent throughput number
        "device_vps": round(1.0 / compute_dt, 4),
        "stage_overlap_ms_per_volume": round(max(dt - compute_dt, 0.0) * 1e3, 1),
        # stage leg decomposition: stage_ms ~= h2d_ms on this relay (45 MB/s
        # tunnel); on a real host the same bytes move in <2 ms over PCIe and
        # the overlap term vanishes — see BASELINE.md
        "stage_ms": round(stage_dt * 1e3, 1),
        "h2d_ms": round(h2d_dt * 1e3, 1),
        "h2d_mbps": round(stage_bytes / h2d_dt / 1e6, 1),
        "n_windows": n_windows,
        "window_tflops": round(window_flops / 1e12, 4),
        "tflops": round(tflops, 2),
        "mfu": round(tflops * 1e12 / V5E_PEAK_BF16, 4) if platform == "tpu" else None,
        "device_tflops": round(device_tflops, 2),
        "device_mfu": round(device_tflops * 1e12 / V5E_PEAK_BF16, 4)
        if platform == "tpu" else None,
        "pallas_blend": sw.LAST_USED_PALLAS,
        # effective gate state (defaults: l2block+rublock r3 A/B win;
        # l2tap+headfold r5 A/B wins — docs/KERNELS.md gate tables)
        "fusion_gates": {k.lower().replace("vs_", ""):
                         os.environ.get(k, "1" if k in ("VS_L2BLOCK",
                                                        "VS_RUBLOCK",
                                                        "VS_L2TAP",
                                                        "VS_HEADFOLD") else "0")
                         for k in ("VS_CONV333", "VS_L2BLOCK", "VS_RUBLOCK",
                                   "VS_L2TAP", "VS_HEADFOLD", "VS_RES331",
                                   "VS_DSCONV")},
    }))


if __name__ == "__main__":
    main()
