#!/usr/bin/env python3
"""Capture a jax.profiler trace of one 2-window eval forward and print the
aggregated device-op table (name -> total ms, count), so fusion A/Bs
(VS_CONV333 / VS_ATT_FUSE) can be attributed op-by-op.

Usage: python tools/trace_forward.py [label] [outdir=/tmp/trace_fwd]
"""

import glob
import gzip
import json
import os
import sys
import time
from collections import defaultdict

import jax
import jax.numpy as jnp
import numpy as np


def sync(x):
    return float(jnp.sum(x.astype(jnp.float32)))


def aggregate(trace_dir, top=40):
    paths = glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                      recursive=True)
    latest = max(paths, key=os.path.getmtime)
    with gzip.open(latest, "rt") as f:
        data = json.load(f)
    # device lanes: pids whose process_name mentions TPU / device
    pid_names = {}
    tid_names = {}
    for ev in data.get("traceEvents", []):
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            pid_names[ev["pid"]] = ev["args"].get("name", "")
        if ev.get("ph") == "M" and ev.get("name") == "thread_name":
            tid_names[(ev["pid"], ev.get("tid"))] = ev["args"].get("name", "")
    dev_pids = {p for p, n in pid_names.items()
                if "TPU" in n or "/device" in n.lower()}
    agg = defaultdict(lambda: [0.0, 0])
    total = 0.0
    for ev in data.get("traceEvents", []):
        if ev.get("ph") != "X" or ev.get("pid") not in dev_pids:
            continue
        tname = tid_names.get((ev["pid"], ev.get("tid")), "")
        if "step" in tname.lower():  # step lanes duplicate op lanes
            continue
        dur = ev.get("dur", 0) / 1e3  # us -> ms
        name = ev.get("name", "?")
        agg[name][0] += dur
        agg[name][1] += 1
        total += dur
    rows = sorted(agg.items(), key=lambda kv: -kv[1][0])[:top]
    print(f"trace: {latest}")
    print(f"{'op':58s} {'total ms':>9s} {'n':>5s}")
    for name, (ms, n) in rows:
        print(f"{name[:58]:58s} {ms:9.2f} {n:5d}")
    print(f"{'TOTAL (device ops)':58s} {total:9.2f}")
    return total


def main():
    label = sys.argv[1] if len(sys.argv) > 1 else "fwd"
    outdir = sys.argv[2] if len(sys.argv) > 2 else f"/tmp/trace_fwd_{label}"
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
    sync(predictor(x))  # compile
    t0 = time.perf_counter()
    sync(predictor(x))
    print(f"{label}: forward wall {(time.perf_counter()-t0)*1e3:.1f} ms "
          f"(conv333={os.environ.get('VS_CONV333', '0')} "
          f"att={os.environ.get('VS_ATT_FUSE', '0')})")
    os.makedirs(outdir, exist_ok=True)
    with jax.profiler.trace(outdir):
        sync(predictor(x))
    aggregate(outdir)


if __name__ == "__main__":
    main()
