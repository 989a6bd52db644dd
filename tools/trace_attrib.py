#!/usr/bin/env python3
"""Join a jax.profiler device trace with the optimized-HLO metadata so every
op duration is attributed to its model site (flax scope path) and emitter.

Usage: python tools/trace_attrib.py <trace_dir> <hlo.txt> [group]
group: "site" (default) aggregates by metadata op_name prefix; "op" lists
individual ops.
"""

import glob
import gzip
import json
import os
import re
import sys
from collections import defaultdict


def load_trace(trace_dir):
    paths = glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                      recursive=True)
    latest = max(paths, key=os.path.getmtime)
    with gzip.open(latest, "rt") as f:
        data = json.load(f)
    pid_names, tid_names = {}, {}
    for ev in data.get("traceEvents", []):
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            pid_names[ev["pid"]] = ev["args"].get("name", "")
        if ev.get("ph") == "M" and ev.get("name") == "thread_name":
            tid_names[(ev["pid"], ev.get("tid"))] = ev["args"].get("name", "")
    dev_pids = {p for p, n in pid_names.items()
                if "TPU" in n or "/device" in n.lower()}
    durs = defaultdict(float)
    for ev in data.get("traceEvents", []):
        if ev.get("ph") != "X" or ev.get("pid") not in dev_pids:
            continue
        tname = tid_names.get((ev["pid"], ev.get("tid")), "")
        if "step" in tname.lower():
            continue
        name = ev.get("name", "?")
        if name.startswith("jit_"):
            continue
        durs[name] += ev.get("dur", 0) / 1e3
    return durs


def load_hlo_meta(hlo_path):
    meta = {}
    pat = re.compile(
        r"%([\w.\-]+) = \S+ (?:fusion|copy|convolution|custom-call|pad|slice"
        r"|reshape|transpose|convert|dynamic-update-slice|reduce)\(")
    op_pat = re.compile(r'op_name="([^"]*)"')
    em_pat = re.compile(r'"emitter":"(\w+)"')
    for line in open(hlo_path):
        m = pat.search(line)
        if not m:
            continue
        name = m.group(1)
        op = op_pat.search(line)
        em = em_pat.search(line)
        meta[name] = (op.group(1) if op else "?",
                      em.group(1) if em else "")
    return meta


def main():
    trace_dir, hlo_path = sys.argv[1], sys.argv[2]
    group = sys.argv[3] if len(sys.argv) > 3 else "site"
    durs = load_trace(trace_dir)
    meta = load_hlo_meta(hlo_path)
    agg = defaultdict(lambda: [0.0, 0])
    unattr = 0.0
    for name, ms in durs.items():
        op, em = meta.get(name, (None, ""))
        if op is None:
            unattr += ms
            key = f"<unattributed> {name.split('.')[0]}"
        else:
            # site = scope path without the final primitive
            site = re.sub(r"^jit\(predictor\)/", "", op)
            parts = site.split("/")
            site = "/".join(parts[:-1]) if len(parts) > 1 else site
            key = f"{site} [{em}]" if em else site
        if group == "op":
            key = f"{name} :: {key}"
        agg[key][0] += ms
        agg[key][1] += 1
    total = sum(v[0] for v in agg.values())
    for k, (ms, n) in sorted(agg.items(), key=lambda kv: -kv[1][0])[:45]:
        print(f"{ms:8.2f} ms {n:4d}  {k[:95]}")
    print(f"{total:8.2f} ms TOTAL")


if __name__ == "__main__":
    main()
