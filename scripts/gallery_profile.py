"""Device-profile the 102k-triangle gallery renderC frame (end-to-end).

The round-3 BVH levers (dead-lane parking, front-to-back early-out) A/B'd
as a wash at the frame level (scripts/gallery_ab.py: all four variants
within 1 ms of ~1002 ms/frame) — this captures where the frame actually
goes, to separate "sweep-bound" from "everything-else-bound" before any
further acceleration work.

Run alone: nohup python -u scripts/gallery_profile.py > /tmp/galprof.log 2>&1 &
"""

import glob
import gzip
import json
import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

import psdr_jit_tpu as psdr
from scenes import make_gallery

RES = int(os.environ.get("PROF_RES", "256"))
SPP = int(os.environ.get("PROF_SPP", "4"))
DEPTH = int(os.environ.get("PROF_DEPTH", "2"))
LOGDIR = "/tmp/psdr_gal_trace"


def main():
    sc = make_gallery(width=RES, height=RES, spp=SPP)
    sc.configure()
    integ = psdr.PathTracer(max_depth=DEPTH)
    sd = jax.lax.stop_gradient(sc.data)

    def fwd(sd_, s):
        return integ.render_impl(sd_, sc.opts, 0, s, None, "C")

    fn = jax.jit(fwd)
    t0 = time.perf_counter()
    lowered = fn.lower(sd, jnp.uint32(0))
    compiled = lowered.compile()
    with open("/tmp/gal_hlo.txt", "w") as f:
        f.write(compiled.as_text())
    float(fn(sd, jnp.uint32(0)).sum())
    print(f"compiled in {time.perf_counter() - t0:.1f} s", flush=True)
    for i in range(2):
        float(fn(sd, jnp.uint32(i + 1)).sum())
    t0 = time.perf_counter()
    n = 4
    for i in range(n):
        float(fn(sd, jnp.uint32(i + 3)).sum())
    dt = (time.perf_counter() - t0) / n
    print(f"wall {1e3 * dt:.1f} ms/frame", flush=True)

    jax.profiler.start_trace(LOGDIR)
    for i in range(2):
        float(fn(sd, jnp.uint32(i + 20)).sum())
    jax.profiler.stop_trace()
    print("trace captured", flush=True)

    paths = sorted(glob.glob(
        os.path.join(LOGDIR, "**", "*.trace.json.gz"), recursive=True
    ), key=os.path.getmtime)
    if not paths:
        print("no trace file found under", LOGDIR)
        return
    with gzip.open(paths[-1], "rt") as f:
        trace = json.load(f)
    pid_names, tid_names = {}, {}
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") != "M":
            continue
        if ev.get("name") == "process_name":
            pid_names[ev["pid"]] = ev["args"].get("name", "")
        elif ev.get("name") == "thread_name":
            tid_names[(ev["pid"], ev["tid"])] = ev["args"].get("name", "")
    cat = defaultdict(float)
    full = defaultdict(lambda: [0.0, 0])
    total = 0.0
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") != "X":
            continue
        pname = pid_names.get(ev.get("pid"), "")
        tname = tid_names.get((ev.get("pid"), ev.get("tid")), "")
        if "TPU" not in pname and "tpu" not in pname:
            continue
        if "XLA Ops" not in tname:
            continue
        name = ev.get("name", "")
        dur = ev.get("dur", 0) / 1e3  # ms
        base = name.split(".")[0].split("(")[0]
        cat[base] += dur
        rec = full[name]
        rec[0] += dur
        rec[1] += 1
        total += dur
    print(f"\ndevice leaf-op time (2 frames), total {total:.1f} ms")
    print("-- by category --")
    for name, ms in sorted(cat.items(), key=lambda kv: -kv[1])[:25]:
        print(f"  {ms:9.2f} ms  {100 * ms / max(total, 1e-9):5.1f}%  {name}")
    print("-- top individual ops --")
    for name, (ms, n2) in sorted(full.items(), key=lambda kv: -kv[1][0])[:40]:
        print(f"  {ms:9.2f} ms  x{n2:<5d} "
              f"{100 * ms / max(total, 1e-9):5.1f}%  {name[:90]}")


if __name__ == "__main__":
    main()
