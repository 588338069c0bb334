"""Device-profile the interior fwd+bwd step on the real TPU.

Captures a jax.profiler trace of the benchmark's gradient step and prints a
per-op-category time breakdown parsed from the trace, so the next
optimization target is chosen from data (VERDICT round 1: >90% of device
time is NOT intersection — find out what it is).

Run alone (no concurrent TPU work): nohup python -u scripts/profile_interior.py > /tmp/profile.log 2>&1 &
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
from scenes import make_cbox

WIDTH = HEIGHT = 512
SPP = 32
SPPE = int(os.environ.get("PROF_SPPE", "0"))
SPPSE = int(os.environ.get("PROF_SPPSE", "0"))
DEPTH = 3
LOGDIR = "/tmp/psdr_trace"


def main():
    sc = make_cbox(width=WIDTH, height=HEIGHT, spp=SPP, sppe=SPPE, sppse=SPPSE)
    sc.configure()
    integ = psdr.PathTracer(max_depth=DEPTH)
    mesh = sc.meshes[-1]
    em = sc.emitters[0]
    base_v = mesh.vertex_positions_raw
    base_r = em.radiance

    def loss_fn(dv, dr, seed):
        mesh.vertex_positions_raw = base_v + dv
        em.radiance = base_r + dr
        img = integ.renderD(sc, 0, seed=seed)
        return jnp.sum(jnp.square(img))

    grad_fn = jax.jit(jax.grad(loss_fn, argnums=(0, 1)))
    zeros_v = jnp.zeros_like(base_v)
    zeros_r = jnp.zeros_like(base_r)

    # warmup / compile
    g = grad_fn(zeros_v, zeros_r, jnp.uint32(0))
    g = jax.tree_util.tree_map(lambda x: float(x.sum()), g)
    print("compiled; tracing...", flush=True)

    jax.profiler.start_trace(LOGDIR)
    for i in range(2):
        g = grad_fn(zeros_v, zeros_r, jnp.uint32(i + 1))
        g = jax.tree_util.tree_map(lambda x: float(x.sum()), g)
    jax.profiler.stop_trace()
    print("trace captured", flush=True)

    # parse the trace.json.gz for device-side op durations
    paths = sorted(glob.glob(
        os.path.join(LOGDIR, "**", "*.trace.json.gz"), recursive=True
    ), key=os.path.getmtime)
    if not paths:
        print("no trace file found under", LOGDIR)
        return
    with gzip.open(paths[-1], "rt") as f:
        trace = json.load(f)

    # device lanes: pid names containing 'TPU' / 'xla'; sum durations by
    # op name prefix
    pid_names = {}
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            pid_names[ev["pid"]] = ev["args"].get("name", "")
    cat = defaultdict(float)
    total = 0.0
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") != "X":
            continue
        pname = pid_names.get(ev.get("pid"), "")
        if "TPU" not in pname and "tpu" not in pname:
            continue
        name = ev.get("name", "")
        dur = ev.get("dur", 0) / 1e3  # ms
        base = name.split(".")[0].split("(")[0]
        cat[base] += dur
        total += dur
    print(f"\ndevice op time (2 steps), total {total:.1f} ms")
    for name, ms in sorted(cat.items(), key=lambda kv: -kv[1])[:40]:
        print(f"  {ms:9.2f} ms  {100 * ms / max(total, 1e-9):5.1f}%  {name}")


if __name__ == "__main__":
    main()
