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
    # PROF_MODE: "grad" (jax.grad of renderD; remat/prb reverse path),
    # "fwd" (renderC forward only), "fused" (loss_and_grad one-pass step).
    mode = os.environ.get("PROF_MODE", "grad")
    sc = make_cbox(width=WIDTH, height=HEIGHT, spp=SPP, sppe=SPPE, sppse=SPPSE)
    sc.configure()
    integ = psdr.PathTracer(max_depth=DEPTH)
    mesh = sc.meshes[-1]
    em = sc.emitters[0]
    base_v = mesh.vertex_positions_raw
    base_r = em.radiance
    zeros_v = jnp.zeros_like(base_v)
    zeros_r = jnp.zeros_like(base_r)

    if mode == "fwd":
        fn = jax.jit(lambda seed: integ.renderC(sc, 0, seed=seed))
        args_for = lambda i: (jnp.uint32(i),)  # noqa: E731
    elif mode == "fused":
        # target must be a jit ARGUMENT like bench.py: a closed-over
        # constant gets constant-sunk and re-broadcast as a (n_pix, 3)
        # materialization inside EVERY interior chunk iteration — measured
        # 17.6 ms/step of pure profile artifact (broadcast.79922,
        # 2026-08-19 trace)
        target = jnp.zeros((WIDTH * HEIGHT, 3), jnp.float32)

        def apply(p):
            dv, dr = p
            mesh.vertex_positions_raw = base_v + dv
            em.radiance = base_r + dr

        def step(p, s, tgt):
            def ploss(rows, pix):
                return jnp.sum(jnp.square(rows - tgt[pix]), axis=-1)
            return integ.loss_and_grad(sc, p, apply, ploss, seed=s)[:2]

        fn = jax.jit(step)
        args_for = lambda i: ((zeros_v, zeros_r), jnp.uint32(i), target)  # noqa: E731
    else:
        def loss_fn(dv, dr, seed):
            mesh.vertex_positions_raw = base_v + dv
            em.radiance = base_r + dr
            img = integ.renderD(sc, 0, seed=seed)
            return jnp.sum(jnp.square(img))

        grad = jax.jit(jax.grad(loss_fn, argnums=(0, 1)))
        fn = grad
        args_for = lambda i: (zeros_v, zeros_r, jnp.uint32(i))  # noqa: E731

    # warmup / compile
    g = fn(*args_for(0))
    g = jax.tree_util.tree_map(lambda x: float(x.sum()), g)
    print(f"compiled ({mode}); tracing...", flush=True)
    t0 = time.perf_counter()
    for i in range(3):
        g = fn(*args_for(i + 1))
        g = jax.tree_util.tree_map(lambda x: float(x.sum()), g)
    print(f"wall {1e3 * (time.perf_counter() - t0) / 3:.1f} ms/step",
          flush=True)

    jax.profiler.start_trace(LOGDIR)
    for i in range(2):
        g = fn(*args_for(i + 10))
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

    # Only the "XLA Ops" thread lane holds leaf op events; module/step
    # lanes are container spans that double-count everything inside them.
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
        if ("TPU" not in pname and "tpu" not in pname):
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
    print(f"\ndevice leaf-op time (2 steps), total {total:.1f} ms")
    print("-- by category --")
    for name, ms in sorted(cat.items(), key=lambda kv: -kv[1])[:30]:
        print(f"  {ms:9.2f} ms  {100 * ms / max(total, 1e-9):5.1f}%  {name}")
    print("-- top individual ops --")
    for name, (ms, n) in sorted(full.items(), key=lambda kv: -kv[1][0])[:45]:
        print(f"  {ms:9.2f} ms  x{n:<5d} {100 * ms / max(total, 1e-9):5.1f}%  {name[:90]}")


if __name__ == "__main__":
    main()
