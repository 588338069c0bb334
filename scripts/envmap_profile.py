"""Device-profile the envmap/Microfacet fused step in context (BASELINE #3).

The repo's own history says per-lane table lookups only reveal themselves
inside the real scan bodies (CLAUDE.md) — never trust a gather microbench.
This captures a jax.profiler trace of the Forward_AD_envmap workload's
fused training step (grad w.r.t. bunny vertices + envmap radiance, all
three estimators, optional 3D guiding) and prints the leaf-op breakdown,
looking specifically for:

* the >2048-entry `DiscreteDistribution.sample_reuse` binary search over
  the ~2M-cell envmap importance table (core/distribution.py:99-101) in
  the NEE of every bounce,
* the 4-tap bilinear radiance fetches of the 512x1024 envmap bitmap,
* the guiding table's 50k-cell sample_reuse (when PROF_GUIDE=1).

Run alone: nohup python -u scripts/envmap_profile.py > /tmp/envprof.log 2>&1 &
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
from scenes import make_bunny_envmap

RES = int(os.environ.get("PROF_RES", "128"))
SPP = int(os.environ.get("PROF_SPP", "32"))
SPPE = int(os.environ.get("PROF_SPPE", "32"))
SPPSE = int(os.environ.get("PROF_SPPSE", "32"))
GUIDE = os.environ.get("PROF_GUIDE", "1") == "1"
LOGDIR = "/tmp/psdr_env_trace"


def main():
    sc = make_bunny_envmap(width=RES, height=RES, spp=SPP, sppe=SPPE,
                           sppse=SPPSE)
    sc.configure()
    integ = psdr.PathTracer(max_depth=1)
    if GUIDE and SPPSE > 0:
        t0 = time.perf_counter()
        integ.preprocess_secondary_edges(sc, 0, [2000, 5, 5, 32], 1)
        jax.block_until_ready(integ.warpper[0].distrb.cdf)
        print(f"guiding preprocess {time.perf_counter() - t0:.1f} s",
              flush=True)

    mesh = sc.meshes[0]
    em = sc.emitter_env
    base_v = mesh.vertex_positions_raw
    base_r = em.radiance
    target = jnp.zeros((RES * RES, 3), jnp.float32)

    def apply(p):
        dv, dr = p
        mesh.vertex_positions_raw = base_v + dv
        # radiance is a Bitmap pytree; perturb its leaves
        em.radiance = jax.tree_util.tree_map(jnp.add, base_r, dr)

    def step(p, s, tgt):
        def ploss(rows, pix):
            return jnp.sum(jnp.square(rows - tgt[pix]), axis=-1)
        # explicit warp: deliberate fixed-table bake for this profile
        return integ.loss_and_grad(sc, p, apply, ploss, seed=s,
                                   warp=integ.warpper.get(0))[:2]

    fn = jax.jit(step)
    zeros_p = (jnp.zeros_like(base_v),
               jax.tree_util.tree_map(jnp.zeros_like, base_r))
    args_for = lambda i: (zeros_p, jnp.uint32(i), target)  # noqa: E731

    def force(tree):
        return float(jax.tree_util.tree_leaves(tree)[0].sum())

    t0 = time.perf_counter()
    lowered = fn.lower(*args_for(0))
    compiled = lowered.compile()
    with open("/tmp/env_hlo.txt", "w") as f:
        f.write(compiled.as_text())
    print("hlo dumped", flush=True)
    force(fn(*args_for(0)))
    print(f"compiled in {time.perf_counter() - t0:.1f} s", flush=True)
    for i in range(3):
        force(fn(*args_for(i + 1)))
    t0 = time.perf_counter()
    n = 5
    for i in range(n):
        force(fn(*args_for(i + 4)))
    dt = (time.perf_counter() - t0) / n
    n_pix = RES * RES
    rays = n_pix * (SPP * 3 + SPPE * 2 * 3 + SPPSE * 3)
    print(f"wall {1e3 * dt:.1f} ms/step  ({rays / dt / 1e6:.1f} Mrays/s)",
          flush=True)

    jax.profiler.start_trace(LOGDIR)
    for i in range(2):
        force(fn(*args_for(i + 20)))
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
    print(f"\ndevice leaf-op time (2 steps), total {total:.1f} ms")
    print("-- by category --")
    for name, ms in sorted(cat.items(), key=lambda kv: -kv[1])[:30]:
        print(f"  {ms:9.2f} ms  {100 * ms / max(total, 1e-9):5.1f}%  {name}")
    print("-- top individual ops --")
    for name, (ms, n2) in sorted(full.items(), key=lambda kv: -kv[1][0])[:45]:
        print(f"  {ms:9.2f} ms  x{n2:<5d} "
              f"{100 * ms / max(total, 1e-9):5.1f}%  {name[:90]}")


if __name__ == "__main__":
    main()
