"""Measure rays/s scaling efficiency of the shard_map training step on the
virtual CPU device mesh (1 vs N devices, same total work).

Real multi-chip hardware isn't available in this environment, so this is a
*relative* measurement on ``--xla_force_host_platform_device_count=N``
virtual devices that share the host's physical cores: it measures the
overhead the SPMD partitioning adds (collectives, partitioned program,
edge-lane partitioning), not true parallel speedup.  Efficiency here =
t_1dev / t_Ndev (>= ~1.0 means the sharded program costs no more total work
than the single-device one, i.e. the partitioning itself is free; on real
chips wall-clock would then scale ~linearly).

Usage: python scripts/scaling_efficiency.py [n_devices] [width]
"""

import os
import sys
import time

N_DEV = int(sys.argv[1]) if len(sys.argv) > 1 else 8
WIDTH = int(sys.argv[2]) if len(sys.argv) > 2 else 64

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + f" --xla_force_host_platform_device_count={N_DEV}"
).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import psdr_jit_tpu as psdr  # noqa: E402
from psdr_jit_tpu.parallel.mesh import make_device_mesh  # noqa: E402
from psdr_jit_tpu.parallel.shard import train_step_example  # noqa: E402
from scenes import make_cbox  # noqa: E402

SPP = 8
SPPE = 4
SPPSE = 4
DEPTH = 2
N_ITER = 3


def time_step(n_dev):
    sc = make_cbox(width=WIDTH, height=WIDTH, spp=SPP, sppe=SPPE, sppse=SPPSE)
    sc.configure()
    integ = psdr.PathTracer(DEPTH)
    mesh_obj = sc.meshes[-1]
    base_raw = mesh_obj.to_world_raw
    target = np.asarray(integ.renderC(sc, 0, seed=9)) * 0.8

    def param_get():
        return {"tx": jnp.float32(0.0)}

    def param_set(p):
        mesh_obj.to_world_raw = base_raw.at[0, 3].add(p["tx"])

    mesh = make_device_mesh(n_dev)

    def run():
        loss, grads = train_step_example(
            sc, integ, mesh, param_get, param_set, target, seed=9
        )
        return float(loss), float(grads["tx"])

    out = run()  # compile + warmup
    t0 = time.perf_counter()
    for _ in range(N_ITER):
        out = run()
    dt = (time.perf_counter() - t0) / N_ITER
    return dt, out


def main():
    n_pix = WIDTH * WIDTH
    rays = n_pix * (SPP * (1 + 2 * DEPTH)
                    + SPPE * 2 * (1 + 2 * DEPTH) + SPPSE * 3)
    dt1, out1 = time_step(1)
    dtn, outn = time_step(N_DEV)
    np.testing.assert_allclose(out1[0], outn[0], rtol=1e-5)
    eff = dt1 / dtn
    print(f"1 device : {dt1 * 1e3:8.1f} ms/step  {rays / dt1 / 1e6:7.2f} Mrays/s")
    print(f"{N_DEV} devices: {dtn * 1e3:8.1f} ms/step  {rays / dtn / 1e6:7.2f} Mrays/s")
    print(f"sharding-overhead efficiency (t1/tN, virtual mesh): {eff:.3f}")
    print("NOTE: virtual devices share physical cores — this measures SPMD")
    print("partitioning overhead, not parallel speedup; >= ~0.85 meets the")
    print("BASELINE scaling gate for the partitioning layer itself.")


if __name__ == "__main__":
    main()
