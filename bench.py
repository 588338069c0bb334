"""Benchmark: Mrays/s/chip forward+backward on the Cornell box.

Canonical workload (reference README.md:42-116 + BASELINE.json): cbox
512x512, spp=32, sppe=32, sppse=32, PathTracer(3) — one training step of an
inverse-rendering loop (L2 loss + gradient w.r.t. vertex positions of a
block + light radiance) with ALL three estimators (interior + primary-edge
+ secondary-edge boundary terms).

Headline value: the fused production step (``Integrator.loss_and_grad``,
integrator/fused.py) — one forward + one adjoint with zero recompute, the
cost structure of the reference's Dr.Jit tape backward (README.md:102-104).

OUTPUT CONTRACT (the driver captures the tail of stdout and parses the last
JSON line): the headline JSON line is printed IMMEDIATELY after the cbox
fused measurement — before any optional section compiles — so a slow or
failing later section can never erase the round's number (round 3 lost its
number exactly that way: five serialized multi-minute cold compiles, JSON
only at the very end, driver timeout => rc=124/parsed:null).  Each optional
section then re-prints the FULL accumulated JSON (a strict superset), so
the last parseable line is always the most complete.  Optional sections:
  * ``interior_only_mrays`` — fused step, interior estimator only,
  * ``jaxgrad_full_mrays`` — ``jax.grad`` of the ``renderD`` L2 loss
    (remat/path-replay reverse path; the round-1 measurement style),
  * ``envmap128_guided_*`` — BASELINE config #3 (Microfacet bunny + envmap),
  * ``large_scene_*`` — 100k-triangle gallery renderC through the BVH path,
  * ``bvh_grad_*`` — gallery-class fused fwd+bwd step, all three
    estimators (the differentiable BVH-path metric, VERDICT r4 #7),
  * ``envmap128_meshgrad_*`` — the reference-parity envmap workload
    (mesh gradient only; the reference never differentiates the
    radiance table).
A wall-clock budget (PSDR_BENCH_BUDGET_S, default 2400 s from process
start) skips remaining sections and sets ``"truncated": true``; sections
are ordered so the newest judge-facing metrics land before the stable
ones, and every section re-prints a superset JSON line, so truncation
never loses previously-measured fields.

Before any timing, a numerical parity gate runs ON THE REAL BACKEND: a 64²
renderC and a micro fused step with the Pallas megakernels on vs. off must
agree.  All 197 CI tests run the kernels through the CPU interpreter; this
gate is the only place Mosaic lowering is checked against the general XLA
path, mirroring the reference's backend smoke test
(/root/reference/src/jit_optix_test.cpp:59-462).  On divergence the bench
prints a JSON line recording the failure and exits 1 — it never times
wrong numbers.

Ray accounting per pixel:
  interior:   spp   * (1 + 2*depth)          camera + depth*(shadow+bounce)
  primary:    sppe  * 2 * (1 + 2*depth)      two detached Li per edge lane
  secondary:  sppse * 3                      visibility + opposite + camera

``vs_baseline`` is vs. the speed-of-light estimate for this chip (fraction
of roofline): the reference publishes no numbers (BASELINE.md), so the
roofline is the only defensible denominator.
"""

import json
import os
import sys
import time

# The jax.grad bridge number uses the custom_vjp path-replay backward —
# the recommended reverse-mode config (integrator/base.py REMAT_MODE).
os.environ.setdefault("PSDR_REMAT", "prb")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "tests"))

import jax
import jax.numpy as jnp

import psdr_jit_tpu as psdr
from scenes import make_cbox

# PSDR_BENCH_SMOKE=1 shrinks every workload so the full control flow
# (parity gate, incremental JSON emission, budget truncation) can be
# exercised on CPU in minutes; real numbers always come from the defaults.
_SMOKE = os.environ.get("PSDR_BENCH_SMOKE") == "1"
WIDTH = HEIGHT = 64 if _SMOKE else 512
SPP = SPPE = SPPSE = 4 if _SMOKE else 32
DEPTH = 2 if _SMOKE else 3
N_ITER = 1 if _SMOKE else 3  # per timed block; 3 blocks, min-of-blocks
N_WARMUP = 1 if _SMOKE else 3

T_START = time.perf_counter()
BUDGET_S = float(os.environ.get("PSDR_BENCH_BUDGET_S", "2400"))


def _left():
    return BUDGET_S - (time.perf_counter() - T_START)


def _force(tree):
    """Force execution by reading back ONE scalar.

    All outputs (loss + grads) come from ONE XLA program, so executing it
    computes everything; reading back a single leaf forces execution
    without paying a ~28 ms tunnel round-trip per extra leaf (measured:
    694.5 -> 633.8 ms/step).  A real training loop consumes gradients
    on-device (optimizer update) and reads back only the loss scalar.
    """
    return float(jax.tree_util.tree_leaves(tree)[0].sum())


def _setup(**kw):
    sc = make_cbox(width=WIDTH, height=HEIGHT, **kw)
    sc.configure()
    integ = psdr.PathTracer(max_depth=DEPTH)
    mesh = sc.meshes[-1]
    em = sc.emitters[0]
    return sc, integ, mesh, em


def _time_fn(fn, args_for):
    # warmup/compile (forced: the remote runtime defers execution until
    # readback, so block_until_ready alone does not run the program).
    # THREE warmup calls: the first timed block after a compile runs
    # ~50-100 ms/step slower than steady state (measured 717 -> 606 ms
    # across blocks, scripts/ab_interleave.py) — warm past that.
    for i in range(N_WARMUP):
        _force(fn(*args_for(i)))
    # min over blocks rejects one-off machine-state excursions (the same
    # binary scatters over a ~60-90 ms band between runs; CLAUDE.md)
    best = float("inf")
    for blk in range(3):
        t0 = time.perf_counter()
        for i in range(N_ITER):
            _force(fn(*args_for(blk * N_ITER + i + N_WARMUP)))
        best = min(best, (time.perf_counter() - t0) / N_ITER)
    return best


def _start_cpu_oracle():
    """Launch the CPU half of the cross-backend gradient oracle as a
    subprocess (overlaps with the TPU gate compiles).  Returns
    (process, npz_path) or None if launch fails."""
    import subprocess
    import tempfile

    path = os.path.join(tempfile.mkdtemp(prefix="psdr_oracle_"),
                        "cpu.npz")
    script = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "tests", "crosscheck.py")
    try:
        proc = subprocess.Popen(
            [sys.executable, script, "--cpu", path],
            stdout=subprocess.DEVNULL, stderr=subprocess.PIPE,
        )
    except OSError as e:  # pragma: no cover
        sys.stderr.write(f"cpu oracle launch failed: {e}\n")
        return None
    return proc, path


def _oracle_gate(handle):
    """Cross-backend gradient oracle (VERDICT r4 next #4): the canonical
    small-cbox training step — loss + parameter grads, all three
    estimators — on the TPU vs the same graph on CPU (identical sample
    set, zero MC noise between backends).  Catches the bug class the
    mega-vs-XLA gate is structurally blind to: TPU-only float semantics
    (one-pass bf16 matmuls, excess-precision elision) taint every
    on-device path equally; CPU does not elide.  Validated on hardware:
    PSDR_GATHER=convert (the deliberately-reverted broken split) must
    fail this gate (scripts/oracle_validate.py).  Raises AssertionError
    on divergence; returns the relative-error dict."""
    import crosscheck

    tpu_res = crosscheck.compute()
    proc, path = handle
    try:
        err = proc.communicate(timeout=max(60.0, _left() - 60.0))[1]
    except Exception:
        proc.kill()
        raise RuntimeError("cpu oracle subprocess timed out")
    if proc.returncode != 0:
        tail = (err or b"").decode(errors="replace")[-800:]
        raise RuntimeError(f"cpu oracle subprocess failed: {tail}")
    rel = crosscheck.compare(crosscheck.load(path), tpu_res)
    # Tolerances calibrated on v5e (scripts/oracle_validate.py,
    # 2026-08-20): healthy tree measures loss 1.3e-5 / grad 5.2e-3 /
    # img 9.9e-4 (f32 reduction-order noise + a handful of chaotic
    # visibility lanes); PSDR_GATHER=convert (the deliberately-reverted
    # elision-broken split) measures loss 3.0e-2 / grad 0.45 / img 0.36
    # — every axis fails.  PSDR_GATHER=highest matches bf16x3 exactly.
    assert rel["finite"] and rel["loss"] < 5e-3 and rel["img"] < 1e-2 \
        and rel["grad"] < 0.05, rel
    return rel


def _parity_gate():
    """Megakernel-vs-XLA numerical agreement ON THE REAL BACKEND.

    64² renderC (detached-Li megakernel vs. general path) and one micro
    fused step (attached interior megakernel vs. general path).  Cheap:
    programs this size compile in seconds even through the compile helper.
    Skipped off-TPU (CI covers the interpreter path).  Returns a dict of
    relative errors; raises AssertionError on divergence.
    """
    import numpy as np
    from psdr_jit_tpu.ops import megakernel, shade_mega

    sc = make_cbox(width=64, height=64, spp=4, sppe=4, sppse=4)
    sc.configure()
    mesh, em = sc.meshes[-1], sc.emitters[0]
    bv, br = mesh.vertex_positions_raw, em.radiance
    target = jnp.zeros((64 * 64, 3), jnp.float32)

    def apply(p):
        dv, dr = p
        mesh.vertex_positions_raw = bv + dv
        em.radiance = br + dr

    p0 = (jnp.zeros_like(bv), jnp.zeros_like(br))
    res = {}
    imgs, steps = {}, {}
    prior = (megakernel.MEGA_MODE, shade_mega.INTERIOR_MODE)
    try:
        for mode in ("off", "auto"):
            megakernel.MEGA_MODE = mode
            shade_mega.INTERIOR_MODE = mode
            # a FRESH integrator per mode: renderC routes through the
            # instance's _get_jit cache, whose traced jaxpr baked the
            # module flags at first trace — reusing one integrator would
            # replay the mode-"off" trace and make the image check vacuous
            # (same staleness as the inner-jit fix in tests/test_bvh.py)
            integ_m = psdr.PathTracer(max_depth=2)

            def step_m(p, s, tgt, _i=integ_m):
                def ploss(rows, pix):
                    return jnp.sum(jnp.square(rows - tgt[pix]), axis=-1)
                return _i.loss_and_grad(sc, p, apply, ploss, seed=s)[:2]

            imgs[mode] = np.asarray(
                jax.jit(lambda s, _i=integ_m: _i.renderC(sc, 0, seed=s))(
                    jnp.uint32(7)))
            out = jax.jit(step_m)(p0, jnp.uint32(3), target)
            steps[mode] = (float(out[0]),
                           [np.asarray(g)
                            for g in jax.tree_util.tree_leaves(out[1])])
    finally:
        # restore the PRIOR modes (a user's PSDR_MEGA[_INTERIOR] opt-out
        # must govern the timed sections, not a hardcoded "auto")
        megakernel.MEGA_MODE, shade_mega.INTERIOR_MODE = prior
        mesh.vertex_positions_raw = bv
        em.radiance = br

    rel_img = float(np.abs(imgs["auto"] - imgs["off"]).sum()
                    / (np.abs(imgs["off"]).sum() + 1e-12))
    la, ga = steps["off"]
    lb, gb = steps["auto"]
    rel_loss = abs(la - lb) / (abs(la) + 1e-12)
    finite = (np.isfinite(imgs["auto"]).all() and np.isfinite(lb)
              and all(np.isfinite(g).all() for g in gb))
    res = {"img": rel_img, "loss": rel_loss, "finite": bool(finite)}
    # The gate catches Mosaic-lowering CATASTROPHES (garbage/NaN/zero),
    # not flip noise: the megakernel's hit chain is ULP-equal to the XLA
    # chain, so grazing-lane visibility tests legitimately flip on a tiny
    # fraction of lanes (~0.1%), and per-seed loss/grad values scatter
    # there while both estimators stay unbiased (scripts/interior_bias.py
    # measures the means converging).  Hence loose relative bounds.
    assert finite and rel_img < 0.05 and rel_loss < 0.05, res
    return res


def _time_fused(sc, integ, mesh, em):
    bv, br = mesh.vertex_positions_raw, em.radiance
    # the target is a jit ARGUMENT: a closed-over all-zeros constant gets
    # constant-sunk by XLA and re-materialized inside every chunk iteration
    # (~13 ms/step of pure artifact); real training targets are arrays
    import numpy as _np
    target = jnp.asarray(
        _np.random.default_rng(0).random((WIDTH * HEIGHT, 3)), jnp.float32
    )

    def apply(p):
        dv, dr = p
        mesh.vertex_positions_raw = bv + dv
        em.radiance = br + dr

    def step(p, s, tgt):
        def ploss(rows, pix):
            return jnp.sum(jnp.square(rows - tgt[pix]), axis=-1)
        return integ.loss_and_grad(sc, p, apply, ploss, seed=s)[:2]

    fn = jax.jit(step)
    p0 = (jnp.zeros_like(bv), jnp.zeros_like(br))
    dt = _time_fn(fn, lambda i: (p0, i, target))
    # tracing left tracers on the mutable scene objects; restore concrete
    # leaves before any later transformation reuses this scene
    mesh.vertex_positions_raw = bv
    em.radiance = br
    return dt


def _time_jaxgrad(sc, integ, mesh, em):
    bv, br = mesh.vertex_positions_raw, em.radiance

    def loss_fn(dv, dr, seed):
        mesh.vertex_positions_raw = bv + dv
        em.radiance = br + dr
        img = integ.renderD(sc, 0, seed=seed)
        return jnp.sum(jnp.square(img))

    grad_fn = jax.jit(jax.grad(loss_fn, argnums=(0, 1)))
    zv, zr = jnp.zeros_like(bv), jnp.zeros_like(br)
    dt = _time_fn(grad_fn, lambda i: (zv, zr, jnp.uint32(i)))
    mesh.vertex_positions_raw = bv
    em.radiance = br
    return dt


def _time_envmap(mesh_grad_only: bool = False):
    """BASELINE config #3 workload: Microfacet bunny (4968 tris, streamed-
    SMEM intersect path) under the 1k ballroom envmap, all three estimators
    with 3D-guided secondary edges, one fused training step (grad w.r.t.
    bunny vertices + envmap radiance texture).  Exercises the big-table
    alias sampling, the bilinear texture fetches, and the >512-tri
    intersect regime that the cbox headline never touches.  Returns
    (ms_per_step, mrays) or None when the reference tutorial assets are
    unavailable.

    ``mesh_grad_only``: the REFERENCE-PARITY variant — gradient w.r.t.
    the bunny mesh only, which is what the reference's envmap tutorial
    differentiates (Forward_AD_envmap.ipynb never differentiates the
    radiance TABLE).  The default workload is strictly harder: the
    512×1024×3 radiance-table gradient costs a measured ~75 ms/step of
    scatter-adds at their floor (docs/PERFORMANCE.md round-5)."""
    from scenes import make_bunny_envmap

    res = 64 if _SMOKE else 128
    try:
        sc = make_bunny_envmap(width=res, height=res, spp=SPP, sppe=SPPE,
                               sppse=SPPSE)
    except FileNotFoundError:
        return None
    sc.configure()
    integ = psdr.PathTracer(max_depth=1)
    grid = [200, 3, 3, 8] if _SMOKE else [2000, 5, 5, 32]
    integ.preprocess_secondary_edges(sc, 0, grid, 1)
    mesh = sc.meshes[0]
    em = sc.emitter_env
    bv, br = mesh.vertex_positions_raw, em.radiance
    import numpy as _np
    target = jnp.asarray(
        _np.random.default_rng(0).random((res * res, 3)), jnp.float32
    )

    if mesh_grad_only:
        def apply(p):
            mesh.vertex_positions_raw = bv + p
        p0 = jnp.zeros_like(bv)
    else:
        def apply(p):
            dv, dr = p
            mesh.vertex_positions_raw = bv + dv
            em.radiance = jax.tree_util.tree_map(jnp.add, br, dr)
        p0 = (jnp.zeros_like(bv),
              jax.tree_util.tree_map(jnp.zeros_like, br))

    def step(p, s, tgt, w):
        def ploss(rows, pix):
            return jnp.sum(jnp.square(rows - tgt[pix]), axis=-1)
        # the guiding table rides as a jit ARGUMENT (fresh each call);
        # an implicit table under a user jit raises (integrator/fused.py)
        return integ.loss_and_grad(sc, p, apply, ploss, seed=s, warp=w)[:2]

    fn = jax.jit(step)
    warp = integ.warpper.get(0)
    dt = _time_fn(fn, lambda i: (p0, i, target, warp))
    mesh.vertex_positions_raw = bv
    em.radiance = br
    rays = res * res * (SPP * 3 + SPPE * 2 * 3 + SPPSE * 3)
    return 1e3 * dt, rays / dt / 1e6


def _time_large():
    """End-to-end 100k-triangle render (gallery of icospheres): renderC
    through the sorted-ray block-culled BVH path inside a real multi-bounce
    render — validates the acceleration structure at render level, not just
    raw intersection (scripts/bvh_perf.py).  Forward-only metric."""
    from scenes import make_gallery

    res, spp, depth = (64, 1, 1) if _SMOKE else (256, 4, 2)
    sc = make_gallery(width=res, height=res, spp=spp,
                      n_spheres=4 if _SMOKE else 80,
                      subdiv=2 if _SMOKE else 3)
    sc.configure()
    integ = psdr.PathTracer(max_depth=depth)
    sd = jax.lax.stop_gradient(sc.data)

    def fwd(sd_, s):
        return integ.render_impl(sd_, sc.opts, 0, s, None, "C")

    fn = jax.jit(fwd)
    dt = _time_fn(lambda s: fn(sd, s), lambda i: (jnp.uint32(i),))
    rays = res * res * spp * (1 + 2 * depth)
    n_tris = sum(m.num_faces for m in sc.meshes)
    return 1e3 * dt, rays / dt / 1e6, n_tris


def _time_bvh_grad():
    """Differentiable BVH-path metric (VERDICT r4 #7): the gallery-class
    scene fwd+bwd with ALL THREE estimators — the BASELINE config #5
    workload shape (room-scale optimization) at >BVH_MIN_TRIS triangles,
    where gradient-path perf was previously unmeasured (the chunk-routing
    knobs were tuned on forward evidence only).  One fused training step:
    gradient w.r.t. one sphere's vertex positions + the light radiance;
    the first sphere keeps its boundary edges so the secondary-edge set
    contains curved silhouettes."""
    from scenes import make_gallery

    res, spp, depth = (64, 1, 1) if _SMOKE else (256, 4, 2)
    sc = make_gallery(width=res, height=res, spp=spp, sppe=spp, sppse=spp,
                      n_spheres=4 if _SMOKE else 80,
                      subdiv=2 if _SMOKE else 3, edge_spheres=1)
    sc.configure()
    integ = psdr.PathTracer(max_depth=depth)
    mesh = sc.meshes[6]  # the first (edge-enabled) sphere
    em = sc.emitters[0]
    bv, br = mesh.vertex_positions_raw, em.radiance
    import numpy as _np
    target = jnp.asarray(
        _np.random.default_rng(0).random((res * res, 3)), jnp.float32
    )

    def apply(p):
        dv, dr = p
        mesh.vertex_positions_raw = bv + dv
        em.radiance = br + dr

    def step(p, s, tgt):
        def ploss(rows, pix):
            return jnp.sum(jnp.square(rows - tgt[pix]), axis=-1)
        return integ.loss_and_grad(sc, p, apply, ploss, seed=s)[:2]

    fn = jax.jit(step)
    p0 = (jnp.zeros_like(bv), jnp.zeros_like(br))
    dt = _time_fn(fn, lambda i: (p0, i, target))
    mesh.vertex_positions_raw = bv
    em.radiance = br
    rays = res * res * (spp * (1 + 2 * depth)
                        + spp * 2 * (1 + 2 * depth) + spp * 3)
    n_tris = sum(m.num_faces for m in sc.meshes)
    return 1e3 * dt, rays / dt / 1e6, n_tris


def _sec_bvh_grad(out):
    r = _time_bvh_grad()
    out["bvh_grad_tris"] = r[2]
    out["bvh_grad_ms_step"] = round(r[0], 1)
    out["bvh_grad_mrays"] = round(r[1], 3)


def _headline(out):
    """Measure the headline workload and fill ``out`` in place."""
    n_pix = WIDTH * HEIGHT
    rays_full = n_pix * (SPP * (1 + 2 * DEPTH)
                         + SPPE * 2 * (1 + 2 * DEPTH)
                         + SPPSE * 3)

    # Speed-of-light estimate: intersection is the dominant unavoidable cost.
    # The cluster-brute kernel does ~F_pad triangle tests per ray at ~48
    # VPU flops each; a v5e VPU sustains ~4e12 f32 flop/s.  F_pad mirrors
    # the kernel's real padding (16-triangle clusters, intersect_pallas
    # CLUSTER_SMALL) — cbox is exactly 32 triangles, so this denominator is
    # 2x stricter than round 1's 64-multiple estimate.  It is an
    # intersection-only bound: a full differentiable step also carries
    # unavoidable shading/AD math, so vs_baseline deliberately understates
    # how close the step is to its true floor (see docs/PERFORMANCE.md).
    # (BASELINE.json "published" is empty — no reference numbers exist.)
    sc_f, integ_f, mesh_f, em_f = _setup(spp=SPP, sppe=SPPE, sppse=SPPSE)
    f_pad = 16 * -(-sum(m.num_faces for m in sc_f.meshes) // 16)
    sol_mrays = 4.0e12 / (f_pad * 48.0) / 1e6

    dt_full = _time_fused(sc_f, integ_f, mesh_f, em_f)
    mrays_full = rays_full / dt_full / 1e6
    out["metric"] = ("SMOKE_cbox64" if _SMOKE else
                     "cbox512_spp32_sppe32_sppse32_depth3_fwdbwd")
    out["value"] = round(mrays_full, 3)
    out["unit"] = "Mrays/s"
    out["vs_baseline"] = round(mrays_full / sol_mrays, 4)
    out["_sol_mrays"] = sol_mrays
    out["_rays_full"] = rays_full
    out["_scene"] = (sc_f, integ_f, mesh_f, em_f)


def _emit(out):
    clean = {k: v for k, v in out.items() if not k.startswith("_")}
    print(json.dumps(clean), flush=True)


def _sec_interior(out):
    n_pix = WIDTH * HEIGHT
    rays_interior = n_pix * SPP * (1 + 2 * DEPTH)
    sc, integ, mesh, em = _setup(spp=SPP)
    dt = _time_fused(sc, integ, mesh, em)
    out["interior_only_mrays"] = round(rays_interior / dt / 1e6, 3)
    out["interior_vs_baseline"] = round(
        rays_interior / dt / 1e6 / out["_sol_mrays"], 4)


def _sec_jaxgrad(out):
    sc_f, _, mesh_f, em_f = out["_scene"]
    dt = _time_jaxgrad(sc_f, psdr.PathTracer(max_depth=DEPTH), mesh_f, em_f)
    out["jaxgrad_full_mrays"] = round(out["_rays_full"] / dt / 1e6, 3)


def _sec_envmap(out):
    env = _time_envmap()
    if env is not None:
        out["envmap128_guided_ms_step"] = round(env[0], 1)
        out["envmap128_guided_mrays"] = round(env[1], 3)


def _sec_envmap_meshgrad(out):
    env = _time_envmap(mesh_grad_only=True)
    if env is not None:
        out["envmap128_meshgrad_ms_step"] = round(env[0], 1)
        out["envmap128_meshgrad_mrays"] = round(env[1], 3)


def _sec_large(out):
    big = _time_large()
    out["large_scene_tris"] = big[2]
    out["large_scene_ms_frame"] = round(big[0], 1)
    out["large_scene_mrays"] = round(big[1], 3)


def main():
    out = {}

    # ---- numerical parity gate (TPU only; CI covers the interpreter) ----
    # Runs under the same transient-fault retry as the headline: a remote
    # runtime FAILED_PRECONDITION during the gate's compiles must retry,
    # not crash bench before any JSON line.  AssertionError = genuine
    # numerical divergence -> fail loudly with a parseable zero record.
    if jax.default_backend() == "tpu":
        oracle = _start_cpu_oracle()  # overlaps with the TPU gate compiles
        for attempt in range(3):
            try:
                rel = _parity_gate()
                out["parity"] = "ok"
                sys.stderr.write(f"parity gate ok: {rel}\n")
                break
            except AssertionError as e:
                out["parity"] = f"FAILED: {e}"
                out["metric"] = "cbox512_spp32_sppe32_sppse32_depth3_fwdbwd"
                out["value"] = 0.0
                out["unit"] = "Mrays/s"
                _emit(out)
                sys.exit(1)
            except Exception as e:  # noqa: BLE001 transient runtime fault
                if attempt == 2:
                    raise
                sys.stderr.write(f"parity attempt {attempt} failed: {e}\n")
                time.sleep(20)
        # cross-backend gradient oracle: TPU vs CPU, same sample set.
        # A TRANSIENT failure (subprocess/runtime) records but does not
        # zero the round; a numerical AssertionError does.
        if oracle is not None:
            try:
                rel2 = _oracle_gate(oracle)
                out["oracle"] = "ok"
                sys.stderr.write(f"cross-backend oracle ok: {rel2}\n")
            except AssertionError as e:
                out["parity"] = f"ORACLE FAILED: {e}"
                out["metric"] = "cbox512_spp32_sppe32_sppse32_depth3_fwdbwd"
                out["value"] = 0.0
                out["unit"] = "Mrays/s"
                _emit(out)
                sys.exit(1)
            except Exception as e:  # noqa: BLE001
                out["oracle"] = f"transient: {e}"
                sys.stderr.write(f"cross-backend oracle transient: {e}\n")

    # ---- headline: measured and PRINTED before anything else compiles ----
    # The remote TPU runtime occasionally drops into FAILED_PRECONDITION
    # after heavy kernel churn; a fresh attempt after a pause recovers it.
    for attempt in range(3):
        try:
            _headline(out)
            break
        except Exception as e:  # noqa: BLE001
            if attempt == 2:
                raise
            sys.stderr.write(f"headline attempt {attempt} failed: {e}\n")
            time.sleep(20)
    _emit(out)

    # ---- optional sections: each re-prints a superset JSON line -------
    # (a failure or budget exhaustion can no longer erase the headline)
    for name, fn, min_s in (
        ("interior", _sec_interior, 120),
        ("jaxgrad", _sec_jaxgrad, 120),
        ("envmap", _sec_envmap, 240),
        ("bvh_grad", _sec_bvh_grad, 240),
        ("envmap_meshgrad", _sec_envmap_meshgrad, 240),
        ("large", _sec_large, 180),
    ):
        if _left() < min_s:
            out["truncated"] = True
            sys.stderr.write(f"budget exhausted before section {name}\n")
            _emit(out)
            break
        try:
            fn(out)
        except Exception as e:  # noqa: BLE001
            out.setdefault("errors", []).append(f"{name}: {e}")
            sys.stderr.write(f"section {name} failed: {e}\n")
        _emit(out)


if __name__ == "__main__":
    main()
