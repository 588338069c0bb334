"""Cross-backend gradient oracle workload (VERDICT r4 next #4).

One deterministic small-cbox training step — loss + parameter gradients
with ALL THREE estimators (interior + primary-edge + secondary-edge) —
computed bit-identically-in-algorithm on any backend.  The bench parity
gate runs it on the TPU in-process and on CPU in a subprocess and compares:
both backends consume the IDENTICAL sample set (counter-based pcg4d
sampler, fixed seed), so there is zero Monte-Carlo noise between them and
the comparison isolates BACKEND float semantics.  This is the detector the
round-2..4 bf16 excess-precision-elision bug class needs: that bug tainted
every on-device path equally (the mega-vs-XLA gate was blind to it) while
CPU, which does not elide, stayed exact.

Why CPU f32 (not f64): the pipeline's dtypes are explicitly f32
throughout, so x64 mode would not change them; the target bug class is
TPU-backend semantic divergence (one-pass bf16 matmuls, excess-precision
elision), for which same-dtype CPU execution is the exact oracle.
Residual TPU-vs-CPU differences come only from non-deterministic f32
reduction order and a handful of chaotic visibility-test lanes; tolerance
calibration lives in bench._parity_gate (measured on hardware,
scripts/oracle_validate.py).

Subprocess entry::

    python tests/crosscheck.py --cpu out.npz

forces the CPU platform (the sitecustomize pins JAX_PLATFORMS=axon; the
config update below is the only way to override it) and writes
loss/grads to ``out.npz``.
"""

import os
import sys

_HERE = os.path.dirname(os.path.abspath(__file__))
for _p in (_HERE, os.path.dirname(_HERE)):  # tests/ and the repo root
    if _p not in sys.path:
        sys.path.insert(0, _p)

WIDTH = 48
DEPTH = 2
SPP = SPPE = SPPSE = 4
SEED = 5


def compute(width: int = WIDTH, depth: int = DEPTH, spp: int = SPP,
            sppe: int = SPPE, sppse: int = SPPSE, seed: int = SEED):
    """Returns ``(loss: float, grads: list[np.ndarray], image: np.ndarray)``
    for the canonical oracle workload on the current default backend."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    import psdr_jit_tpu as psdr
    from psdr_jit_tpu.ops import megakernel, shade_mega
    from scenes import make_cbox

    # megakernels OFF on both backends: their TPU-vs-XLA agreement is
    # separately gated (bench._parity_gate), and the general path is the
    # one that carries the one-hot gather machinery this oracle guards —
    # comparing identical graphs keeps the tolerance tight.
    prior = (megakernel.MEGA_MODE, shade_mega.INTERIOR_MODE)
    megakernel.MEGA_MODE = "off"
    shade_mega.INTERIOR_MODE = "off"

    sc = make_cbox(width=width, height=width, spp=spp, sppe=sppe,
                   sppse=sppse)
    sc.configure()
    integ = psdr.PathTracer(max_depth=depth)
    mesh, em = sc.meshes[-1], sc.emitters[0]
    bv, br = mesh.vertex_positions_raw, em.radiance
    target = jnp.asarray(
        np.random.default_rng(0).random((width * width, 3)), np.float32
    )

    def apply(p):
        dv, dr = p
        mesh.vertex_positions_raw = bv + dv
        em.radiance = br + dr

    def ploss(rows, pix):
        return jnp.sum(jnp.square(rows - target[pix]), axis=-1)

    p0 = (jnp.zeros_like(bv), jnp.zeros_like(br))
    try:
        loss, grads, image = integ.loss_and_grad(sc, p0, apply, ploss,
                                                 seed=seed)
    finally:
        mesh.vertex_positions_raw = bv
        em.radiance = br
        megakernel.MEGA_MODE, shade_mega.INTERIOR_MODE = prior
    return (float(loss),
            [np.asarray(g) for g in jax.tree_util.tree_leaves(grads)],
            np.asarray(image))


def compare(a, b):
    """Relative divergences between two ``compute`` results: dict with
    ``loss`` (rel), ``grad`` (max over leaves of sum-abs-diff / sum-abs),
    ``img`` (sum-abs rel), ``finite``."""
    import numpy as np

    la, ga, ia = a
    lb, gb, ib = b
    rel_loss = abs(la - lb) / (abs(la) + 1e-12)
    rel_grad = max(
        float(np.abs(x - y).sum() / (np.abs(x).sum() + 1e-12))
        for x, y in zip(ga, gb)
    )
    rel_img = float(np.abs(ia - ib).sum() / (np.abs(ia).sum() + 1e-12))
    finite = (np.isfinite(lb) and np.isfinite(ib).all()
              and all(np.isfinite(g).all() for g in gb))
    return {"loss": rel_loss, "grad": rel_grad, "img": rel_img,
            "finite": bool(finite)}


def save(path, result):
    import numpy as np

    loss, grads, image = result
    np.savez(path, loss=np.float64(loss), image=image,
             **{f"g{i}": g for i, g in enumerate(grads)})


def load(path):
    import numpy as np

    with np.load(path) as z:
        grads = [z[f"g{i}"] for i in range(sum(k.startswith("g")
                                               for k in z.files))]
        return float(z["loss"]), grads, z["image"]


if __name__ == "__main__":
    args = [a for a in sys.argv[1:]]
    if "--cpu" in args:
        args.remove("--cpu")
        import jax
        jax.config.update("jax_platforms", "cpu")
    out_path = args[0]
    save(out_path, compute())
    print("crosscheck written:", out_path)
