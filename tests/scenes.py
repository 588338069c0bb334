"""Procedural test scenes (Cornell box from the canonical Cornell data).

Geometry is generated in code rather than loaded from the reference's OBJ
assets; coordinates are the classic published Cornell-box measurements.
"""

from __future__ import annotations

import numpy as np

import psdr_jit_tpu as psdr


def _quads_to_mesh(quads, use_face_normals=True):
    verts = []
    faces = []
    for q in quads:
        base = len(verts)
        verts.extend(q)
        n = len(q)
        for k in range(1, n - 1):
            faces.append([base, base + k, base + k + 1])
    mesh = psdr.Mesh()
    mesh.use_face_normals = use_face_normals
    mesh.load_raw(np.asarray(verts, np.float32), np.asarray(faces, np.int32))
    return mesh


FLOOR = [[(552.8, 0, 0), (0, 0, 0), (0, 0, 559.2), (549.6, 0, 559.2)]]
CEILING = [[(556, 548.8, 0), (556, 548.8, 559.2), (0, 548.8, 559.2),
            (0, 548.8, 0)]]
BACK = [[(549.6, 0, 559.2), (0, 0, 559.2), (0, 548.8, 559.2),
         (556, 548.8, 559.2)]]
GREEN_WALL = [[(0, 0, 559.2), (0, 0, 0), (0, 548.8, 0), (0, 548.8, 559.2)]]
RED_WALL = [[(552.8, 0, 0), (549.6, 0, 559.2), (556, 548.8, 559.2),
             (556, 548.8, 0)]]
LIGHT = [[(343, 548.8, 227), (343, 548.8, 332), (213, 548.8, 332),
          (213, 548.8, 227)]]
SHORT_BLOCK = [
    [(130, 165, 65), (82, 165, 225), (240, 165, 272), (290, 165, 114)],
    [(290, 0, 114), (290, 165, 114), (240, 165, 272), (240, 0, 272)],
    [(130, 0, 65), (130, 165, 65), (290, 165, 114), (290, 0, 114)],
    [(82, 0, 225), (82, 165, 225), (130, 165, 65), (130, 0, 65)],
    [(240, 0, 272), (240, 165, 272), (82, 165, 225), (82, 0, 225)],
]
TALL_BLOCK = [
    [(423, 330, 247), (265, 330, 296), (314, 330, 456), (472, 330, 406)],
    [(423, 0, 247), (423, 330, 247), (472, 330, 406), (472, 0, 406)],
    [(472, 0, 406), (472, 330, 406), (314, 330, 456), (314, 0, 456)],
    [(314, 0, 456), (314, 330, 456), (265, 330, 296), (265, 0, 296)],
    [(265, 0, 296), (265, 330, 296), (423, 330, 247), (423, 0, 247)],
]


def make_cbox(width=64, height=64, spp=4, sppe=0, sppse=0,
              light_radiance=(20.0, 20.0, 8.0), light_offset_y=-0.5,
              max_blocks=2, fov=39.0):
    """Cornell box mirroring the README example scene (README.md:50-80)."""
    sc = psdr.Scene()
    sc.opts.width = width
    sc.opts.height = height
    sc.opts.spp = spp
    sc.opts.sppe = sppe
    sc.opts.sppse = sppse

    cam = psdr.PerspectiveCamera(fov, 1e-6, 1e7)
    cam.to_world = np.array(
        [[1.0, 0, 0, 278.0], [0, 1, 0, 273.0], [0, 0, 1, -800.0],
         [0, 0, 0, 1.0]], np.float32
    )
    sc.add_Sensor(cam)

    sc.add_BSDF(psdr.DiffuseBSDF([0.0, 0.0, 0.0]), "light")
    sc.add_BSDF(psdr.DiffuseBSDF([0.7, 0.7, 0.7]), "box")
    sc.add_BSDF(psdr.DiffuseBSDF([0.95, 0.95, 0.95]), "white")
    sc.add_BSDF(psdr.DiffuseBSDF([0.20, 0.90, 0.20]), "green")
    sc.add_BSDF(psdr.DiffuseBSDF([0.90, 0.20, 0.20]), "red")

    light = _quads_to_mesh(LIGHT)
    light.to_world_raw = np.array(
        [[1.0, 0, 0, 0], [0, 1, 0, light_offset_y], [0, 0, 1, 0],
         [0, 0, 0, 1.0]], np.float32
    )
    sc.add_Mesh(light, None, "light", psdr.AreaLight(light_radiance))

    blocks = [SHORT_BLOCK, TALL_BLOCK][:max_blocks]
    for b in blocks:
        sc.add_Mesh(_quads_to_mesh(b), None, "box", None)
    sc.add_Mesh(_quads_to_mesh(FLOOR), None, "white", None)
    sc.add_Mesh(_quads_to_mesh(CEILING), None, "white", None)
    sc.add_Mesh(_quads_to_mesh(BACK), None, "white", None)
    sc.add_Mesh(_quads_to_mesh(GREEN_WALL), None, "green", None)
    sc.add_Mesh(_quads_to_mesh(RED_WALL), None, "red", None)
    return sc
