"""Mitsuba-0.5-style XML scene loader (reference: src/scene/scene_loader.cpp).

Supports the same node set as the reference: one ``<sensor type="perspective">``
(film/sampler -> RenderOption), ``<emitter type="envmap">``, ``<bsdf>`` of
types diffuse / roughconductor / roughdielectric / microfacet / normalmap,
and ``<shape type="obj">`` with ``<ref>`` BSDF, optional area emitter and
``face_normals`` flag.  Transforms: translate / rotate / scale / lookat /
matrix (scene_loader.cpp:81-128).
"""

from __future__ import annotations

import os
import xml.etree.ElementTree as ET

import numpy as np
import jax.numpy as jnp

from ..core import transform as xf
from ..core.bitmap import Bitmap
from ..shape.mesh import Mesh
from ..bsdf import (
    DiffuseBSDF, MicrofacetBSDF, RoughConductorBSDF, RoughDielectricBSDF,
    NormalMapBSDF,
)
from ..emitter import AreaLight, EnvironmentMap
from ..sensor import PerspectiveCamera
from .scene import Scene


def _parse_vector(text: str):
    parts = [float(x) for x in text.replace(",", " ").split()]
    if len(parts) == 1:
        parts = parts * 3
    return np.asarray(parts, np.float32)


def _parse_named(node, name, default=None):
    for child in node:
        if child.get("name") == name:
            tag = child.tag
            if tag in ("float", "integer"):
                v = float(child.get("value"))
                return int(v) if tag == "integer" else v
            if tag in ("rgb", "spectrum", "vector", "point"):
                return _parse_vector(child.get("value"))
            if tag == "string":
                return child.get("value")
            if tag == "boolean":
                return child.get("value").lower() == "true"
    return default


def _parse_transform(node):
    m = jnp.eye(4, dtype=jnp.float32)
    if node is None:
        return m
    for child in node:
        tag = child.tag
        if tag == "translate":
            v = np.asarray(
                [float(child.get(a, 0.0)) for a in "xyz"], np.float32
            )
            m = xf.translate(v) @ m
        elif tag == "scale":
            if child.get("value") is not None:
                v = _parse_vector(child.get("value"))
            else:
                v = np.asarray(
                    [float(child.get(a, 1.0)) for a in "xyz"], np.float32
                )
            m = xf.scale(v) @ m
        elif tag == "rotate":
            axis = np.asarray(
                [float(child.get(a, 0.0)) for a in "xyz"], np.float32
            )
            m = xf.rotate(axis, float(child.get("angle", 0.0))) @ m
        elif tag == "lookat":
            origin = _parse_vector(child.get("origin"))
            target = _parse_vector(child.get("target"))
            up = _parse_vector(child.get("up", "0, 1, 0"))
            m = xf.look_at(origin, target, up) @ m
        elif tag == "matrix":
            vals = [float(x) for x in child.get("value").split()]
            m = jnp.asarray(vals, jnp.float32).reshape(4, 4) @ m
    return m


def _load_texture_or_value(node, name, channels, default, base_dir="."):
    """<rgb>/<float> constant or <texture><string name="filename"> file.

    Texture filenames resolve against the scene file's directory, exactly
    like OBJ and envmap paths (scene_loader.cpp resolves everything
    relative to the scene)."""
    for child in node:
        if child.get("name") != name:
            continue
        if child.tag == "texture":
            fname = _parse_named(child, "filename")
            from ..utils.image import read_image

            arr = read_image(os.path.join(base_dir, fname))
            if channels == 1 and arr.ndim == 3:
                arr = arr[..., :1]
            return Bitmap.from_array(arr)
        if child.tag in ("rgb", "spectrum"):
            return Bitmap.from_value(_parse_vector(child.get("value")), channels)
        if child.tag == "float":
            return Bitmap.from_value(
                np.full(channels, float(child.get("value")), np.float32),
                channels,
            )
    return Bitmap.from_value(np.asarray(default, np.float32), channels)


def _parse_bsdf(node, base_dir="."):
    t = node.get("type")
    if t == "diffuse":
        b = DiffuseBSDF()
        b.reflectance = _load_texture_or_value(
            node, "reflectance", 3, (0.5, 0.5, 0.5), base_dir
        )
        return b
    if t == "microfacet":
        b = MicrofacetBSDF()
        b.specularReflectance = _load_texture_or_value(
            node, "specularReflectance", 3, (0.04,) * 3, base_dir
        )
        b.diffuseReflectance = _load_texture_or_value(
            node, "diffuseReflectance", 3, (0.5,) * 3, base_dir
        )
        b.roughness = _load_texture_or_value(node, "roughness", 1, (0.5,),
                                             base_dir)
        return b
    if t == "roughconductor":
        # alpha/eta/k accept textures like the reference's load_texture
        # route (scene_loader.cpp:336-357), not just scalars
        b = RoughConductorBSDF()
        b.alpha_u = _load_texture_or_value(node, "alpha", 1, (0.1,), base_dir)
        b.alpha_v = _load_texture_or_value(node, "alpha", 1, (0.1,), base_dir)
        b.eta = _load_texture_or_value(
            node, "eta", 3, (0.2004, 0.9228, 1.102), base_dir
        )
        b.k = _load_texture_or_value(
            node, "k", 3, (3.913, 2.448, 2.1765), base_dir
        )
        return b
    if t == "roughdielectric":
        int_ior = _parse_named(node, "intIOR", 1.5)
        ext_ior = _parse_named(node, "extIOR", 1.0)
        b = RoughDielectricBSDF(int_ior=int_ior, ext_ior=ext_ior)
        b.alpha_u = _load_texture_or_value(node, "alpha", 1, (0.1,), base_dir)
        b.alpha_v = b.alpha_u
        return b
    if t == "normalmap":
        nested = None
        for child in node:
            if child.tag == "bsdf":
                nested = _parse_bsdf(child, base_dir)
        nmap = _load_texture_or_value(node, "normalmap", 3, (0.5, 0.5, 1.0),
                                      base_dir)
        return NormalMapBSDF(nmap, nested or DiffuseBSDF())
    raise ValueError(f"Unknown BSDF type: {t}")


def load_string(text: str, base_dir: str = ".") -> Scene:
    root = ET.fromstring(text)
    assert root.tag == "scene"
    sc = Scene()

    # reference node ordering (scene_loader.cpp:209-245): all sensors,
    # then all bsdfs, then emitters, then shapes — so a <shape> may <ref>
    # a BSDF defined LATER in the document
    ordered = (
        [n for n in root if n.tag == "sensor"]
        + [n for n in root if n.tag == "bsdf"]
        + [n for n in root if n.tag == "emitter"]
        + [n for n in root if n.tag == "shape"]
    )
    for node in ordered:
        if node.tag == "sensor":
            assert node.get("type") == "perspective", "Only perspective sensors"
            fov = _parse_named(node, "fov", 60.0)
            near = _parse_named(node, "nearClip", 1e-6)
            far = _parse_named(node, "farClip", 1e7)
            cam = PerspectiveCamera(fov, near, far)
            for child in node:
                # the reference takes the first <transform> child whatever
                # its name attribute is (scene_loader.cpp:269)
                if child.tag == "transform":
                    cam.to_world_raw = _parse_transform(child)
                if child.tag == "film":
                    sc.opts.width = int(_parse_named(child, "width", 128))
                    sc.opts.height = int(_parse_named(child, "height", 128))
                if child.tag == "sampler":
                    sc.opts.spp = int(_parse_named(child, "sampleCount", 1))
            sc.add_Sensor(cam)
        elif node.tag == "emitter" and node.get("type") == "envmap":
            fname = _parse_named(node, "filename")
            from ..utils.image import read_image

            env = EnvironmentMap(
                read_image(os.path.join(base_dir, fname))
                if fname else None,
                scale=_parse_named(node, "scale", 1.0),
            )
            for child in node:
                if child.tag == "transform":
                    env.to_world_raw = _parse_transform(child)
            sc.add_EnvironmentMap(env)
        elif node.tag == "bsdf":
            b = _parse_bsdf(node, base_dir)
            sc.add_BSDF(b, node.get("id", f"bsdf{len(sc.bsdfs)}"))
        elif node.tag == "shape":
            assert node.get("type") == "obj"
            fname = _parse_named(node, "filename")
            mesh = Mesh()
            mesh.use_face_normals = bool(
                _parse_named(node, "face_normals", False)
            )
            mesh.load(os.path.join(base_dir, fname))
            to_world = jnp.eye(4, dtype=jnp.float32)
            bsdf_id = ""
            emitter = None
            for child in node:
                if child.tag == "transform":
                    to_world = _parse_transform(child)
                elif child.tag == "ref":
                    bsdf_id = child.get("id")
                elif child.tag == "emitter":
                    radiance = _parse_named(child, "radiance", (1.0, 1.0, 1.0))
                    emitter = AreaLight(np.atleast_1d(radiance))
            sc.add_Mesh(mesh, to_world, bsdf_id, emitter)
    return sc


def load_file(path: str) -> Scene:
    with open(path) as f:
        return load_string(f.read(), base_dir=os.path.dirname(path) or ".")
