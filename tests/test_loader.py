"""XML scene loader tests (reference: src/scene/scene_loader.cpp)."""

import numpy as np
import pytest

import psdr_jit_tpu as psdr

XML = """
<scene version="0.5.0">
    <sensor type="perspective">
        <float name="fov" value="40"/>
        <transform name="toWorld">
            <lookat origin="0, 1, -4" target="0, 1, 0" up="0, 1, 0"/>
        </transform>
        <film type="hdrfilm">
            <integer name="width" value="24"/>
            <integer name="height" value="16"/>
        </film>
        <sampler type="independent">
            <integer name="sampleCount" value="2"/>
        </sampler>
    </sensor>
    <bsdf type="diffuse" id="white">
        <rgb name="reflectance" value="0.8, 0.8, 0.8"/>
    </bsdf>
    <bsdf type="roughconductor" id="metal">
        <float name="alpha" value="0.2"/>
    </bsdf>
    <bsdf type="roughdielectric" id="glass">
        <float name="alpha" value="0.1"/>
        <float name="intIOR" value="1.5"/>
    </bsdf>
    <bsdf type="microfacet" id="mf">
        <rgb name="diffuseReflectance" value="0.4, 0.3, 0.2"/>
        <float name="roughness" value="0.3"/>
    </bsdf>
    <shape type="obj">
        <string name="filename" value="floor.obj"/>
        <ref id="white"/>
        <transform name="toWorld">
            <scale value="2"/>
            <translate x="0" y="0" z="0"/>
        </transform>
    </shape>
    <shape type="obj">
        <string name="filename" value="light.obj"/>
        <ref id="white"/>
        <emitter type="area">
            <rgb name="radiance" value="10, 10, 10"/>
        </emitter>
    </shape>
</scene>
"""

FLOOR_OBJ = """
v -1 0 -1
v 1 0 -1
v 1 0 1
v -1 0 1
f 1 2 3
f 1 3 4
"""

LIGHT_OBJ = """
v -0.5 2 -0.5
v 0.5 2 -0.5
v 0.5 2 0.5
v -0.5 2 0.5
f 1 2 3
f 1 3 4
"""


@pytest.fixture()
def scene_dir(tmp_path):
    (tmp_path / "floor.obj").write_text(FLOOR_OBJ)
    (tmp_path / "light.obj").write_text(LIGHT_OBJ)
    (tmp_path / "scene.xml").write_text(XML)
    return tmp_path


def test_load_file(scene_dir):
    sc = psdr.load_file(str(scene_dir / "scene.xml"))
    assert sc.opts.width == 24 and sc.opts.height == 16
    assert sc.opts.spp == 2
    assert len(sc.sensors) == 1
    assert len(sc.bsdfs) == 4
    assert len(sc.meshes) == 2
    assert len(sc.emitters) == 1
    assert "BSDF[id=metal]" in sc.param_map
    # scale applied through to_world
    md = sc.meshes[0].configure_data()
    assert float(md.vertex_positions[:, 0].max()) == pytest.approx(2.0)


def test_loaded_scene_renders(scene_dir):
    sc = psdr.load_file(str(scene_dir / "scene.xml"))
    sc.opts.spp = 4
    sc.configure()
    img = np.asarray(psdr.PathTracer(1).renderC(sc, 0))
    assert np.isfinite(img).all()
    assert img.max() > 0.0
