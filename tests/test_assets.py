"""Real-asset ingestion: the reference checkout's MTL + texture files.

The reference's flagship textured asset ships its .mtl and 4k .jpg textures
(models/materials/Intergalactic_Spaceship-(Wavefront).mtl, textures/) even
though the OBJ itself is absent. These exercise the loader against the real
files: Blender-on-Windows backslash paths, names with spaces, jpg decode,
and the mtllib-outside-the-obj-tree resolution (tinyobj mtl_basedir
semantics, apps/src/scene.cpp:41,132-218).
"""

import os

import numpy as np
import pytest

from mygpuraytracer_tpu.scene.obj_loader import load_obj, parse_mtl

REF = "/root/reference"
REF_MTL = f"{REF}/models/materials/Intergalactic_Spaceship-(Wavefront).mtl"

needs_ref = pytest.mark.skipif(
    not os.path.isdir(f"{REF}/models"), reason="reference checkout absent"
)


@needs_ref
def test_parse_reference_mtl_spaces_and_backslashes():
    mats = parse_mtl(REF_MTL)
    assert len(mats) == 1
    m = mats[0]
    # whole rest-of-line names, backslashes normalized
    assert m.diffuse_texname == "../textures/Intergalactic Spaceship_color_4.jpg"
    assert m.bump_texname == "../textures/Intergalactic Spaceship_nmap_2_Tris.jpg"
    assert m.specular_texname.endswith("_rough.jpg")
    assert m.emissive_texname.endswith("_emi.jpg")
    assert m.ior == pytest.approx(2.0)


@needs_ref
def test_real_spaceship_textures_load():
    obj = "scenes/models/spaceship_real.obj"
    if not os.path.isfile(obj):
        pytest.skip("run scripts/gen_spaceship_tex.py first")
    model = load_obj(obj)
    # the real 4k maps decoded via the jpg path
    for tex in (model.kd, model.ks, model.ke, model.bump):
        assert tex.present
        assert tex.width == 4096 and tex.height == 4096
    assert len(model.faces) > 20000
    # uv coordinates actually populated (cylindrical mapping)
    uvs = model.faces.uvs
    assert np.ptp(uvs[..., 0]) > 0.5 and np.ptp(uvs[..., 1]) > 0.5


@needs_ref
def test_cottage_real_asset_scene():
    from mygpuraytracer_tpu.scene import load_scene
    from mygpuraytracer_tpu.scene.device_scene import build_device_scene

    scene = load_scene("scenes/cornellCottage.txt")
    dev, meta = build_device_scene(scene)
    assert meta.num_faces == 486  # 259 OBJ f-records, fan-triangulated
    g = meta.geoms[-1]
    # sits inside the box above the floor
    assert g.aabb_min[1] > 0.0 and g.aabb_max[1] < 10.0
