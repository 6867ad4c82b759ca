"""Scene layer golden tests: values hand-derived from the reference scene
files (scenes/*.txt) and parser semantics (apps/src/scene.cpp)."""

import math

import numpy as np
import pytest

from mygpuraytracer_tpu.scene import GeomType, load_scene, build_device_scene
from mygpuraytracer_tpu.scene.transforms import build_transformation_matrix


def test_cornell_materials(cornell_scene):
    s = cornell_scene
    assert len(s.materials) == 5
    light = s.materials[0]
    assert light.emittance == 5.0
    np.testing.assert_allclose(light.color, [1, 1, 1])
    red = s.materials[2]
    np.testing.assert_allclose(red.color, [0.85, 0.35, 0.35], rtol=1e-6)
    mirror = s.materials[4]
    assert mirror.has_reflective == 1.0
    np.testing.assert_allclose(mirror.specular_color, [0.98, 0.98, 0.98], rtol=1e-6)


def test_cornell_camera(cornell_scene):
    cam = cornell_scene.state.camera
    st = cornell_scene.state
    assert cam.resolution == (800, 800)
    assert st.iterations == 5000
    assert st.trace_depth == 8
    assert st.image_name == "cornell"
    np.testing.assert_allclose(cam.position, [0, 5, 10.5])
    np.testing.assert_allclose(cam.look_at, [0, 5, 0])
    # fovy 45 -> yscaled = tan(45deg) = 1, pixelLength = 2/800
    np.testing.assert_allclose(cam.pixel_length, [2 / 800, 2 / 800], rtol=1e-6)
    np.testing.assert_allclose(cam.fov[1], 45.0)
    # main.cpp rebuild: view toward lookAt, right = cross(view, (0,1,0))
    np.testing.assert_allclose(cam.view, [0, 0, -1], atol=1e-6)
    np.testing.assert_allclose(cam.right, [1, 0, 0], atol=1e-6)
    np.testing.assert_allclose(cam.up, [0, 1, 0], atol=1e-6)


def test_cornell_geoms(cornell_scene):
    s = cornell_scene
    assert len(s.geoms) == 7
    assert all(g.type == GeomType.CUBE for g in s.geoms[:6])
    assert s.geoms[6].type == GeomType.SPHERE  # specular sphere
    light = s.geoms[0]
    np.testing.assert_allclose(light.translation, [0, 10, 0])
    np.testing.assert_allclose(light.scale, [3, 0.3, 3])
    assert light.materialid == 0


def test_transform_matrix_semantics():
    # T * Rx * Ry * Rz * S with degrees (utilities.cpp:65-72)
    m = build_transformation_matrix([1, 2, 3], [0, 90, 0], [2, 2, 2])
    # Ry(90): x-axis -> -z ; point (1,0,0)*2 -> (0,0,-2) + (1,2,3)
    p = m @ np.array([1, 0, 0, 1.0])
    np.testing.assert_allclose(p[:3], [1, 2, 1], atol=1e-5)


def test_obj_scene_synthesized_material(reference_scenes):
    s = load_scene(str(reference_scenes / "cornellObj.txt"))
    # OBJECT 6 is obj: 'material 4' line is dead text (scene.cpp:274-282);
    # a 6th material is synthesized from cube.mtl's first material.
    obj_geom = s.geoms[6]
    assert obj_geom.type == GeomType.OBJ
    assert obj_geom.materialid == len(s.materials) - 1
    synth = s.materials[obj_geom.materialid]
    np.testing.assert_allclose(synth.color, [0.64, 0.64, 0.64], rtol=1e-5)
    np.testing.assert_allclose(synth.specular_color, [0.5, 0.5, 0.5], rtol=1e-5)
    assert synth.has_reflective == 0.0
    assert synth.emittance == 0.0
    # cube.obj: 6 quads fan-triangulated -> 12 triangles
    assert obj_geom.face_count == 12
    assert len(s.all_faces[6]) == 12
    np.testing.assert_allclose(obj_geom.min_pos, [0, 0, 0])
    np.testing.assert_allclose(obj_geom.max_pos, [2, 2, 2])


def test_device_scene_cornell(cornell_scene):
    dev, meta = build_device_scene(cornell_scene)
    assert meta.num_geoms == 7
    assert meta.resolution == (800, 800)
    assert not meta.has_obj
    assert dev.transform.shape == (7, 4, 4)
    # inverse really inverts
    prod = np.einsum("gij,gjk->gik", np.asarray(dev.transform), np.asarray(dev.inverse_transform))
    np.testing.assert_allclose(prod, np.broadcast_to(np.eye(4), (7, 4, 4)), atol=1e-4)
    # padded faces buffer exists but is degenerate
    assert dev.face_v0.shape[0] >= 1
    assert meta.num_faces == 0


def test_device_scene_obj(reference_scenes):
    dev, meta = build_device_scene(load_scene(str(reference_scenes / "cornellObj.txt")))
    assert meta.has_obj
    assert meta.num_faces == 12
    # world-space AABB of the scaled/rotated cube is centered at TRANS (-2,4,-3)
    gi = 6
    center = (np.asarray(dev.aabb_min[gi]) + np.asarray(dev.aabb_max[gi])) / 2
    # cube.obj spans [0,2]^3, scale 2, rotated 45deg about y, translated (-2,4,-3):
    # local center (1,1,1) -> scaled (2,2,2) ... transform applies to vertices
    m = np.asarray(dev.transform[gi])
    expect = (m @ np.array([1, 1, 1, 1.0]))[:3]
    np.testing.assert_allclose(center, expect, atol=1e-4)


def test_sphere_scene(reference_scenes):
    s = load_scene(str(reference_scenes / "sphere.txt"))
    assert len(s.geoms) == 1
    assert s.geoms[0].type == GeomType.SPHERE
    assert s.materials[0].emittance == 5.0


def test_glass_scene(reference_scenes):
    s = load_scene(str(reference_scenes / "cornellGlass.txt"))
    refr = [m for m in s.materials if m.has_refractive > 0]
    assert refr, "glass scene should have a refractive material"
