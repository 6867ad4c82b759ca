"""Bump-mapping parity: fast path TBN perturbation vs the oracle path."""

import numpy as np
import pytest

import jax.numpy as jnp

from mygpuraytracer_tpu.ops.intersect import intersect_scene
from mygpuraytracer_tpu.ops.trace import intersect_soa
from mygpuraytracer_tpu.ops.vec3 import from_array
from mygpuraytracer_tpu.scene.structs import (
    Camera,
    FaceArray,
    Geom,
    GeomType,
    Material,
    Scene,
    Texture,
)
from mygpuraytracer_tpu.scene.device_scene import build_device_scene


def _bump_scene():
    """One OBJ quad in the z=0 plane with a noisy bump texture."""
    rng = np.random.default_rng(3)
    bump_img = (rng.random((16, 16, 3)) * 255).astype(np.uint8)
    bump_img[..., 2] = 255  # mostly +z normals in tangent space

    quad = FaceArray(
        positions=np.array(
            [
                [[-1, -1, 0], [1, -1, 0], [1, 1, 0]],
                [[-1, -1, 0], [1, 1, 0], [-1, 1, 0]],
            ],
            np.float32,
        ),
        uvs=np.array(
            [[[0, 0], [1, 0], [1, 1]], [[0, 0], [1, 1], [0, 1]]], np.float32
        ),
    )
    g = Geom(type=GeomType.OBJ, materialid=0)
    g.finalize_transform()
    g.face_count = 2
    g.bump = Texture(width=16, height=16, channels=3, image=bump_img)
    g.kd = Texture(width=16, height=16, channels=3,
                   image=np.full((16, 16, 3), 128, np.uint8))

    s = Scene()
    s.geoms = [g]
    s.materials = [Material(color=np.array([0.6, 0.6, 0.6], np.float32))]
    s.all_faces = [quad]
    s.state.camera = Camera(resolution=(8, 8))
    s.state.camera.derive_fov(45.0)
    s.state.trace_depth = 4
    s.state.iterations = 1
    return s


def test_bump_parity():
    dev, meta = build_device_scene(_bump_scene())
    assert meta.has_textures

    n = 64
    rng = np.random.default_rng(11)
    # rays toward the quad from +z
    o = np.zeros((n, 3), np.float32)
    o[:, 0] = rng.uniform(-0.9, 0.9, n)
    o[:, 1] = rng.uniform(-0.9, 0.9, n)
    o[:, 2] = 3.0
    d = np.zeros((n, 3), np.float32)
    jig = rng.uniform(-0.2, 0.2, (n, 2)).astype(np.float32)
    d[:, 0] = jig[:, 0]
    d[:, 1] = jig[:, 1]
    d[:, 2] = -1.0
    d /= np.linalg.norm(d, axis=1, keepdims=True)

    ref = intersect_scene(dev, jnp.asarray(o), jnp.asarray(d))
    fast = intersect_soa(meta, dev, from_array(jnp.asarray(o)), from_array(jnp.asarray(d)))

    hit = (np.asarray(ref.t) > 0) & np.asarray(fast.hit)
    assert hit.sum() > 30

    rn = np.asarray(ref.normal)[hit]
    fn = np.stack(
        [np.asarray(fast.normal.x), np.asarray(fast.normal.y), np.asarray(fast.normal.z)],
        axis=-1,
    )[hit]
    np.testing.assert_allclose(rn, fn, atol=2e-3)
    # bump actually perturbed the flat +z normal for most lanes
    assert (np.abs(rn[:, 2] - 1.0) > 1e-4).mean() > 0.5


def test_bump_uv_parity():
    dev, meta = build_device_scene(_bump_scene())
    o = jnp.asarray([[0.25, -0.3, 2.0]], jnp.float32)
    d = jnp.asarray([[0.0, 0.0, -1.0]], jnp.float32)
    ref = intersect_scene(dev, o, d)
    fast = intersect_soa(meta, dev, from_array(o), from_array(d))
    np.testing.assert_allclose(
        [float(fast.u[0]), float(fast.v[0])], np.asarray(ref.uv)[0], atol=1e-5
    )
