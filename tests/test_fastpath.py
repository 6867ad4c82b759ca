"""The SoA fast path (ops/trace.py) must agree with the reference-shaped
implementation (ops/intersect.py) — the latter is the test oracle, itself
validated analytically in test_ops.py."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mygpuraytracer_tpu.ops.intersect import intersect_scene
from mygpuraytracer_tpu.ops.trace import intersect_soa
from mygpuraytracer_tpu.ops.vec3 import Vec3, from_array
from mygpuraytracer_tpu.scene import build_device_scene, load_scene


def _random_rays(key, n, origin_box=((-4, 1, -4), (4, 9, 10))):
    k1, k2 = jax.random.split(key)
    lo = jnp.array(origin_box[0], jnp.float32)
    hi = jnp.array(origin_box[1], jnp.float32)
    o = jax.random.uniform(k1, (n, 3)) * (hi - lo) + lo
    d = jax.random.normal(k2, (n, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    return o, d


@pytest.mark.parametrize("scene_name", ["cornell.txt", "cornellObj.txt", "sphere.txt"])
def test_fastpath_matches_reference_path(reference_scenes, scene_name):
    dev, meta = build_device_scene(load_scene(str(reference_scenes / scene_name)))
    o, d = _random_rays(jax.random.key(42), 2048)

    ref = intersect_scene(dev, o, d)
    fast = intersect_soa(meta, dev, from_array(o), from_array(d))

    ref_hit = np.asarray(ref.t) > 0
    fast_hit = np.asarray(fast.hit)
    # hit/miss agreement
    np.testing.assert_array_equal(ref_hit, fast_hit)

    both = ref_hit & fast_hit
    rt = np.asarray(ref.t)[both]
    ft = np.asarray(fast.t)[both]
    np.testing.assert_allclose(rt, ft, rtol=2e-4, atol=2e-4)

    rn = np.asarray(ref.normal)[both]
    fn = np.stack(
        [np.asarray(fast.normal.x), np.asarray(fast.normal.y), np.asarray(fast.normal.z)],
        axis=-1,
    )[both]
    # normals agree except possibly at shared edges where tie-break differs
    agree = (np.abs(rn - fn) < 1e-3).all(axis=1)
    assert agree.mean() > 0.999

    rm = np.asarray(ref.material_id)[both]
    fm = np.asarray(fast.material_id)[both]
    assert (rm == fm).mean() > 0.999


def test_fastpath_material_constants(reference_scenes):
    """Resolved material fields must equal the static scene materials."""
    dev, meta = build_device_scene(load_scene(str(reference_scenes / "cornell.txt")))
    # Ray straight at the left (red) wall from inside (clear of the sphere)
    o = jnp.array([[0.0, 8.0, 3.0]])
    d = jnp.array([[-1.0, 0.0, 0.0]])
    fast = intersect_soa(meta, dev, from_array(o), from_array(d))
    assert bool(fast.hit[0])
    np.testing.assert_allclose(
        [float(fast.color.x[0]), float(fast.color.y[0]), float(fast.color.z[0])],
        [0.85, 0.35, 0.35],
        rtol=1e-6,
    )
    assert float(fast.emit[0]) == 0.0


def test_fastpath_mesh_uv(reference_scenes):
    """Mesh winner uv/geom extraction via one-hot must match the oracle."""
    dev, meta = build_device_scene(load_scene(str(reference_scenes / "cornellObj.txt")))
    o, d = _random_rays(jax.random.key(7), 4096)
    ref = intersect_scene(dev, o, d)
    fast = intersect_soa(meta, dev, from_array(o), from_array(d))
    both = (np.asarray(ref.t) > 0) & np.asarray(fast.hit)
    # geom agreement
    rg = np.asarray(ref.geom_id)[both]
    # fast path doesn't export geom_id; check material instead (1:1 per geom here)
    fm = np.asarray(fast.material_id)[both]
    rm = np.asarray(ref.material_id)[both]
    assert (rm == fm).mean() > 0.999


def test_mega_faces_path_matches(reference_scenes):
    """Literal-baked mesh (megakernel path) vs the dynamic mesh path."""
    from mygpuraytracer_tpu.ops.trace import primitives_hit

    dev, meta = build_device_scene(load_scene(str(reference_scenes / "cornellObj.txt")))
    assert meta.mega_faces and len(meta.mega_faces) == meta.num_faces == 12
    o, d = _random_rays(jax.random.key(21), 2048)
    ov, dv = from_array(o), from_array(d)

    dyn = intersect_soa(meta, dev, ov, dv)
    lit = primitives_hit(meta, ov, dv)

    np.testing.assert_array_equal(np.asarray(dyn.hit), np.asarray(lit.hit))
    both = np.asarray(dyn.hit)
    np.testing.assert_allclose(
        np.asarray(dyn.t)[both], np.asarray(lit.t)[both], rtol=2e-4, atol=2e-4
    )
    assert (
        np.asarray(dyn.material_id)[both] == np.asarray(lit.material_id)[both]
    ).mean() > 0.999
    dn = np.stack([np.asarray(dyn.normal.x), np.asarray(dyn.normal.y), np.asarray(dyn.normal.z)], -1)[both]
    ln = np.stack([np.asarray(lit.normal.x), np.asarray(lit.normal.y), np.asarray(lit.normal.z)], -1)[both]
    assert (np.abs(dn - ln) < 1e-3).all(axis=1).mean() > 0.999
