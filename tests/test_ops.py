"""Analytic tests for intersection, sampling, and compaction primitives —
the renderer-level test coverage the reference lacks (SURVEY.md §4)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mygpuraytracer_tpu.ops import (
    box_intersect,
    sphere_intersect,
    compact,
    exclusive_scan,
    sort_by_material_key,
)
from mygpuraytracer_tpu.ops.intersect import aabb_intersect, intersect_scene
from mygpuraytracer_tpu.ops.sampling import (
    concentric_sample_disk,
    cosine_sample_hemisphere,
    reflect,
    refract,
    schlick_reflect_coeff,
)
from mygpuraytracer_tpu.scene.transforms import (
    build_transformation_matrix,
    inverse,
    inverse_transpose,
)


def _mats(trans, rot, scale):
    m = build_transformation_matrix(trans, rot, scale)
    return jnp.asarray(m), jnp.asarray(inverse(m)), jnp.asarray(inverse_transpose(m))


def test_sphere_intersect_outside():
    tf, itf, itt = _mats([0, 0, 0], [0, 0, 0], [2, 2, 2])  # radius 1
    o = jnp.array([[0.0, 0.0, 5.0]])
    d = jnp.array([[0.0, 0.0, -1.0]])
    t, n, outside = sphere_intersect(tf, itf, itt, o, d)
    np.testing.assert_allclose(t[0], 4.0, atol=1e-3)
    np.testing.assert_allclose(n[0], [0, 0, 1], atol=1e-4)
    assert bool(outside[0])


def test_sphere_intersect_inside():
    tf, itf, itt = _mats([0, 0, 0], [0, 0, 0], [2, 2, 2])
    o = jnp.array([[0.0, 0.0, 0.0]])
    d = jnp.array([[0.0, 0.0, -1.0]])
    t, n, outside = sphere_intersect(tf, itf, itt, o, d)
    np.testing.assert_allclose(t[0], 1.0, atol=1e-3)
    # normal flipped inward (intersections.h:139-141)
    np.testing.assert_allclose(n[0], [0, 0, 1], atol=1e-4)
    assert not bool(outside[0])


def test_sphere_miss():
    tf, itf, itt = _mats([0, 0, 0], [0, 0, 0], [1, 1, 1])
    t, _, _ = sphere_intersect(
        tf, itf, itt, jnp.array([[0.0, 5.0, 5.0]]), jnp.array([[0.0, 0.0, -1.0]])
    )
    assert t[0] == -1.0


def test_box_intersect_faces():
    tf, itf, itt = _mats([0, 0, 0], [0, 0, 0], [2, 2, 2])  # cube side 2
    o = jnp.array([[0.0, 0.0, 5.0], [5.0, 0.25, 0.0]])
    d = jnp.array([[0.0, 0.0, -1.0], [-1.0, 0.0, 0.0]])
    t, n, outside = box_intersect(tf, itf, itt, o, d)
    np.testing.assert_allclose(t, [4.0, 4.0], atol=1e-3)
    np.testing.assert_allclose(n[0], [0, 0, 1], atol=1e-4)
    np.testing.assert_allclose(n[1], [1, 0, 0], atol=1e-4)
    assert bool(outside[0]) and bool(outside[1])


def test_box_inside():
    tf, itf, itt = _mats([0, 0, 0], [0, 0, 0], [2, 2, 2])
    t, n, outside = box_intersect(
        tf, itf, itt, jnp.array([[0.0, 0.0, 0.0]]), jnp.array([[0.0, 0.0, -1.0]])
    )
    np.testing.assert_allclose(t[0], 1.0, atol=1e-3)
    assert not bool(outside[0])


def test_box_thin_wall():
    # Cornell wall: cube scaled (0.01, 10, 10) at x=-5
    tf, itf, itt = _mats([-5, 5, 0], [0, 0, 0], [0.01, 10, 10])
    t, n, _ = box_intersect(
        tf, itf, itt, jnp.array([[0.0, 5.0, 0.0]]), jnp.array([[-1.0, 0.0, 0.0]])
    )
    np.testing.assert_allclose(t[0], 4.995, atol=1e-2)
    np.testing.assert_allclose(n[0], [1, 0, 0], atol=1e-4)


def test_aabb():
    hit = aabb_intersect(
        jnp.array([-1.0, -1, -1]),
        jnp.array([1.0, 1, 1]),
        jnp.array([[0.0, 0, 5], [0.0, 5, 5]]),
        jnp.array([[0.0, 0, -1], [0.0, 0, -1]]),
    )
    assert bool(hit[0]) and not bool(hit[1])


def test_mesh_intersect_obj_scene(reference_scenes):
    from mygpuraytracer_tpu.scene import load_scene, build_device_scene

    dev, meta = build_device_scene(load_scene(str(reference_scenes / "cornellObj.txt")))
    # Ray down the camera axis toward the rotated cube at (-2, 4, -3)±
    o = jnp.array([[-2.0, 4.0, 10.0]])
    d = jnp.array([[0.0, 0.0, -1.0]])
    isect = intersect_scene(dev, o, d)
    assert float(isect.t[0]) > 0
    assert int(isect.geom_id[0]) == 6  # hits the OBJ cube before the back wall
    # hit point z should be near the cube front (z = -3 + ~sqrt(2)*... > -5)
    z_hit = 10.0 - float(isect.t[0])
    assert z_hit > -5.0


def test_cosine_hemisphere_distribution():
    key = jax.random.key(0)
    n = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), (20000, 3))
    u = jax.random.uniform(key, (20000, 2))
    dirs = cosine_sample_hemisphere(n, u[:, 0], u[:, 1])
    norms = jnp.linalg.norm(dirs, axis=-1)
    np.testing.assert_allclose(np.asarray(norms), 1.0, atol=1e-4)
    cos = dirs[:, 2]
    assert float(jnp.min(cos)) >= -1e-4
    # E[cos theta] = 2/3 for pdf = cos/pi
    assert abs(float(jnp.mean(cos)) - 2.0 / 3.0) < 0.01


def test_cosine_hemisphere_tilted_normal():
    nrm = jnp.broadcast_to(jnp.array([1.0, 1.0, 1.0]) / np.sqrt(3), (5000, 3))
    u = jax.random.uniform(jax.random.key(1), (5000, 2))
    dirs = cosine_sample_hemisphere(nrm, u[:, 0], u[:, 1])
    assert float(jnp.min(jnp.sum(dirs * nrm, axis=-1))) >= -1e-4


def test_concentric_disk():
    u = jax.random.uniform(jax.random.key(2), (10000, 2))
    p = concentric_sample_disk(u)
    r = jnp.linalg.norm(p, axis=-1)
    assert float(jnp.max(r)) <= 1.0 + 1e-5
    # uniform on disk: E[r^2] = 1/2
    assert abs(float(jnp.mean(r**2)) - 0.5) < 0.02
    np.testing.assert_allclose(
        np.asarray(concentric_sample_disk(jnp.array([[0.5, 0.5]]))), [[0, 0]], atol=1e-6
    )


def test_reflect_refract():
    d = jnp.array([[0.0, -1.0, 0.0]])
    n = jnp.array([[0.0, 1.0, 0.0]])
    np.testing.assert_allclose(np.asarray(reflect(d, n)), [[0, 1, 0]], atol=1e-6)
    # normal incidence passes straight through
    r = refract(d, n, jnp.array([1.0 / 1.5]))
    np.testing.assert_allclose(np.asarray(r), [[0, -1, 0]], atol=1e-6)
    # grazing TIR from dense to light medium -> zero vector
    d2 = jnp.array([[0.99, -0.14, 0.0]])
    d2 = d2 / jnp.linalg.norm(d2)
    r2 = refract(d2, n, jnp.array([1.5]))
    np.testing.assert_allclose(np.asarray(r2), [[0, 0, 0]], atol=1e-6)


def test_schlick():
    r = schlick_reflect_coeff(jnp.array([1.0]), 1.0, 1.5)
    np.testing.assert_allclose(float(r[0]), ((1 - 1.5) / (1 + 1.5)) ** 2, rtol=1e-5)
    r_grazing = schlick_reflect_coeff(jnp.array([0.0]), 1.0, 1.5)
    np.testing.assert_allclose(float(r_grazing[0]), 1.0, rtol=1e-5)


def test_exclusive_scan():
    x = jnp.array([3, 1, 7, 0, 4, 1, 6, 3])
    np.testing.assert_array_equal(
        np.asarray(exclusive_scan(x)), [0, 3, 4, 11, 11, 15, 16, 22]
    )


def test_compact_stable_partition():
    vals = jnp.arange(10)
    mask = jnp.array([1, 0, 1, 1, 0, 0, 1, 0, 1, 1], bool)
    count, packed = compact(mask, vals)
    assert int(count) == 6
    np.testing.assert_array_equal(np.asarray(packed[:6]), [0, 2, 3, 6, 8, 9])
    # stable_partition keeps the dead tail stable too
    np.testing.assert_array_equal(np.asarray(packed[6:]), [1, 4, 5, 7])


def test_sort_by_material_descending():
    keys = jnp.array([2, 0, 3, 1, 3, 2])
    vals = jnp.arange(6)
    skeys, svals = sort_by_material_key(keys, vals)
    np.testing.assert_array_equal(np.asarray(skeys), [3, 3, 2, 2, 1, 0])
    np.testing.assert_array_equal(np.asarray(svals), [2, 4, 0, 5, 3, 1])


def test_material_sort_perm_matches_argsort():
    """Counting-sort permutation == stable descending argsort (the
    sorted-wavefront "perm" impl must apply the identical lane order)."""
    from mygpuraytracer_tpu.ops.compaction import material_sort_perm

    rng = np.random.default_rng(7)
    keys = jnp.asarray(rng.integers(0, 5, size=257), dtype=jnp.int32)
    perm = material_sort_perm(keys, 5)
    ref = jnp.argsort(-keys, stable=True)
    np.testing.assert_array_equal(np.asarray(perm), np.asarray(ref))
