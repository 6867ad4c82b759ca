"""End-to-end render tests on small resolutions (CPU backend)."""

import numpy as np
import pytest

import jax.numpy as jnp

from mygpuraytracer_tpu.config import RenderOptions
from mygpuraytracer_tpu.render import Renderer
from mygpuraytracer_tpu.scene import load_scene


@pytest.fixture(scope="module")
def cornell_small(reference_scenes):
    s = load_scene(str(reference_scenes / "cornell.txt"))
    s.set_resolution(64, 64)
    return s


def test_cornell_smoke(cornell_small):
    r = Renderer(cornell_small, RenderOptions(), seed=0)
    r.render(iterations=4)
    img = r.beauty()
    assert img.shape == (64, 64, 3)
    assert np.isfinite(img).all()
    assert img.max() > 0.5  # something bright (light or lit wall)
    assert img.mean() > 0.01  # not black
    assert img.mean() < 5.0  # and not blown out


def test_albedo_aov(cornell_small):
    r = Renderer(cornell_small, RenderOptions(), seed=0)
    r.render(iterations=1)
    alb = r.albedo_image()
    assert np.isfinite(alb).all()
    # Light pixels carry color*emittance = 5; walls carry ~0.98/0.85 colors
    assert alb.max() > 4.0
    vals = alb.reshape(-1, 3)
    # most pixels should be wall-ish albedo (0.3 - 1.0)
    frac_wall = ((vals.max(axis=1) > 0.3) & (vals.max(axis=1) <= 1.0)).mean()
    assert frac_wall > 0.5


def test_emissive_light_visible(cornell_small):
    """First-bounce emissive hits contribute color*emittance*pi ~ 15.7."""
    r = Renderer(cornell_small, RenderOptions(antialiasing=False), seed=0)
    r.render(iterations=1)
    img = r.beauty()
    assert img.max() > 10.0  # the light itself (5 * pi)


def test_first_bounce_cache_consistency(cornell_small):
    """With AA off, cache on vs off must give identical images (same seeds)."""
    opts_cache = RenderOptions(antialiasing=False, cache_first_bounce=True)
    opts_nocache = RenderOptions(antialiasing=False, cache_first_bounce=False)
    assert opts_cache.first_bounce_cache_active

    r1 = Renderer(cornell_small, opts_cache, seed=7)
    r2 = Renderer(cornell_small, opts_nocache, seed=7)
    r1.render(iterations=3)
    r2.render(iterations=3)
    np.testing.assert_allclose(r1.beauty(), r2.beauty(), atol=1e-5)


def test_accumulation_reduces_variance(cornell_small):
    r = Renderer(cornell_small, RenderOptions(), seed=0)
    r.render(iterations=1)
    img1 = r.beauty()
    r.render(iterations=7)  # 8 total
    img8 = r.beauty()
    # Variance between neighboring pixels should drop as samples accumulate
    def neighbor_var(img):
        return float(np.mean((img[:, 1:] - img[:, :-1]) ** 2))

    assert neighbor_var(img8) < neighbor_var(img1)


def test_sphere_scene(reference_scenes):
    s = load_scene(str(reference_scenes / "sphere.txt"))
    s.set_resolution(32, 32)
    r = Renderer(s, RenderOptions(), seed=0)
    r.render(iterations=2)
    img = r.beauty()
    # Emissive sphere at origin scale 3 (radius 1.5), camera at (0,5,10.5)
    # looking at (0,5,0): sphere appears below center; misses are black.
    assert np.isfinite(img).all()
    assert img.max() > 10.0  # emissive surface = 5*pi
    assert (img.reshape(-1, 3).max(axis=1) == 0).mean() > 0.5  # mostly empty


def test_glass_scene_finite(reference_scenes):
    s = load_scene(str(reference_scenes / "cornellGlass.txt"))
    s.set_resolution(48, 48)
    r = Renderer(s, RenderOptions(), seed=1)
    r.render(iterations=3)
    img = r.beauty()
    assert np.isfinite(img).all()
    assert img.mean() > 0.01


def test_obj_scene_renders(reference_scenes):
    s = load_scene(str(reference_scenes / "cornellObj.txt"))
    s.set_resolution(48, 48)
    r = Renderer(s, RenderOptions(), seed=2)
    r.render(iterations=2)
    img = r.beauty()
    assert np.isfinite(img).all()
    assert img.mean() > 0.01


def test_move_camera_resets(reference_scenes):
    # private scene: move_camera mutates the Scene, don't pollute the fixture
    scene = load_scene(str(reference_scenes / "cornell.txt"))
    scene.set_resolution(64, 64)
    r = Renderer(scene, RenderOptions(), seed=0)
    r.render(iterations=2)
    assert r.iteration == 2
    r.move_camera(position=[0.0, 5.0, 12.0])
    assert r.iteration == 0
    assert float(jnp.sum(r.image.x) + jnp.sum(r.image.y) + jnp.sum(r.image.z)) == 0.0
    r.render(iterations=1)
    assert np.isfinite(r.beauty()).all()


def test_depth_of_field_runs(cornell_small):
    r = Renderer(cornell_small, RenderOptions(depth_of_field=True), seed=0)
    r.render(iterations=1)
    assert np.isfinite(r.beauty()).all()


def test_normal_aov(cornell_small):
    r = Renderer(cornell_small, RenderOptions(antialiasing=False), seed=0)
    r.render(iterations=1)
    nrm = r.normal_image()
    assert np.isfinite(nrm).all()
    lens = np.linalg.norm(nrm.reshape(-1, 3), axis=1)
    hit = lens > 0.5
    assert hit.mean() > 0.8  # most primary rays hit the box
    np.testing.assert_allclose(lens[hit], 1.0, atol=1e-4)  # unit normals
    # back wall normals point toward camera (+z)
    center = nrm[32, 32]
    assert abs(np.linalg.norm(center) - 1.0) < 1e-3


def test_sort_by_material_identical_image(reference_scenes):
    """Material-sorted execution (pathtrace.cu:590,612) must not change the
    render: RNG streams follow the pixel id, so only lane order differs.
    (Tolerance is for XLA fusion-order float variation between the two
    compiled programs, ~1e-7 relative — not a semantic difference.)"""
    s = load_scene(str(reference_scenes / "cornellObj.txt"))
    s.set_resolution(48, 48)
    imgs = {}
    configs = [
        ("off", RenderOptions(sort_by_material=False)),
        # All three sorted-bounce implementations apply the same stable
        # permutation (RenderOptions.sort_impl) and must agree.
        ("fused", RenderOptions(sort_by_material=True, sort_impl="fused")),
        ("perm", RenderOptions(sort_by_material=True, sort_impl="perm")),
        ("argsort", RenderOptions(sort_by_material=True, sort_impl="argsort")),
    ]
    for name, opts in configs:
        r = Renderer(s, opts, seed=3)
        r.render(iterations=2)
        imgs[name] = r.beauty()
    for name in ("fused", "perm", "argsort"):
        np.testing.assert_allclose(
            imgs[name], imgs["off"], rtol=1e-5, atol=1e-6, err_msg=name
        )


def test_sort_by_material_identical_image_textured():
    """The fused sorted bounce has a static textured branch (co-sorts
    uv + texture-slot ids instead of rebuilding them as zeros) — pin it to
    the unsorted image the same way as the untextured case."""
    s = load_scene("scenes/cornellShipTex.txt")
    s.set_resolution(40, 40)
    imgs = {}
    for name, opts in [
        ("off", RenderOptions(sort_by_material=False)),
        ("fused", RenderOptions(sort_by_material=True, sort_impl="fused")),
    ]:
        r = Renderer(s, opts, seed=3)
        r.render(iterations=2)
        imgs[name] = r.beauty()
    np.testing.assert_allclose(imgs["fused"], imgs["off"], rtol=1e-5, atol=1e-6)


def test_sort_wavefront_fused_matches_argsort(reference_scenes):
    """The lean fused sort co-sorts only per-lane arrays and re-expands the
    material-constant HitSoA fields from the sorted key (render/pathtrace.py
    _sort_wavefront). Pin EVERY field bitwise against the argsort reference
    impl, which permutes all 37 arrays directly — on a scene with
    primitives + an OBJ mesh so is_obj/material coverage is real."""
    import jax
    import jax.numpy as jnp

    from mygpuraytracer_tpu.config import RenderOptions
    from mygpuraytracer_tpu.ops.trace import intersect_soa
    from mygpuraytracer_tpu.render.camera import generate_camera_rays
    from mygpuraytracer_tpu.render.pathtrace import (
        _sort_wavefront, num_rng_streams,
    )
    from mygpuraytracer_tpu.render.shade import PathStateSoA
    from mygpuraytracer_tpu.ops.rng import iteration_key
    from mygpuraytracer_tpu.ops.prng import iteration_uniforms
    from mygpuraytracer_tpu.scene.device_scene import build_device_scene
    from mygpuraytracer_tpu.ops.vec3 import Vec3

    s = load_scene(str(reference_scenes / "cornellObj.txt"))
    s.set_resolution(32, 32)
    options = RenderOptions()
    dev, meta = build_device_scene(s, options.face_chunk)
    n = 32 * 32
    U = iteration_uniforms(
        options, iteration_key(jax.random.key(7), 1), 1,
        num_rng_streams(meta.trace_depth), n,
    )
    o, d = generate_camera_rays(dev.camera, meta.resolution, options, U)
    ones = jnp.ones((n,), jnp.float32)
    state = PathStateSoA(
        origin=o, direction=d, color=Vec3(ones, ones, ones),
        remaining=jnp.full((n,), meta.trace_depth, jnp.int32),
    )
    hit = intersect_soa(meta, dev, o, d, options.face_chunk)
    pixel = jnp.arange(n, dtype=jnp.int32)
    num_materials = int(dev.mat_color.shape[0])

    outs = {}
    for impl in ("fused", "argsort"):
        st, h, pix = _sort_wavefront(meta, state, hit, pixel,
                                     num_materials, impl)
        outs[impl] = (st, h, pix)

    ref_leaves, _ = jax.tree_util.tree_flatten(outs["argsort"])
    got_leaves, _ = jax.tree_util.tree_flatten(outs["fused"])
    assert len(ref_leaves) == len(got_leaves)
    for ref, got in zip(ref_leaves, got_leaves):
        np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))


def test_bounding_box_identical_image(reference_scenes):
    """The AABB pre-test (pathtrace.cu:348-353) is a pure cull: every face of
    a geom lies inside its AABB, so results are unchanged."""
    s = load_scene(str(reference_scenes / "cornellObj.txt"))
    s.set_resolution(48, 48)
    imgs = {}
    for flag in (False, True):
        r = Renderer(
            s,
            RenderOptions(sort_by_material=False, bounding_box=flag),
            seed=4,
        )
        r.render(iterations=2)
        imgs[flag] = r.beauty()
    np.testing.assert_allclose(imgs[True], imgs[False], rtol=1e-5, atol=1e-6)


def test_bounding_box_culls_misses():
    """Rays that miss every mesh AABB take the skip branch and report inf."""
    import jax

    from mygpuraytracer_tpu.ops import vec3 as v3
    from mygpuraytracer_tpu.ops.trace import intersect_soa, mesh_aabb_mask
    from mygpuraytracer_tpu.scene import load_scene as _ls

    s = _ls("/root/reference/scenes/cornellObj.txt")
    s.set_resolution(8, 8)
    from mygpuraytracer_tpu.scene.device_scene import build_device_scene

    dev, meta = build_device_scene(s, 64)
    n = 16
    # rays pointing straight away from the scene: +z from far outside
    o = v3.Vec3(*(jnp.full((n,), c) for c in (0.0, 5.0, 100.0)))
    d = v3.Vec3(*(jnp.full((n,), c) for c in (0.0, 0.0, 1.0)))
    mask = mesh_aabb_mask(meta, o, d)
    assert not bool(np.asarray(mask).any())
    hit = intersect_soa(meta, dev, o, d, 64, bounding_box=True)
    assert np.isinf(np.asarray(hit.t)).all() or not np.asarray(hit.is_obj).any()
