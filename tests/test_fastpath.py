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


def test_bvh_tier_matches_oracle():
    """Megakernel cluster-BVH mesh tier (ops.trace.bvh_scene_hit) agrees with
    the brute-force oracle (intersect_soa) on the 23k-face spaceship scene.
    Runs the tier as a real (interpreted) Pallas kernel."""
    import jax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from mygpuraytracer_tpu.ops.trace import bvh_scene_hit, intersect_soa
    from mygpuraytracer_tpu.ops.vec3 import Vec3
    from mygpuraytracer_tpu.scene import load_scene
    from mygpuraytracer_tpu.scene.device_scene import build_device_scene

    scene = load_scene("scenes/cornellShip.txt")
    scene.set_resolution(8, 8)
    dev, meta = build_device_scene(scene, 128)
    assert meta.mesh_clusters, "expected the cluster-BVH tier to be built"

    rng = np.random.default_rng(0)
    n = 8 * 128
    # rays from random points in the box toward random directions, plus a
    # batch aimed at the ship's AABB so plenty of lanes hit mesh faces
    o_np = rng.uniform(-4, 9, size=(n, 3)).astype(np.float32)
    d_np = rng.normal(size=(n, 3)).astype(np.float32)
    aim = np.array([1.0, 3.0, 3.0]) - o_np[: n // 2]
    d_np[: n // 2] = aim + 0.3 * rng.normal(size=(n // 2, 3))
    d_np /= np.linalg.norm(d_np, axis=1, keepdims=True)

    def kernel(fp_ref, ox, oy, oz, dx, dy, dz, t_ref, nx, ny, nz, obj_ref, em_ref):
        o = Vec3(ox[:, :], oy[:, :], oz[:, :])
        d = Vec3(dx[:, :], dy[:, :], dz[:, :])
        h = bvh_scene_hit(meta, fp_ref, o, d)
        t_ref[:, :] = jnp.where(h.hit, h.t, -1.0)
        nx[:, :] = h.normal.x
        ny[:, :] = h.normal.y
        nz[:, :] = h.normal.z
        obj_ref[:, :] = h.is_obj.astype(jnp.float32)
        em_ref[:, :] = h.emit

    shape = (8, 128)
    args = [dev.face_plane] + [
        jnp.asarray(a.reshape(shape)) for a in
        (o_np[:, 0], o_np[:, 1], o_np[:, 2], d_np[:, 0], d_np[:, 1], d_np[:, 2])
    ]
    outs = pl.pallas_call(
        kernel,
        out_shape=[jax.ShapeDtypeStruct(shape, jnp.float32)] * 6,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 7,
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 6,
        interpret=True,
    )(*args)
    t_k, nx_k, ny_k, nz_k, obj_k, em_k = [np.asarray(a).ravel() for a in outs]

    o = Vec3(*(jnp.asarray(o_np[:, i]) for i in range(3)))
    d = Vec3(*(jnp.asarray(d_np[:, i]) for i in range(3)))
    ref = intersect_soa(meta, dev, o, d, 128)
    t_r = np.where(np.asarray(ref.hit), np.asarray(ref.t), -1.0)

    # plane-form vs Moller-Trumbore: identical up to f32 edge cases — allow
    # a small disagreement budget for rays grazing triangle edges
    close = np.isclose(t_k, t_r, rtol=2e-3, atol=2e-3)
    assert close.mean() > 0.995, f"t mismatch on {(~close).sum()}/{n} lanes"
    m = close & (t_k > 0)
    assert m.sum() > n // 4  # plenty of real hits compared
    for a, b in ((nx_k, ref.normal.x), (ny_k, ref.normal.y), (nz_k, ref.normal.z)):
        assert np.isclose(a[m], np.asarray(b)[m], rtol=1e-2, atol=1e-2).mean() > 0.99
    assert (obj_k[m] == np.asarray(ref.is_obj)[m].astype(np.float32)).mean() > 0.995
    np.testing.assert_allclose(em_k[m], np.asarray(ref.emit)[m], atol=1e-4)


@pytest.mark.parametrize("tier", ["rows", "rows_dma", "lists", "conds"])
def test_wavefront_pallas_mesh_tier_matches_chunked(tier):
    """intersect_soa's cluster-BVH Pallas tiers (visit-list default and the
    in-kernel cond walk) agree with the chunked brute-force stream across a
    multi-tile wavefront — including the t_cap pruning against primitive
    hits (walls in front of / behind the ship). rows_dma = the rows kernel
    with the HBM face buffer + per-visit DMA scratch forced on."""
    from mygpuraytracer_tpu.ops.trace import intersect_soa
    from mygpuraytracer_tpu.ops.vec3 import Vec3
    from mygpuraytracer_tpu.scene import load_scene
    from mygpuraytracer_tpu.scene.device_scene import build_device_scene

    # "rows_dma" is a first-class tier name (jit-cache safe) — pass through.

    scene = load_scene("scenes/cornellShip.txt")
    scene.set_resolution(8, 8)
    dev, meta = build_device_scene(scene, 128)

    rng = np.random.default_rng(1)
    n = 2 * 8 * 128 + 77  # 2 full (8,128) grid tiles + a ragged tail
    o_np = rng.uniform(-4, 9, size=(n, 3)).astype(np.float32)
    d_np = rng.normal(size=(n, 3)).astype(np.float32)
    aim = np.array([1.0, 3.0, 3.0]) - o_np[: n // 2]
    d_np[: n // 2] = aim + 0.3 * rng.normal(size=(n // 2, 3))
    d_np /= np.linalg.norm(d_np, axis=1, keepdims=True)
    o = Vec3(*(jnp.asarray(o_np[:, i]) for i in range(3)))
    d = Vec3(*(jnp.asarray(d_np[:, i]) for i in range(3)))

    fast = intersect_soa(meta, dev, o, d, 128, mesh_pallas=True, mesh_tier=tier)
    ref = intersect_soa(meta, dev, o, d, 128, mesh_pallas=False)

    # reorder variants must scatter back to identical lane order
    for mode in ("need", "coherence"):
        srt = intersect_soa(meta, dev, o, d, 128, mesh_pallas=True,
                            mesh_tier=tier, mesh_sort=mode)
        np.testing.assert_allclose(
            np.asarray(srt.t)[np.asarray(fast.hit)],
            np.asarray(fast.t)[np.asarray(fast.hit)], rtol=1e-5, atol=1e-5,
        )
        np.testing.assert_array_equal(np.asarray(srt.hit), np.asarray(fast.hit))

    t_f = np.where(np.asarray(fast.hit), np.asarray(fast.t), -1.0)
    t_r = np.where(np.asarray(ref.hit), np.asarray(ref.t), -1.0)
    close = np.isclose(t_f, t_r, rtol=2e-3, atol=2e-3)
    assert close.mean() > 0.995, f"t mismatch on {(~close).sum()}/{n} lanes"
    m = close & (t_f > 0)
    assert m.sum() > n // 4
    obj_f, obj_r = np.asarray(fast.is_obj), np.asarray(ref.is_obj)
    assert (obj_f[m] == obj_r[m]).mean() > 0.995
    for a, b in ((fast.normal.x, ref.normal.x), (fast.normal.y, ref.normal.y),
                 (fast.normal.z, ref.normal.z)):
        assert np.isclose(
            np.asarray(a)[m], np.asarray(b)[m], rtol=1e-2, atol=1e-2
        ).mean() > 0.99
    np.testing.assert_allclose(
        np.asarray(fast.emit)[m], np.asarray(ref.emit)[m], atol=1e-4
    )


def test_nearfar_walk_matches_oracle_open_sky():
    """bvh_scene_hit_nearfar (the bounce megakernel's in-kernel near-to-far
    cluster walk) agrees with the brute-force oracle on the OPEN-SKY shipOnly
    scene — including rays that miss everything (t == +inf), which must
    terminate the per-row while-loop once the candidate key vector is
    exhausted (regression: an unbounded walk spun forever on such rays and
    tripped the TPU 60 s device-program kill). Runs as an interpreted Pallas
    kernel with a mixed active mask."""
    import jax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from mygpuraytracer_tpu.ops.trace import bvh_scene_hit_nearfar, intersect_soa
    from mygpuraytracer_tpu.ops.vec3 import Vec3
    from mygpuraytracer_tpu.scene import load_scene
    from mygpuraytracer_tpu.scene.device_scene import build_device_scene

    scene = load_scene("scenes/shipOnly.txt")
    scene.set_resolution(8, 8)
    dev, meta = build_device_scene(scene, 128)
    assert meta.mesh_clusters, "expected the cluster-BVH tier to be built"

    rng = np.random.default_rng(7)
    n = 8 * 128
    o_np = rng.uniform(-4, 9, size=(n, 3)).astype(np.float32)
    d_np = rng.normal(size=(n, 3)).astype(np.float32)
    # half the rays aimed at the ship, half random (mostly open-sky misses)
    aim = np.array([1.0, 3.0, 3.0]) - o_np[: n // 2]
    d_np[: n // 2] = aim + 0.3 * rng.normal(size=(n // 2, 3))
    d_np /= np.linalg.norm(d_np, axis=1, keepdims=True)
    act_np = np.ones(n, bool)
    act_np[::7] = False  # dead lanes scattered through every row

    def kernel(fs_ref, ox, oy, oz, dx, dy, dz, act, t_ref, nx, ny, nz, obj_ref):
        o = Vec3(ox[:, :], oy[:, :], oz[:, :])
        d = Vec3(dx[:, :], dy[:, :], dz[:, :])
        h = bvh_scene_hit_nearfar(meta, fs_ref, o, d, act[:, :] > 0)
        t_ref[:, :] = jnp.where(h.hit, h.t, -1.0)
        nx[:, :] = h.normal.x
        ny[:, :] = h.normal.y
        nz[:, :] = h.normal.z
        obj_ref[:, :] = h.is_obj.astype(jnp.float32)

    shape = (8, 128)
    args = [dev.face_shift] + [
        jnp.asarray(a.reshape(shape)) for a in
        (o_np[:, 0], o_np[:, 1], o_np[:, 2], d_np[:, 0], d_np[:, 1], d_np[:, 2],
         act_np.astype(np.float32))
    ]
    outs = pl.pallas_call(
        kernel,
        out_shape=[jax.ShapeDtypeStruct(shape, jnp.float32)] * 5,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 8,
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 5,
        interpret=True,
    )(*args)
    t_k, nx_k, ny_k, nz_k = [np.asarray(a).ravel() for a in outs[:4]]

    o = Vec3(*(jnp.asarray(o_np[:, i]) for i in range(3)))
    d = Vec3(*(jnp.asarray(d_np[:, i]) for i in range(3)))
    ref = intersect_soa(meta, dev, o, d, 128)
    t_r = np.where(np.asarray(ref.hit), np.asarray(ref.t), -1.0)
    t_r = np.where(act_np, t_r, -1.0)  # dead lanes report misses

    close = np.isclose(t_k, t_r, rtol=2e-3, atol=2e-3)
    assert close.mean() > 0.995, f"t mismatch on {(~close).sum()}/{n} lanes"
    m = close & (t_k > 0)
    assert m.sum() > n // 8  # plenty of real mesh hits compared
    assert (t_k[~act_np] == -1.0).all()  # dead lanes never report hits
    for a, b in ((nx_k, ref.normal.x), (ny_k, ref.normal.y), (nz_k, ref.normal.z)):
        assert np.isclose(a[m], np.asarray(b)[m], rtol=1e-2, atol=1e-2).mean() > 0.99


def test_bvh_scenes_route_to_wavefront_by_default():
    """Cluster-BVH mesh scenes must NOT take the bounce megakernel unless
    RenderOptions.bounce_megakernel opts in: the wavefront rows tier measured
    faster on them (shipOnly 800^2: 2.46 vs 1.97 Msam/s, docs/MESH_TIERS.md
    "Bounce megakernel measured"). Guards the --megakernel auto CLI default."""
    from mygpuraytracer_tpu.config import RenderOptions
    from mygpuraytracer_tpu.render.megakernel import _uses_bvh, supports_megakernel
    from mygpuraytracer_tpu.scene import load_scene
    from mygpuraytracer_tpu.scene.device_scene import build_device_scene

    scene = load_scene("scenes/shipOnly.txt")
    scene.set_resolution(8, 8)
    _, meta = build_device_scene(scene, 128)
    assert _uses_bvh(meta)
    assert not supports_megakernel(meta, RenderOptions(megakernel=True))
    assert supports_megakernel(
        meta, RenderOptions(megakernel=True, bounce_megakernel=True)
    )


def test_intersect_active_mask_contract_fast(reference_scenes):
    """Fast-tier guard for the active= dead-lane contract (ADVICE r4): the
    full 23k-face, 3-tier variant below lives in the slow tier, so this
    covers the chunked-fallback path on the 12-face cube scene with a few
    lanes — enough to catch a regression in the masking semantics inside
    the ~7-min default suite."""
    from mygpuraytracer_tpu.ops.trace import intersect_soa
    from mygpuraytracer_tpu.ops.vec3 import Vec3
    from mygpuraytracer_tpu.scene import load_scene
    from mygpuraytracer_tpu.scene.device_scene import build_device_scene

    scene = load_scene(str(reference_scenes / "cornellObj.txt"))
    scene.set_resolution(8, 8)
    dev, meta = build_device_scene(scene, 128)

    rng = np.random.default_rng(11)
    n = 64
    o_np = rng.uniform(-4, 9, size=(n, 3)).astype(np.float32)
    d_np = rng.normal(size=(n, 3)).astype(np.float32)
    d_np /= np.linalg.norm(d_np, axis=1, keepdims=True)
    o = Vec3(*(jnp.asarray(o_np[:, i]) for i in range(3)))
    d = Vec3(*(jnp.asarray(d_np[:, i]) for i in range(3)))
    active = jnp.asarray(rng.random(n) < 0.5)

    full = intersect_soa(meta, dev, o, d, 128, mesh_pallas=False)
    masked = intersect_soa(meta, dev, o, d, 128, active=active,
                           mesh_pallas=False)
    act = np.asarray(active)
    for name in ("t", "hit", "is_obj", "material_id", "u", "v"):
        f, m = np.asarray(getattr(full, name)), np.asarray(getattr(masked, name))
        np.testing.assert_array_equal(f[act], m[act], err_msg=name)
    assert not np.asarray(masked.is_obj)[~act].any()
    t_m = np.asarray(masked.t)[~act]
    t_f = np.asarray(full.t)[~act]
    assert (t_m >= t_f - 1e-5).all()


def test_intersect_active_mask_contract():
    """intersect_soa(active=...): inactive lanes report a guaranteed mesh
    MISS (and generate no mesh visits — the perf point, measured on TPU in
    docs/MESH_TIERS.md "dead-lane masking"), while active lanes are bitwise
    unaffected. Covers the Pallas rows tier, the chunked fallback, and the
    need-partition path the bounce loop combines it with."""
    from mygpuraytracer_tpu.ops.trace import intersect_soa
    from mygpuraytracer_tpu.ops.vec3 import Vec3
    from mygpuraytracer_tpu.scene import load_scene
    from mygpuraytracer_tpu.scene.device_scene import build_device_scene

    scene = load_scene("scenes/cornellShip.txt")
    scene.set_resolution(8, 8)
    dev, meta = build_device_scene(scene, 128)

    rng = np.random.default_rng(7)
    n = 8 * 128 + 33  # one (8,128) tile + ragged tail
    o_np = rng.uniform(-4, 9, size=(n, 3)).astype(np.float32)
    d_np = rng.normal(size=(n, 3)).astype(np.float32)
    aim = np.array([1.0, 3.0, 3.0]) - o_np[: n // 2]
    d_np[: n // 2] = aim + 0.3 * rng.normal(size=(n // 2, 3))
    d_np /= np.linalg.norm(d_np, axis=1, keepdims=True)
    o = Vec3(*(jnp.asarray(o_np[:, i]) for i in range(3)))
    d = Vec3(*(jnp.asarray(d_np[:, i]) for i in range(3)))
    active = jnp.asarray(rng.random(n) < 0.25)

    for kw in (
        dict(mesh_pallas=True, mesh_tier="rows"),
        dict(mesh_pallas=True, mesh_tier="rows", mesh_sort="need"),
        dict(mesh_pallas=False),
    ):
        full = intersect_soa(meta, dev, o, d, 128, **kw)
        masked = intersect_soa(meta, dev, o, d, 128, active=active, **kw)
        act = np.asarray(active)
        # active lanes bitwise identical
        for name in ("t", "hit", "is_obj", "material_id", "u", "v"):
            f, m = np.asarray(getattr(full, name)), np.asarray(getattr(masked, name))
            np.testing.assert_array_equal(f[act], m[act], err_msg=f"{name} {kw}")
        # inactive lanes: never a mesh winner; t can only grow back to the
        # primitives-only value (the mesh could only have reduced it)
        m_obj = np.asarray(masked.is_obj)[~act]
        assert not m_obj.any(), f"mesh winner on a dead lane {kw}"
        t_m = np.asarray(masked.t)[~act]
        t_f = np.asarray(full.t)[~act]
        assert (t_m >= t_f - 1e-5).all(), kw
