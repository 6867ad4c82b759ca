"""Textured/bumped cluster-BVH Pallas tier parity.

The wavefront Pallas mesh tier must agree with the chunked Moller-Trumbore
oracle on a >256-face mesh carrying kd/ks/ke/bump textures — including the
interpolated texcoords and the TBN-perturbed normals that the kernel now
streams through its extension blocks (reference texel path:
apps/src/interactions.h:188-239, TBN: intersections.h:245-279).
"""

import numpy as np
import pytest

import jax.numpy as jnp

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


def _tex(rng, w=16, h=16, blue=False):
    img = (rng.random((h, w, 3)) * 255).astype(np.uint8)
    if blue:
        img[..., 2] = 255  # mostly +n normals in tangent space
    return Texture(width=w, height=h, channels=3, image=img)


def _wavy_mesh_scene(grid=18, with_bump=True):
    """A wavy grid mesh (2*grid^2 > 256 faces) with textures, plus an
    emissive sphere and a cube wall behind the mesh (t_cap pruning)."""
    rng = np.random.default_rng(5)
    xs = np.linspace(-2.5, 2.5, grid + 1)
    zs = np.linspace(-2.5, 2.5, grid + 1)
    X, Z = np.meshgrid(xs, zs, indexing="ij")
    Y = 0.6 * np.sin(X * 2.1) * np.cos(Z * 1.7)
    P = np.stack([X, Y, Z], axis=-1).astype(np.float32)  # [g+1,g+1,3]
    U = np.stack([(X + 2.5) / 5.0, (Z + 2.5) / 5.0], axis=-1).astype(np.float32)

    pos, uv = [], []
    for i in range(grid):
        for j in range(grid):
            a, b, c, d = P[i, j], P[i + 1, j], P[i + 1, j + 1], P[i, j + 1]
            ua, ub, uc, ud = U[i, j], U[i + 1, j], U[i + 1, j + 1], U[i, j + 1]
            pos += [[a, b, c], [a, c, d]]
            uv += [[ua, ub, uc], [ua, uc, ud]]
    faces = FaceArray(
        positions=np.asarray(pos, np.float32), uvs=np.asarray(uv, np.float32)
    )
    assert len(faces.positions) > 256

    g = Geom(type=GeomType.OBJ, materialid=0)
    g.finalize_transform()
    g.face_count = len(faces.positions)
    g.kd = _tex(rng)
    g.ks = _tex(rng)
    g.ke = _tex(rng)
    if with_bump:
        g.bump = _tex(rng, blue=True)

    wall = Geom(type=GeomType.CUBE, materialid=1)
    wall.translation = np.array([0.0, 0.0, -4.0], np.float32)
    wall.scale = np.array([10.0, 10.0, 0.2], np.float32)
    wall.finalize_transform()
    light = Geom(type=GeomType.SPHERE, materialid=2)
    light.translation = np.array([0.0, 4.0, 0.0], np.float32)
    light.finalize_transform()

    s = Scene()
    s.geoms = [g, wall, light]
    s.materials = [
        Material(color=np.array([0.6, 0.6, 0.6], np.float32)),
        Material(color=np.array([0.3, 0.4, 0.5], np.float32)),
        Material(color=np.array([1, 1, 1], np.float32), emittance=5.0),
    ]
    s.all_faces = [faces, [], []]
    s.state.camera = Camera(resolution=(8, 8))
    s.state.camera.derive_fov(45.0)
    s.state.trace_depth = 4
    s.state.iterations = 1
    return s


def _rays(n, seed=9):
    rng = np.random.default_rng(seed)
    o = rng.uniform(-3, 3, size=(n, 3)).astype(np.float32)
    o[:, 1] += 3.0
    d = rng.normal(size=(n, 3)).astype(np.float32)
    # aim half the rays at the mesh so plenty of textured lanes hit
    aim = np.array([0.0, 0.0, 0.0]) - o[: n // 2]
    d[: n // 2] = aim + 0.25 * rng.normal(size=(n // 2, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return (
        from_array(jnp.asarray(o)),
        from_array(jnp.asarray(d)),
    )


@pytest.mark.parametrize("tier", ["rows", "lists", "conds"])
@pytest.mark.parametrize("with_bump", [False, True])
def test_textured_pallas_tier_matches_chunked(with_bump, tier):
    dev, meta = build_device_scene(_wavy_mesh_scene(with_bump=with_bump), 128)
    assert meta.mesh_clusters and meta.has_textures
    o, d = _rays(8 * 128 + 61)  # one grid tile + ragged tail

    fast = intersect_soa(meta, dev, o, d, 128, mesh_pallas=True, mesh_tier=tier)
    ref = intersect_soa(meta, dev, o, d, 128, mesh_pallas=False)

    t_f = np.where(np.asarray(fast.hit), np.asarray(fast.t), -1.0)
    t_r = np.where(np.asarray(ref.hit), np.asarray(ref.t), -1.0)
    close = np.isclose(t_f, t_r, rtol=2e-3, atol=2e-3)
    assert close.mean() > 0.995, f"t mismatch on {(~close).sum()} lanes"

    m = close & (t_f > 0) & np.asarray(ref.is_obj) & np.asarray(fast.is_obj)
    assert m.sum() > 200  # plenty of textured mesh hits compared
    # interpolated texcoords agree
    for a, b in ((fast.u, ref.u), (fast.v, ref.v)):
        assert np.isclose(
            np.asarray(a)[m], np.asarray(b)[m], rtol=2e-3, atol=2e-3
        ).mean() > 0.99
    # texture slots resolve identically
    for a, b in ((fast.kd, ref.kd), (fast.ks, ref.ks), (fast.ke, ref.ke)):
        assert (np.asarray(a)[m] == np.asarray(b)[m]).all()
    # normals (bump-perturbed when with_bump) agree
    for a, b in (
        (fast.normal.x, ref.normal.x),
        (fast.normal.y, ref.normal.y),
        (fast.normal.z, ref.normal.z),
    ):
        assert np.isclose(
            np.asarray(a)[m], np.asarray(b)[m], rtol=1e-2, atol=1e-2
        ).mean() > 0.98
    if with_bump:
        assert meta.geoms[0].bump > 0  # the TBN path was actually exercised


def test_textured_tier_sort_modes_identical():
    """Reorder-before-query must scatter texcoords/TBN back to lane order."""
    dev, meta = build_device_scene(_wavy_mesh_scene(with_bump=True), 128)
    o, d = _rays(8 * 128, seed=13)
    base = intersect_soa(meta, dev, o, d, 128, mesh_pallas=True)
    for mode in ("need", "coherence"):
        srt = intersect_soa(meta, dev, o, d, 128, mesh_pallas=True, mesh_sort=mode)
        np.testing.assert_array_equal(np.asarray(srt.hit), np.asarray(base.hit))
        hit = np.asarray(base.hit)
        for a, b in ((srt.t, base.t), (srt.u, base.u), (srt.v, base.v),
                     (srt.normal.x, base.normal.x)):
            np.testing.assert_allclose(
                np.asarray(a)[hit], np.asarray(b)[hit], rtol=1e-5, atol=1e-5
            )


def test_packed_texel_fetch_matches_per_map():
    """fetch_texels_packed (one 16-ch row gather) == 4x fetch_texel_soa."""
    import jax.numpy as jnp

    from mygpuraytracer_tpu.ops.trace import fetch_texel_soa, fetch_texels_packed

    scene = _wavy_mesh_scene()
    dev, meta = build_device_scene(scene)
    assert meta.tex_pack_table, "wavy scene should be packable"
    rng = np.random.default_rng(11)
    n = 512
    u = jnp.asarray(rng.random(n, np.float32))
    v = jnp.asarray(rng.random(n, np.float32))
    # lanes alternating between the textured geom's ids and the null geom
    kd_t, ks_t, ke_t, bp_t = meta.tex_pack_table[0][:4]
    on = jnp.asarray(rng.integers(0, 2, n).astype(np.int32))
    ids = {k: on * t for k, t in
           (("kd", kd_t), ("ks", ks_t), ("ke", ke_t), ("bump", bp_t))}

    kd, kd_p, ks, ks_p, ke, bp, bp_p = fetch_texels_packed(
        dev, meta, ids["kd"], ids["ks"], ids["ke"], ids["bump"], u, v)
    for got, got_p, tex_id in ((kd, kd_p, ids["kd"]), (ks, ks_p, ids["ks"]),
                               (ke, None, ids["ke"]), (bp, bp_p, ids["bump"])):
        want, want_p = fetch_texel_soa(dev, meta, tex_id, u, v)
        for a, b in zip((got.x, got.y, got.z), (want.x, want.y, want.z)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)
        if got_p is not None:
            np.testing.assert_array_equal(np.asarray(got_p), np.asarray(want_p))


def test_mixed_resolution_falls_back_to_per_map_atlas():
    scene = _wavy_mesh_scene()
    rng = np.random.default_rng(6)
    scene.geoms[0].ks = _tex(rng, w=8, h=8)  # break the shared-resolution rule
    dev, meta = build_device_scene(scene)
    assert not meta.tex_pack_table
    assert dev.tex_atlas16.shape == (1, 16)
    # shading still resolves texels through the per-map path
    from mygpuraytracer_tpu.render.shade import albedo_soa

    o, d = _rays(512)
    hit = intersect_soa(meta, dev, o, d, 128, mesh_pallas=False)
    alb = albedo_soa(meta, dev, hit)
    arr = np.stack([np.asarray(alb.x), np.asarray(alb.y), np.asarray(alb.z)])
    assert np.isfinite(arr).all() and arr.max() > 0


@pytest.mark.parametrize("with_bump", [False, True])
def test_winner_table_f16_matches_f32(with_bump):
    """winner_table="f16" (24-byte gather rows) vs the exact f32 table.

    The intersection stream is untouched — t/hit/face selection must be
    bitwise identical; only the deferred uv/TBN fetch quantizes, bounded
    by f16 rounding of the uv coefficients (~5e-4 relative) and of the
    tangent frame."""
    dev, meta = build_device_scene(_wavy_mesh_scene(with_bump=with_bump), 128)
    o, d = _rays(8 * 128 + 61)

    f32 = intersect_soa(meta, dev, o, d, 128, mesh_pallas=True,
                        mesh_tier="rows")
    f16 = intersect_soa(meta, dev, o, d, 128, mesh_pallas=True,
                        mesh_tier="rows", winner_table="f16")

    assert (np.asarray(f16.hit) == np.asarray(f32.hit)).all()
    np.testing.assert_array_equal(np.asarray(f16.t), np.asarray(f32.t))
    m = np.asarray(f32.is_obj) & np.asarray(f32.hit)
    assert m.sum() > 200
    for a, b in ((f16.u, f32.u), (f16.v, f32.v)):
        assert np.isclose(
            np.asarray(a)[m], np.asarray(b)[m], rtol=0, atol=2e-3
        ).all()
    # a uv shift can flip a nearest-texel fetch only at texel boundaries
    for a, b in ((f16.kd, f32.kd), (f16.ks, f32.ks), (f16.ke, f32.ke)):
        assert (np.asarray(a)[m] == np.asarray(b)[m]).mean() > 0.99
    for a, b in (
        (f16.normal.x, f32.normal.x),
        (f16.normal.y, f32.normal.y),
        (f16.normal.z, f32.normal.z),
    ):
        assert np.isclose(np.asarray(a)[m], np.asarray(b)[m], atol=5e-3).all()


@pytest.mark.parametrize("with_bump", [False, True])
def test_winner_table_oct_matches_f32(with_bump):
    """winner_table="oct" (16-byte gather rows) vs the exact f32 table.

    Same contract as the f16 mode for t/hit/uv (words 0-2 are the same
    f16 uv coefficients); the tangent/bitangent additionally quantize to
    8-bit octahedral (~0.5 deg worst-case), so bump-perturbed normals get
    a wider — but still small — tolerance."""
    dev, meta = build_device_scene(_wavy_mesh_scene(with_bump=with_bump), 128)
    o, d = _rays(8 * 128 + 61)

    f32 = intersect_soa(meta, dev, o, d, 128, mesh_pallas=True,
                        mesh_tier="rows")
    oct_ = intersect_soa(meta, dev, o, d, 128, mesh_pallas=True,
                         mesh_tier="rows", winner_table="oct")

    assert (np.asarray(oct_.hit) == np.asarray(f32.hit)).all()
    np.testing.assert_array_equal(np.asarray(oct_.t), np.asarray(f32.t))
    m = np.asarray(f32.is_obj) & np.asarray(f32.hit)
    assert m.sum() > 200
    for a, b in ((oct_.u, f32.u), (oct_.v, f32.v)):
        assert np.isclose(
            np.asarray(a)[m], np.asarray(b)[m], rtol=0, atol=2e-3
        ).all()
    for a, b in ((oct_.kd, f32.kd), (oct_.ks, f32.ks), (oct_.ke, f32.ke)):
        assert (np.asarray(a)[m] == np.asarray(b)[m]).mean() > 0.99
    # normals: identical where no bump applies; ~1 deg cone when the
    # bump TBN went through the octahedral round-trip
    atol = 0.02 if with_bump else 5e-3
    for a, b in (
        (oct_.normal.x, f32.normal.x),
        (oct_.normal.y, f32.normal.y),
        (oct_.normal.z, f32.normal.z),
    ):
        assert np.isclose(np.asarray(a)[m], np.asarray(b)[m], atol=atol).all()


def test_oct8_roundtrip_angular_error():
    """Host-side oct8 encode -> kernel-side decode: every unit vector on a
    dense sphere sample returns within 1 deg (measured worst case ~0.93);
    zero vectors go to +z."""
    from mygpuraytracer_tpu.scene.device_scene import build_device_scene  # noqa: F401
    import jax
    from jax import lax

    rng = np.random.default_rng(3)
    v = rng.normal(size=(4096, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    v = np.concatenate([v, np.eye(3), -np.eye(3), np.zeros((1, 3))])

    # encode exactly as the scene builder does
    s = np.abs(v).sum(axis=1)
    s = np.where(s < 1e-20, 1.0, s)
    px, py = v[:, 0] / s, v[:, 1] / s
    fx = (1.0 - np.abs(py)) * np.where(px >= 0.0, 1.0, -1.0)
    fy = (1.0 - np.abs(px)) * np.where(py >= 0.0, 1.0, -1.0)
    neg = v[:, 2] < 0.0
    x = np.where(neg, fx, px)
    y = np.where(neg, fy, py)
    qx = np.clip(np.rint((x * 0.5 + 0.5) * 255.0), 0, 255).astype(np.uint32)
    qy = np.clip(np.rint((y * 0.5 + 0.5) * 255.0), 0, 255).astype(np.uint32)

    # decode exactly as ops/trace.py mesh_rows_hit does
    def dec(qx, qy):
        x = qx.astype(jnp.float32) * (2.0 / 255.0) - 1.0
        y = qy.astype(jnp.float32) * (2.0 / 255.0) - 1.0
        z = 1.0 - jnp.abs(x) - jnp.abs(y)
        t = jnp.maximum(-z, 0.0)
        x = x + jnp.where(x >= 0.0, -t, t)
        y = y + jnp.where(y >= 0.0, -t, t)
        inv = lax.rsqrt(x * x + y * y + z * z)
        return jnp.stack([x * inv, y * inv, z * inv], axis=1)

    out = np.asarray(jax.jit(dec)(jnp.asarray(qx), jnp.asarray(qy)))
    dots = (out[:-1] * v[:-1]).sum(axis=1)
    assert dots.min() > np.cos(np.deg2rad(1.0))
    np.testing.assert_allclose(out[-1], [0.0, 0.0, 1.0], atol=0.02)
