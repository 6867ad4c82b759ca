"""Fast SoA trace core: statically-unrolled, gather-free intersection.

This is the hot path behind render/pathtrace.py. Rationale (measured on v5e):
a single gather over a 640k-lane wavefront costs ~10 ms — more than an entire
bounce should. So:

- geometry dispatch is a *python-level* unrolled loop over the scene's static
  geom list (SceneMeta.geoms); transforms and material constants are program
  literals, and the nearest-hit winner is carried through running selects;
- mesh triangles stream through a lax.scan in [rays, chunk] panels, and the
  winning face's attributes (normal, uv, owning geom) are extracted with a
  first-match one-hot reduction instead of a gather;
- all vectors are SoA ([N] per component, ops/vec3.py).

Semantics match ops/intersect.py (the reference-shaped implementation, which
doubles as this module's test oracle — see tests/test_fastpath.py).
"""

from __future__ import annotations

import os
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from ..scene.structs import GeomType
from . import vec3 as v3
from .vec3 import Vec3

HIT_EPS = 1e-4


class HitSoA(NamedTuple):
    """Nearest-hit record with materials already resolved (no gathers)."""

    t: jnp.ndarray  # f32[N], +inf for miss
    hit: jnp.ndarray  # bool[N]
    normal: Vec3
    is_obj: jnp.ndarray  # bool[N] — hit geom is OBJ-typed
    # material fields (resolved statically per geom)
    color: Vec3
    spec_color: Vec3
    spec_ex: jnp.ndarray
    refl: jnp.ndarray
    refr: jnp.ndarray
    ior: jnp.ndarray
    emit: jnp.ndarray
    material_id: jnp.ndarray  # i32[N] (for sort-by-material parity)
    # texture support (zeros when the scene has no textures)
    u: jnp.ndarray
    v: jnp.ndarray
    kd: jnp.ndarray  # i32[N] texture slots of the hit geom
    ks: jnp.ndarray
    ke: jnp.ndarray
    bump: jnp.ndarray


def box_intersect_soa(g, o: Vec3, d: Vec3):
    """Reference slab test (intersections.h:48-90) on literal matrices.

    Returns (t_world [N] with +inf miss, normal Vec3).
    """
    qo = v3.xform_point(g.inverse_transform, o)
    qd = v3.normalize(v3.xform_dir(g.inverse_transform, d))

    def axis(qo_a, qd_a):
        t1 = (-0.5 - qo_a) / qd_a
        t2 = (0.5 - qo_a) / qd_a
        ta = jnp.minimum(t1, t2)
        tb = jnp.maximum(t1, t2)
        sign = jnp.where(t2 < t1, 1.0, -1.0)
        return jnp.where(ta > 0, ta, -1e38), tb, sign

    tax, tbx, sx = axis(qo.x, qd.x)
    tay, tby, sy = axis(qo.y, qd.y)
    taz, tbz, sz = axis(qo.z, qd.z)

    tmin = jnp.maximum(jnp.maximum(tax, tay), taz)
    tmax = jnp.minimum(jnp.minimum(tbx, tby), tbz)
    hit = (tmax >= tmin) & (tmax > 0)
    inside = tmin <= 0
    t_loc = jnp.where(inside, tmax, tmin)

    # axis that set t_loc, priority x > y > z (argmax/argmin first-match).
    # Written as logical ops, not where-on-bools: Mosaic cannot lower a
    # select over i1 vectors.
    ux = (inside & (tbx == tmax)) | (~inside & (tax == tmin))
    uy = ~ux & ((inside & (tby == tmax)) | (~inside & (tay == tmin)))
    uz = ~ux & ~uy
    ln = Vec3(
        jnp.where(ux, sx, 0.0), jnp.where(uy, sy, 0.0), jnp.where(uz, sz, 0.0)
    )

    p_loc = Vec3(
        qo.x + (t_loc - HIT_EPS) * qd.x,
        qo.y + (t_loc - HIT_EPS) * qd.y,
        qo.z + (t_loc - HIT_EPS) * qd.z,
    )
    p_w = v3.xform_point(g.transform, p_loc)
    normal = v3.normalize(v3.xform_dir(g.inv_transpose, ln))
    t = v3.length(o - p_w)
    return jnp.where(hit, t, jnp.inf), normal


def sphere_intersect_soa(g, o: Vec3, d: Vec3):
    """Reference quadratic test (intersections.h:102-144), radius 0.5."""
    qo = v3.xform_point(g.inverse_transform, o)
    qd = v3.normalize(v3.xform_dir(g.inverse_transform, d))

    vd = v3.dot(qo, qd)
    radicand = vd * vd - (v3.dot(qo, qo) - 0.25)
    root = jnp.sqrt(jnp.maximum(radicand, 0.0))
    t1 = -vd + root
    t2 = -vd - root
    both_neg = (t1 < 0) & (t2 < 0)
    both_pos = (t1 > 0) & (t2 > 0)
    t_loc = jnp.where(both_pos, jnp.minimum(t1, t2), jnp.maximum(t1, t2))
    outside = both_pos
    hit = (radicand >= 0) & ~both_neg

    p_loc = Vec3(
        qo.x + (t_loc - HIT_EPS) * qd.x,
        qo.y + (t_loc - HIT_EPS) * qd.y,
        qo.z + (t_loc - HIT_EPS) * qd.z,
    )
    p_w = v3.xform_point(g.transform, p_loc)
    n = v3.normalize(v3.xform_dir(g.inv_transpose, p_loc))
    n = v3.where(outside, n, -n)
    t = v3.length(o - p_w)
    return jnp.where(hit, t, jnp.inf), n


def mesh_intersect_soa(meta, dev, o: Vec3, d: Vec3, chunk: int, with_bump: bool = False):
    """Nearest world-space triangle via chunked Moller-Trumbore.

    Returns (t [N], normal Vec3 (unnormalized cross), u, v, geom_id [N],
    bump_extras). Attributes come from a first-match one-hot reduction over
    each chunk — no gathers anywhere. When ``with_bump`` the winner's unit
    tangent/bitangent are carried too (per-face constants precomputed at
    load, TBN inputs of intersections.h:245-279).
    """
    F = dev.face_cols[0].shape[0]
    n = o.x.shape[0]
    chunk = min(chunk, F)
    while F % chunk:
        chunk //= 2
    n_chunks = F // chunk
    v0x, v0y, v0z, e1x, e1y, e1z, e2x, e2y, e2z = dev.face_cols
    uv0u, uv0v, uv1u, uv1v, uv2u, uv2v = dev.face_uv_cols

    n_extra = 6  # tangent(3) + bitangent(3)

    def body(carry, ci):
        bt, bnx, bny, bnz, bu, bv, bgid, bex = carry
        s = ci * chunk
        sl = lambda a: lax.dynamic_slice_in_dim(a, s, chunk)
        f_v0x, f_v0y, f_v0z = sl(v0x), sl(v0y), sl(v0z)
        f_e1x, f_e1y, f_e1z = sl(e1x), sl(e1y), sl(e1z)
        f_e2x, f_e2y, f_e2z = sl(e2x), sl(e2y), sl(e2z)
        f_gid = sl(dev.face_geom)

        dx, dy, dz = d.x[:, None], d.y[:, None], d.z[:, None]
        ox, oy, oz = o.x[:, None], o.y[:, None], o.z[:, None]

        # pvec = cross(d, e2): [N, C]
        px = dy * f_e2z - dz * f_e2y
        py = dz * f_e2x - dx * f_e2z
        pz = dx * f_e2y - dy * f_e2x
        det = f_e1x * px + f_e1y * py + f_e1z * pz
        inv_det = 1.0 / jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
        tx, ty, tz = ox - f_v0x, oy - f_v0y, oz - f_v0z
        u = (tx * px + ty * py + tz * pz) * inv_det
        # qvec = cross(tvec, e1)
        qx = ty * f_e1z - tz * f_e1y
        qy = tz * f_e1x - tx * f_e1z
        qz = tx * f_e1y - ty * f_e1x
        vv = (dx * qx + dy * qy + dz * qz) * inv_det
        t = (f_e2x * qx + f_e2y * qy + f_e2z * qz) * inv_det
        ok = (
            (jnp.abs(det) > 1e-12)
            & (u >= 0.0)
            & (vv >= 0.0)
            & (u + vv <= 1.0)
            & (t > HIT_EPS)
        )
        t = jnp.where(ok, t, jnp.inf)  # [N,C]
        tc = jnp.min(t, axis=1)  # [N]
        # first-match one-hot of the chunk winner
        is_min = (t == tc[:, None]) & jnp.isfinite(t)
        first = jnp.cumsum(is_min.astype(jnp.int32), axis=1) == 1
        oh = (is_min & first).astype(t.dtype)

        # face normal = cross(e1, e2) (world space), picked via one-hot sum
        fnx = f_e1y * f_e2z - f_e1z * f_e2y
        fny = f_e1z * f_e2x - f_e1x * f_e2z
        fnz = f_e1x * f_e2y - f_e1y * f_e2x
        cnx = jnp.sum(oh * fnx, axis=1)
        cny = jnp.sum(oh * fny, axis=1)
        cnz = jnp.sum(oh * fnz, axis=1)
        # interpolated texcoord (intersections.h:226): w*uv0 + u*uv1 + v*uv2
        ww = 1.0 - u - vv
        tex_u = ww * sl(uv0u) + u * sl(uv1u) + vv * sl(uv2u)
        tex_v = ww * sl(uv0v) + u * sl(uv1v) + vv * sl(uv2v)
        cu = jnp.sum(oh * tex_u, axis=1)
        cv = jnp.sum(oh * tex_v, axis=1)
        cgid = jnp.sum(oh * f_gid.astype(t.dtype), axis=1)

        better = tc < bt
        if with_bump:
            cex = [jnp.sum(oh * sl(col), axis=1) for col in dev.face_tb_cols]
            bex = tuple(jnp.where(better, c, b) for c, b in zip(cex, bex))
        return (
            jnp.where(better, tc, bt),
            jnp.where(better, cnx, bnx),
            jnp.where(better, cny, bny),
            jnp.where(better, cnz, bnz),
            jnp.where(better, cu, bu),
            jnp.where(better, cv, bv),
            jnp.where(better, cgid, bgid),
            bex,
        ), None

    zeros = jnp.zeros((n,), jnp.float32)
    extras0 = tuple(jnp.zeros((n,), jnp.float32) for _ in range(n_extra)) if with_bump else ()
    init = (
        jnp.full((n,), jnp.inf, jnp.float32),
        zeros, zeros, zeros, zeros, zeros, zeros, extras0,
    )
    (bt, bnx, bny, bnz, bu, bv, bgid, bex), _ = lax.scan(
        body, init, jnp.arange(n_chunks)
    )
    return bt, Vec3(bnx, bny, bnz), bu, bv, bgid, bex


def intersect_primitives_soa(meta, o: Vec3, d: Vec3):
    """Statically-unrolled primitive (cube/sphere) intersection with material
    resolution. Shape-agnostic (works on [N] wavefronts and on 2D VMEM tiles
    inside Pallas kernels — the megakernel reuses this directly).

    Returns the mutable field tuple used by intersect_soa's mesh merge.
    """
    f32 = jnp.float32
    zeros = jnp.zeros_like(o.x)
    izeros = jnp.zeros(o.x.shape, jnp.int32)

    t_best = jnp.full(o.x.shape, jnp.inf, f32)
    normal = Vec3(zeros, zeros, zeros)
    col = Vec3(zeros, zeros, zeros)
    spec = Vec3(zeros, zeros, zeros)
    spec_ex = zeros
    refl = zeros
    refr = zeros
    ior = zeros
    emit = zeros
    mat_id = izeros
    is_obj = jnp.zeros(o.x.shape, bool)
    uu = zeros
    vv = zeros
    kd = izeros
    ks = izeros
    ke = izeros
    bump = izeros

    def set_mat(better, g, _col, _spec, _spec_ex, _refl, _refr, _ior, _emit, _mid,
                _kd, _ks, _ke, _bump):
        _col = v3.where(better, v3.splat(g.color), _col)
        _spec = v3.where(better, v3.splat(g.spec_color), _spec)
        _spec_ex = jnp.where(better, g.spec_exponent, _spec_ex)
        _refl = jnp.where(better, g.has_reflective, _refl)
        _refr = jnp.where(better, g.has_refractive, _refr)
        _ior = jnp.where(better, g.ior, _ior)
        _emit = jnp.where(better, g.emittance, _emit)
        _mid = jnp.where(better, g.material_id, _mid)
        _kd = jnp.where(better, g.kd, _kd)
        _ks = jnp.where(better, g.ks, _ks)
        _ke = jnp.where(better, g.ke, _ke)
        _bump = jnp.where(better, g.bump, _bump)
        return _col, _spec, _spec_ex, _refl, _refr, _ior, _emit, _mid, _kd, _ks, _ke, _bump

    # ---- primitives: static unroll (first geom wins ties, like the
    #      strict `t_min > t` scan in pathtrace.cu:360) ----------------------
    for gi, g in enumerate(meta.geoms):
        if g.type == int(GeomType.CUBE):
            t, nrm = box_intersect_soa(g, o, d)
        elif g.type == int(GeomType.SPHERE):
            t, nrm = sphere_intersect_soa(g, o, d)
        else:
            continue  # TRIANGLE has no dispatch case; OBJ handled below
        better = t < t_best
        t_best = jnp.where(better, t, t_best)
        normal = v3.where(better, nrm, normal)
        is_obj = is_obj & ~better  # (no select-on-bool: Mosaic constraint)
        (col, spec, spec_ex, refl, refr, ior, emit, mat_id, kd, ks, ke, bump) = set_mat(
            better, g, col, spec, spec_ex, refl, refr, ior, emit, mat_id, kd, ks, ke, bump
        )

    return (
        t_best, normal, is_obj, col, spec, spec_ex, refl, refr, ior, emit,
        mat_id, uu, vv, kd, ks, ke, bump, set_mat,
    )


def primitives_hit(meta, o: Vec3, d: Vec3) -> HitSoA:
    """HitSoA from primitives + literal-baked small meshes (meta.mega_faces).

    The megakernel entry: fully gather-free — triangle vertices arrive as
    program constants, so even the mesh test is pure register math. Texcoords
    are not produced (the megakernel path excludes textured scenes).
    """
    (t_best, normal, is_obj, col, spec, spec_ex, refl, refr, ior, emit,
     mat_id, uu, vv, kd, ks, ke, bump, set_mat) = intersect_primitives_soa(meta, o, d)

    for gi, v0c, e1c, e2c, nrmc in meta.mega_faces:
        v0 = v3.splat(v0c)
        e1 = v3.splat(e1c)
        e2 = v3.splat(e2c)
        pvec = v3.cross(d, e2)
        det = v3.dot(e1, pvec)
        inv_det = 1.0 / jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
        tvec = o - v0
        u = v3.dot(tvec, pvec) * inv_det
        qvec = v3.cross(tvec, e1)
        vv_b = v3.dot(d, qvec) * inv_det
        t = v3.dot(e2, qvec) * inv_det
        ok = (
            (jnp.abs(det) > 1e-12)
            & (u >= 0.0)
            & (vv_b >= 0.0)
            & (u + vv_b <= 1.0)
            & (t > HIT_EPS)
        )
        better = ok & (t < t_best)
        t_best = jnp.where(better, t, t_best)
        normal = v3.where(better, v3.splat(nrmc), normal)
        is_obj = is_obj | better
        g = meta.geoms[gi]
        (col, spec, spec_ex, refl, refr, ior, emit, mat_id, kd, ks, ke, bump) = set_mat(
            better, g, col, spec, spec_ex, refl, refr, ior, emit, mat_id, kd, ks, ke, bump
        )

    hit = jnp.isfinite(t_best)
    return HitSoA(
        t=t_best, hit=hit, normal=normal, is_obj=is_obj, color=col,
        spec_color=spec, spec_ex=spec_ex, refl=refl, refr=refr, ior=ior,
        emit=emit, material_id=mat_id, u=uu, v=vv, kd=kd, ks=ks, ke=ke, bump=bump,
    )


def aabb_hit_soa(bmin: tuple, bmax: tuple, o: Vec3, d: Vec3) -> jnp.ndarray:
    """World axis-aligned slab test vs a literal box (intersections.h:146-175).

    Returns bool[N]: the ray (origin o, direction d) enters the box at some
    t > 0, or starts inside it. Direction need not be unit length.
    """
    def axis(bmn, bmx, oa, da):
        inv = 1.0 / jnp.where(jnp.abs(da) < 1e-20, 1e-20, da)
        t1 = (bmn - oa) * inv
        t2 = (bmx - oa) * inv
        return jnp.minimum(t1, t2), jnp.maximum(t1, t2)

    ax, bx = axis(bmin[0], bmax[0], o.x, d.x)
    ay, by = axis(bmin[1], bmax[1], o.y, d.y)
    az, bz = axis(bmin[2], bmax[2], o.z, d.z)
    tmin = jnp.maximum(jnp.maximum(ax, ay), az)
    tmax = jnp.minimum(jnp.minimum(bx, by), bz)
    return (tmax >= tmin) & (tmax > 0)


def mesh_aabb_mask(meta, o: Vec3, d: Vec3) -> jnp.ndarray:
    """Per-ray OR of the OBJ geoms' world-AABB tests — the BOUNDING_BOX
    pre-test (pathtrace.cu:348-353) in masked-lane form."""
    mask = jnp.zeros(o.x.shape, bool)
    for g in meta.geoms:
        if g.type == int(GeomType.OBJ) and g.face_count > 0:
            mask = mask | aabb_hit_soa(g.aabb_min, g.aabb_max, o, d)
    return mask


def mesh_pallas_hit(meta, fp, o: Vec3, d: Vec3, t_cap,
                    ex=None, with_uv: bool = False, with_tb: bool = False):
    """Wavefront mesh tier: the cluster-BVH Pallas kernel over [N] rays.

    Wraps ``mesh_cluster_hit`` in a standalone ``pallas_call`` gridded over
    (8,128)-ray sub-blocks. This is the compositional alternative to fusing
    the BVH into the megakernel (which trips a Mosaic compiler CHECK,
    scripts/probe_mega_strip.py): XLA runs the bounce/iteration loops, Pallas
    runs only the hot mesh test — each program stays small and compiles fast.

    ``t_cap`` (the best primitive hit so far) seeds the per-cluster pruning,
    so mesh clusters occluded by nearer primitives are never visited.
    Replaces the O(rays x faces) chunk stream (pathtrace.cu:331 "todo BVH").

    ``with_uv``/``with_tb`` enable the textured-mesh channels (``ex`` =
    dev.face_plane_ex): interpolated texcoords and the winner's TBN frame
    come back as extra [N] outputs so kd/ks/ke/bump texel fetches happen on
    winners only, outside the kernel (interactions.h:188-239).

    Returns (t [N] — inf where no mesh hit beats t_cap, face-normal Vec3
    (unnormalized), geom id f32 [N], extras tuple of [N]).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = o.x.shape[0]
    SUB, L = 8, 128
    tile = SUB * L
    n_pad = ((n + tile - 1) // tile) * tile
    rows = n_pad // L
    n_extra = (2 if with_uv else 0) + (6 if with_tb else 0)
    n_out = 5 + n_extra

    def to2d(a, fill):
        out = jnp.full((n_pad,), fill, jnp.float32)
        return out.at[:n].set(a).reshape(rows, L)

    # Padding rays sit far outside every cluster AABB with t_cap 0, so
    # all-padding sub-blocks never fire a cluster visit.
    ins = (
        to2d(o.x, 1e7), to2d(o.y, 1e7), to2d(o.z, 1e7),
        to2d(d.x, 1.0), to2d(d.y, 0.0), to2d(d.z, 0.0),
        to2d(t_cap, 0.0),
    )
    fps = (fp,) if ex is None else (fp, ex)

    def kernel(*refs):
        fp_ref = refs[0]
        ex_ref = refs[1] if ex is not None else None
        ox, oy, oz, dx, dy, dz, tc = refs[len(fps) : len(fps) + 7]
        outs = refs[len(fps) + 7 :]
        ob = Vec3(ox[:, :], oy[:, :], oz[:, :])
        db = Vec3(dx[:, :], dy[:, :], dz[:, :])
        win, t, fn, gid, extras = mesh_cluster_hit(
            meta, fp_ref, ob, db, tc[:, :],
            ex_ref=ex_ref, with_uv=with_uv, with_tb=with_tb,
        )
        for ref, val in zip(
            outs, (jnp.where(win, t, jnp.inf), fn.x, fn.y, fn.z, gid) + extras
        ):
            ref[:, :] = val

    spec = pl.BlockSpec((SUB, L), lambda i: (i, 0), memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        kernel,
        grid=(n_pad // tile,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(fps) + [spec] * 7,
        out_specs=[spec] * n_out,
        out_shape=[jax.ShapeDtypeStruct((rows, L), jnp.float32)] * n_out,
        interpret=jax.default_backend() == "cpu",
    )(*fps, *ins)
    flat = [a.reshape(-1)[:n] for a in outs]
    mt, fx, fy, fz, gf = flat[:5]
    return mt, Vec3(fx, fy, fz), gf, tuple(flat[5:])


def _mesh_sort_key(meta, o: Vec3, d: Vec3) -> jnp.ndarray:
    """Coherence key for sorted mesh queries: (origin cell | direction bin).

    The cluster tier's cost is (visited clusters per ray block) x 128 steps;
    measured diffuse-bounce blocks union to ~73% of the mesh while the
    per-ray footprint is ~0.6 clusters (scripts/sim_union.py). Grouping rays
    by a coarse origin cell (4x4x4 over the mesh AABB union) and a direction
    bin (octant + 2x3-bit anisotropy) shrinks per-block unions toward the
    per-ray footprint. 15-bit key: [cell:6][oct:3][ax:3][ay:3]."""
    lo = [min(b[0][i] for b in meta.mesh_clusters) for i in range(3)]
    hi = [max(b[1][i] for b in meta.mesh_clusters) for i in range(3)]

    def q(x, a, b, n):
        t = (x - a) / max(b - a, 1e-6)
        return jnp.clip((t * n).astype(jnp.int32), 0, n - 1)

    cell = (
        (q(o.x, lo[0], hi[0], 4) << 4)
        | (q(o.y, lo[1], hi[1], 4) << 2)
        | q(o.z, lo[2], hi[2], 4)
    )
    oct_ = (
        ((d.x > 0).astype(jnp.int32) << 2)
        | ((d.y > 0).astype(jnp.int32) << 1)
        | (d.z > 0).astype(jnp.int32)
    )
    s = jnp.abs(d.x) + jnp.abs(d.y) + jnp.abs(d.z) + 1e-12
    ax = jnp.clip((jnp.abs(d.x) / s * 8).astype(jnp.int32), 0, 7)
    ay = jnp.clip((jnp.abs(d.y) / s * 8).astype(jnp.int32), 0, 7)
    return (cell << 9) | (oct_ << 6) | (ax << 3) | ay


def _winner_ex(dev, winner_table: str):
    """Deferred winner uv/TBN gather table for the rows tier.

    Accepts only the RESOLVED values — "auto" must be resolved by the
    caller (Renderer._resolve_winner_table); raising here keeps a typo or
    an unresolved "auto" from silently selecting the 48-byte f32 rows and
    losing the measured 1.34x (docs/MESH_TIERS.md "winner_table f16")."""
    if winner_table == "f16":
        return dev.face_ex_h
    if winner_table == "oct":
        return dev.face_ex_o
    if winner_table == "f32":
        return dev.face_ex_t
    raise ValueError(
        f"winner_table must be resolved to f32/f16/oct here, got "
        f"{winner_table!r} (resolve 'auto' via Renderer before intersect_soa)"
    )


def intersect_soa(
    meta, dev, o: Vec3, d: Vec3, face_chunk: int = 128, bounding_box: bool = False,
    mesh_pallas: bool | None = None, mesh_sort: bool | str = False,
    mesh_tier: str = "lists", winner_table: str = "f32",
    active: jnp.ndarray | None = None,
) -> HitSoA:
    """Nearest hit over the whole scene with materials resolved in-loop.

    ``bounding_box`` enables the reference's optional AABB pre-test
    (pathtrace.cu:348-353): rays that miss every mesh AABB skip the face
    stream entirely (scalar lax.cond over the wavefront) and per-ray misses
    are masked out. Results are identical either way — the AABB contains all
    of its geom's faces.

    ``active`` (bool[N], optional) marks lanes whose result the caller will
    use. Inactive lanes report a guaranteed mesh MISS on every path; the
    zero-VISIT guarantee (the perf point) holds for the Pallas cluster/rows
    tiers only — the chunked Moller-Trumbore fallback and the
    ``bounding_box`` pre-test take no t cap, so there the padding ray still
    streams all faces and only its result is discarded (correctness rests
    on the post-query forced miss). Rationale (scripts/probe_liveness.py):
    terminated wavefront
    lanes keep their stale ray (shade_soa passes dead lanes through), and a
    stale ray still slab-hits clusters, so on open mesh scenes — shipOnly
    has only ~3% of lanes alive after bounce 0 — the ~97% dead lanes
    dominate every per-row visit list / block union the cluster tiers
    stream. Masked lanes take the wavefront-PADDING ray convention the
    kernels already guarantee zero visits for (far origin, +x direction,
    t_cap 0 — mesh_rows_hit pad1d fills). Primitive intersections are
    unaffected (elementwise, nothing to skip).
    """
    (t_best, normal, is_obj, col, spec, spec_ex, refl, refr, ior, emit,
     mat_id, uu, vv, kd, ks, ke, bump, set_mat) = intersect_primitives_soa(meta, o, d)

    # ---- meshes ------------------------------------------------------------
    if meta.has_obj:
        if active is not None:
            # Rebind the MESH-query ray only (primitives above already ran):
            # dead lanes become padding-convention rays so every tier's
            # slab/visit machinery drops them; their mesh result is forced
            # to miss after the query.
            far = jnp.float32(1e7)
            o = Vec3(jnp.where(active, o.x, far),
                     jnp.where(active, o.y, far),
                     jnp.where(active, o.z, far))
            d = Vec3(jnp.where(active, d.x, 1.0),
                     jnp.where(active, d.y, 0.0),
                     jnp.where(active, d.z, 0.0))
            t_query = jnp.where(active, t_best, 0.0)
        else:
            t_query = t_best
        with_bump = any(g.bump > 0 for g in meta.geoms)
        n_extras = 6 if with_bump else 0

        # Cluster-BVH Pallas tier (default on TPU) for big meshes; textured/
        # bumped meshes stream the uv/TBN channels through the kernel. The
        # chunked Moller-Trumbore stream below stays as the oracle.
        if mesh_pallas is None:
            mesh_pallas = jax.default_backend() != "cpu"
        use_pallas = (
            mesh_pallas
            and bool(meta.mesh_clusters)
            and meta.num_faces > 256
        )
        def run_mesh(_):
            return mesh_intersect_soa(
                meta, dev, o, d, face_chunk, with_bump=with_bump
            )

        if use_pallas:
            # Per-cluster AABB pruning subsumes the bounding_box pre-test.
            zeros = jnp.zeros(o.x.shape, jnp.float32)
            # "rows" (default): row-granular shifted-face kernel (16-step
            # visits per 128-ray row). "lists": (8,128)-block visit-list
            # kernel. "conds": the round-2 in-kernel slab+cond walk. All
            # three are image-equivalent (parity-tested).
            if mesh_tier in ("rows", "rows_dma"):
                pall = lambda ov, dv, tcap: mesh_rows_hit(
                    meta, dev.face_shift, ov, dv, tcap,
                    with_uv=meta.has_textures, with_tb=with_bump,
                    dma=True if mesh_tier == "rows_dma" else None,
                    ex=_winner_ex(dev, winner_table),
                )
            else:
                tier_fn = mesh_list_hit if mesh_tier == "lists" else mesh_pallas_hit
                pall = lambda ov, dv, tcap: tier_fn(
                    meta, dev.face_plane, ov, dv, tcap,
                    ex=dev.face_plane_ex if (meta.has_textures or with_bump) else None,
                    with_uv=meta.has_textures, with_tb=with_bump,
                )
            if mesh_sort:
                # Experimental reorder-before-query modes, scatter back:
                #   "need" / True — stable-partition rays by the 1-bit "can
                #     this ray reach a mesh AABB at all" key. Only ~11% of
                #     bounce rays can (scripts/sim_union.py), so needy rays
                #     concentrate into a few dense blocks and the remaining
                #     ~89% of blocks skip every cluster via the existing
                #     scalar conds.
                #   "coherence" — (origin cell | direction bin) key;
                #     measured a wash on hardware (docs/MESH_TIERS.md).
                if mesh_sort == "coherence":
                    key = _mesh_sort_key(meta, o, d)
                else:  # "need" (default for mesh_sort=True)
                    key = jnp.where(mesh_aabb_mask(meta, o, d), 0, 1)
                order = jnp.argsort(key, stable=True)
                os_ = Vec3(o.x[order], o.y[order], o.z[order])
                ds_ = Vec3(d.x[order], d.y[order], d.z[order])
                mt_s, mn_s, mg_s, ex_s = pall(os_, ds_, t_query[order])
                unscatter = lambda a: jnp.zeros_like(a).at[order].set(a)
                mt = unscatter(mt_s)
                mn = Vec3(unscatter(mn_s.x), unscatter(mn_s.y), unscatter(mn_s.z))
                mgid = unscatter(mg_s)
                ex_p = tuple(unscatter(a) for a in ex_s)
            else:
                mt, mn, mgid, ex_p = pall(o, d, t_query)
            if meta.has_textures:
                mu, mv = ex_p[0], ex_p[1]
                bex = ex_p[2:]
            else:
                mu, mv, bex = zeros, zeros, ex_p
        elif bounding_box:
            box_mask = mesh_aabb_mask(meta, o, d)

            def skip_mesh(_):
                zeros = jnp.zeros(o.x.shape, jnp.float32)
                return (
                    jnp.full(o.x.shape, jnp.inf, jnp.float32),
                    Vec3(zeros, zeros, zeros),
                    zeros,
                    zeros,
                    zeros,
                    tuple(jnp.zeros(o.x.shape, jnp.float32) for _ in range(n_extras)),
                )

            mt, mn, mu, mv, mgid, bex = lax.cond(
                jnp.any(box_mask), run_mesh, skip_mesh, None
            )
            mt = jnp.where(box_mask, mt, jnp.inf)
        else:
            mt, mn, mu, mv, mgid, bex = run_mesh(None)
        if active is not None:
            # Dead lanes entered the tiers with t_cap 0, which reads back as
            # mt == 0 (< t_best); force the mesh miss the contract promises.
            mt = jnp.where(active, mt, jnp.inf)
        better = mt < t_best
        t_best = jnp.where(better, mt, t_best)
        mesh_nrm = v3.normalize(mn)
        normal = v3.where(better, mesh_nrm, normal)
        is_obj = is_obj | better
        uu = jnp.where(better, mu, uu)
        vv = jnp.where(better, mv, vv)
        for gi, g in enumerate(meta.geoms):
            if g.type != int(GeomType.OBJ):
                continue
            sel = better & (jnp.abs(mgid - gi) < 0.5)
            (col, spec, spec_ex, refl, refr, ior, emit, mat_id, kd, ks, ke, bump) = set_mat(
                sel, g, col, spec, spec_ex, refl, refr, ior, emit, mat_id, kd, ks, ke, bump
            )

        if with_bump:
            # TBN bump perturbation (intersections.h:245-279). The winner's
            # unit tangent/bitangent are per-face constants (precomputed at
            # load from world e1/e2 + uv deltas) carried by both mesh tiers.
            tangent = Vec3(bex[0], bex[1], bex[2])
            bitangent = Vec3(bex[3], bex[4], bex[5])
            if meta.tex_pack_table:
                # one packed row gather; CSEs with shade_soa's identical call
                (_, _, _, _, _, texel, present) = fetch_texels_packed(
                    dev, meta, kd, ks, ke, bump, uu, vv)
            else:
                texel, present = fetch_texel_soa(dev, meta, bump, uu, vv)
            tsn = v3.normalize(v3.normalize(texel) * 2.0 - 1.0)
            bumped = v3.normalize(
                Vec3(
                    tsn.x * tangent.x + tsn.y * bitangent.x + tsn.z * mesh_nrm.x,
                    tsn.x * tangent.y + tsn.y * bitangent.y + tsn.z * mesh_nrm.y,
                    tsn.x * tangent.z + tsn.y * bitangent.z + tsn.z * mesh_nrm.z,
                )
            )
            normal = v3.where(better & present, bumped, normal)

    hit = jnp.isfinite(t_best)
    return HitSoA(
        t=t_best,
        hit=hit,
        normal=normal,
        is_obj=is_obj,
        color=col,
        spec_color=spec,
        spec_ex=spec_ex,
        refl=refl,
        refr=refr,
        ior=ior,
        emit=emit,
        material_id=mat_id,
        u=uu,
        v=vv,
        kd=kd,
        ks=ks,
        ke=ke,
        bump=bump,
    )


def mesh_cluster_hit(meta, fp_ref, o: Vec3, d: Vec3, t_cap,
                     ex_ref=None, with_uv: bool = False, with_tb: bool = False):
    """Megakernel BVH tier: nearest mesh face closer than ``t_cap``.

    The device face buffer is laid out in CLUSTER_SIZE(=128)-face Morton
    clusters (scene/device_scene.py build_clusters) whose world AABBs are
    program literals (meta.mesh_clusters). Per cluster, a scalar
    ``any(ray enters AABB before its current hit)`` lax.cond skips the whole
    visit; a visited cluster streams its 128 faces as (1,128) lane rows
    rolled one lane per step against the ray block — ray lane j tests face
    (j+k)%128 at step k, so 128 steps cover all (ray, face) pairs with no
    gathers and no transposes. Faces are in plane form (fn, c, U, cu, V, cv:
    t = (c - fn.o)/(fn.d), u = (x-v0).U, v = (x-v0).V), replacing the
    reference's per-ray Moller-Trumbore loop (intersections.h:207-282,
    pathtrace.cu:331 "todo BVH" — the BVH the reference never built).

    Textured meshes (interactions.h:188-239): ``with_uv`` streams the uv
    interpolation coefficients (``ex_ref`` rows 0-5) alongside and carries
    the winner's interpolated texcoord; ``with_tb`` streams the per-face
    unit tangent/bitangent (rows 8-13) for bump TBN. The texel fetches
    themselves happen OUTSIDE the kernel on the [N] winners only.

    Shape-agnostic over the ray block (the megakernel calls it on (8,128)
    sub-blocks for finer cond granularity). Returns (win, t, fn Vec3
    (unnormalized), geom f32, extras tuple — (u, v)[, tb6] as enabled):
    ``win`` marks lanes whose nearest hit is now a mesh face.
    """
    from jax.experimental.pallas import tpu as pltpu

    shape = o.x.shape
    CS = meta.cluster_size
    zeros = jnp.zeros(shape, jnp.float32)

    eps = 1e-20
    ix = 1.0 / jnp.where(jnp.abs(d.x) < eps, eps, d.x)
    iy = 1.0 / jnp.where(jnp.abs(d.y) < eps, eps, d.y)
    iz = 1.0 / jnp.where(jnp.abs(d.z) < eps, eps, d.z)

    n_extra = (2 if with_uv else 0) + (6 if with_tb else 0)
    # t, fn xyz, geom(-1), then uv / tangent / bitangent carries
    best = (t_cap, zeros, zeros, zeros, zeros - 1.0) + (zeros,) * n_extra

    def visit_cluster(c, best):
        def body(best):
            # (8,128) quantity blocks (rows: fn xyz, c, U xyz, cu | V xyz,
            # cv, geom, pad | uv0, duv1, duv2 | tangent, bitangent) — rolled
            # whole per step, so no single-sublane arrays in the loop carry.
            sl_c = slice(c * CS, (c + 1) * CS)
            blks = (fp_ref[0:8, sl_c], fp_ref[8:16, sl_c])
            if with_uv:
                blks += (ex_ref[0:8, sl_c],)
            if with_tb:
                blks += (ex_ref[8:16, sl_c],)
            return _stream_cluster_faces(blks, o, d, best, CS, with_uv, with_tb)

        bmin, bmax = meta.mesh_clusters[c]
        t1 = (bmin[0] - o.x) * ix
        t2 = (bmax[0] - o.x) * ix
        u1 = (bmin[1] - o.y) * iy
        u2 = (bmax[1] - o.y) * iy
        v1 = (bmin[2] - o.z) * iz
        v2 = (bmax[2] - o.z) * iz
        tin = jnp.maximum(
            jnp.maximum(jnp.minimum(t1, t2), jnp.minimum(u1, u2)),
            jnp.minimum(v1, v2),
        )
        tout = jnp.minimum(
            jnp.minimum(jnp.maximum(t1, t2), jnp.maximum(u1, u2)),
            jnp.maximum(v1, v2),
        )
        m = (tout >= jnp.maximum(tin, 0.0)) & (tin < best[0])
        return lax.cond(jnp.any(m), body, lambda b: b, best)

    for c in range(len(meta.mesh_clusters)):
        best = visit_cluster(c, best)

    bt, bx, by, bz, bg = best[:5]
    win = bg >= 0.0
    return win, bt, Vec3(bx, by, bz), bg, best[5:]


def _stream_cluster_faces(blks, o: Vec3, d: Vec3, best, CS: int,
                          with_uv: bool, with_tb: bool):
    """Roll-stream one cluster's faces against the ray block.

    ``blks`` are the cluster's (8,128) quantity blocks (plane form + optional
    uv/TBN extension); ``best`` is the (t, fn xyz, geom[, extras...]) carry.
    Ray lane j tests face (j+k)%CS at step k — CS steps cover all pairs with
    no gathers/transposes (the core of the BVH the reference never built,
    pathtrace.cu:331)."""
    from jax.experimental.pallas import tpu as pltpu

    zeros = jnp.zeros(o.x.shape, jnp.float32)
    eps = 1e-20
    n_extra = (2 if with_uv else 0) + (6 if with_tb else 0)

    def step(k, carry):
        bt, bx, by, bz, bg = carry[:5]
        bex = carry[5 : 5 + n_extra]
        base = 5 + n_extra  # block positions in the carry
        a, b = carry[base], carry[base + 1]
        fnx, fny, fnz = a[0:1], a[1:2], a[2:3]
        cc, ux, uy, uz, cu = a[3:4], a[4:5], a[5:6], a[6:7], a[7:8]
        vx, vy, vz, cv, gid = b[0:1], b[1:2], b[2:3], b[3:4], b[4:5]
        A = o.x * fnx + o.y * fny + o.z * fnz
        B = d.x * fnx + d.y * fny + d.z * fnz
        B = jnp.where(jnp.abs(B) < eps, eps, B)
        t = (cc - A) / B
        du = d.x * ux + d.y * uy + d.z * uz
        ou = o.x * ux + o.y * uy + o.z * uz
        u = ou + t * du - cu
        dv = d.x * vx + d.y * vy + d.z * vz
        ov = o.x * vx + o.y * vy + o.z * vz
        v = ov + t * dv - cv
        ok = (
            (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
            & (t > HIT_EPS) & (t < bt)
        )
        bt = jnp.where(ok, t, bt)
        bx = jnp.where(ok, fnx + zeros, bx)
        by = jnp.where(ok, fny + zeros, by)
        bz = jnp.where(ok, fnz + zeros, bz)
        bg = jnp.where(ok, gid + zeros, bg)
        new_ex = []
        if with_uv:
            e = carry[base + 2]
            # texcoord = uv0 + u*duv1 + v*duv2 (intersections.h:226)
            new_ex += [
                e[0:1] + u * e[2:3] + v * e[4:5],
                e[1:2] + u * e[3:4] + v * e[5:6],
            ]
        if with_tb:
            tb = carry[base + 2 + (1 if with_uv else 0)]
            new_ex += [tb[r : r + 1] + zeros for r in range(6)]
        bex = tuple(
            jnp.where(ok, ne + zeros, be) for ne, be in zip(new_ex, bex)
        )
        rolled = tuple(pltpu.roll(blk, 1, 1) for blk in carry[base:])
        return (bt, bx, by, bz, bg) + bex + rolled

    out = lax.fori_loop(0, CS, step, tuple(best) + tuple(blks))
    return out[: 5 + n_extra]


def _cluster_visit_lists(meta, o: Vec3, d: Vec3, t_cap, tile: int,
                         order_by_tin: bool = False):
    """Branchless XLA pre-pass: per ray block, the list of clusters any of
    its rays can reach closer than its current best hit.

    Measured on v5e (scripts/probe_shift_kernel.py): evaluating the slab
    test + lax.cond INSIDE the kernel costs ~3us per (cluster, block) — 88%
    of the whole mesh tier — while the vectorized mask here is a single
    fused elementwise pass. The kernel then loops over exactly the listed
    clusters (dynamic trip count, no branches).

    Returns (lists i32[B, C] — visited clusters first, then the rest;
    counts i32[B, 1]). Visited clusters come ascending by id, or — with
    ``order_by_tin`` — near-to-far by the block's min AABB-entry distance,
    so a kernel that rechecks the slab test against its RUNNING best-t can
    skip late visits that the early ones occluded (the recheck reaches the
    final-t oracle exactly under this order — scripts/sim_dynamic_prune.py,
    docs/MESH_TIERS.md). Costs one [B, C] argsort (bitonic on TPU).
    """
    C = len(meta.mesh_clusters)
    cmin = jnp.asarray([c[0] for c in meta.mesh_clusters], jnp.float32)  # [C,3]
    cmax = jnp.asarray([c[1] for c in meta.mesh_clusters], jnp.float32)
    eps = 1e-20

    def axis(i, oa, da):
        inv = 1.0 / jnp.where(jnp.abs(da) < eps, eps, da)
        t1 = (cmin[:, i][None, :] - oa[:, None]) * inv[:, None]
        t2 = (cmax[:, i][None, :] - oa[:, None]) * inv[:, None]
        return jnp.minimum(t1, t2), jnp.maximum(t1, t2)

    ax, bx = axis(0, o.x, d.x)
    ay, by = axis(1, o.y, d.y)
    az, bz = axis(2, o.z, d.z)
    tin = jnp.maximum(jnp.maximum(ax, ay), az)
    tout = jnp.minimum(jnp.minimum(bx, by), bz)
    m = (tout >= jnp.maximum(tin, 0.0)) & (tin < t_cap[:, None])  # [N, C]
    mb = m.reshape(-1, tile, C).any(axis=1)  # [B, C]
    counts = mb.sum(axis=1, dtype=jnp.int32)[:, None]  # [B, 1]
    if order_by_tin:
        # Near-to-far: key = per-block min entry distance among masked rays
        # (+inf for unvisited clusters, which argsort sends past count-1).
        tinb = jnp.where(m, tin, jnp.inf).reshape(-1, tile, C).min(axis=1)
        key = jnp.where(mb, tinb, jnp.inf)
        lists = jnp.argsort(key, axis=1).astype(jnp.int32)
        return lists, counts
    # Stable partition (visited clusters first, ascending) WITHOUT a sort:
    # cumsum ranks + one inverse-permutation scatter of the tiny [B, C]
    # table (jnp.argsort lowers to a full bitonic sort on TPU).
    B = mb.shape[0]
    mi = mb.astype(jnp.int32)
    pos_v = jnp.cumsum(mi, axis=1) - 1  # rank among visited
    pos_u = jnp.cumsum(1 - mi, axis=1) - 1  # rank among the rest
    pos = jnp.where(mb, pos_v, counts + pos_u)  # unvisited fill count..C-1
    col = jnp.broadcast_to(jnp.arange(C, dtype=jnp.int32)[None, :], (B, C))
    lists = jnp.zeros((B, C), jnp.int32).at[
        jnp.arange(B, dtype=jnp.int32)[:, None], pos
    ].set(col, unique_indices=True)
    return lists, counts


def mesh_list_hit(meta, fp, o: Vec3, d: Vec3, t_cap,
                  ex=None, with_uv: bool = False, with_tb: bool = False):
    """Visit-list mesh tier: the round-3 replacement for mesh_pallas_hit.

    Same face streaming and results as the cluster-BVH kernel, but cluster
    selection moves OUT of the kernel into a vectorized XLA pre-pass
    (_cluster_visit_lists); the kernel runs a dynamic-trip-count loop over
    each (8,128) ray block's own cluster list, dynamically slicing the face
    buffer at c*CS. Removes the ~3us-per-(cluster, block) cond machinery
    that dominated the old kernel (88% of its runtime on the 23k-face ship).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = o.x.shape[0]
    SUB, L = 8, 128
    tile = SUB * L
    n_pad = ((n + tile - 1) // tile) * tile
    rows = n_pad // L
    CS = meta.cluster_size
    C = len(meta.mesh_clusters)
    n_extra = (2 if with_uv else 0) + (6 if with_tb else 0)
    n_out = 5 + n_extra

    def pad1d(a, fill):
        return jnp.full((n_pad,), fill, jnp.float32).at[:n].set(a)

    def to2d(a):
        return a.reshape(rows, L)

    # Padding rays sit far outside every cluster AABB with t_cap 0, so
    # all-padding blocks get empty visit lists.
    flat = (
        pad1d(o.x, 1e7), pad1d(o.y, 1e7), pad1d(o.z, 1e7),
        pad1d(d.x, 1.0), pad1d(d.y, 0.0), pad1d(d.z, 0.0),
        pad1d(t_cap, 0.0),
    )
    of = Vec3(flat[0], flat[1], flat[2])
    df = Vec3(flat[3], flat[4], flat[5])
    lists, counts = _cluster_visit_lists(meta, of, df, flat[6], tile)
    # Mosaic requires SMEM block shapes with the 2nd-to-last dim divisible
    # by 8 (or equal to the array dim): pad the block axis to 8 and hand
    # each grid step the (8, C) group holding its row; the kernel indexes
    # its own row with program_id % 8. Padded rows have count 0.
    B = lists.shape[0]
    B8 = ((B + 7) // 8) * 8
    lists = jnp.zeros((B8, lists.shape[1]), jnp.int32).at[:B].set(lists)
    counts = jnp.zeros((B8, 1), jnp.int32).at[:B].set(counts)
    ins = tuple(to2d(a) for a in flat)
    fps = (fp,) if ex is None else (fp, ex)

    def kernel(lst_ref, cnt_ref, *refs):
        # lst/cnt are SMEM operands BLOCKED by the grid id (an 8-row group
        # per step) — whole-array scalar prefetch overflows the 1 MB SMEM at
        # 800^2+ wavefronts (5000 rows x 256 cl x 4 B = 5 MB), and no index
        # map depends on their values, so blocked SMEM is sufficient.
        r = pl.program_id(0) % 8
        fp_ref = refs[0]
        ex_ref = refs[1] if ex is not None else None
        ox, oy, oz, dx, dy, dz, tc = refs[len(fps) : len(fps) + 7]
        outs = refs[len(fps) + 7 :]
        ob = Vec3(ox[:, :], oy[:, :], oz[:, :])
        db = Vec3(dx[:, :], dy[:, :], dz[:, :])
        zeros = jnp.zeros(ob.x.shape, jnp.float32)
        best = (tc[:, :], zeros, zeros, zeros, zeros - 1.0) + (zeros,) * n_extra

        def body(i, best):
            c = lst_ref[r, i]
            sl_c = pl.ds(c * CS, CS)
            blks = (fp_ref[0:8, sl_c], fp_ref[8:16, sl_c])
            if with_uv:
                blks += (ex_ref[0:8, sl_c],)
            if with_tb:
                blks += (ex_ref[8:16, sl_c],)
            return _stream_cluster_faces(blks, ob, db, best, CS, with_uv, with_tb)

        best = lax.fori_loop(0, cnt_ref[r, 0], body, best)
        bt, bg = best[0], best[4]
        win = bg >= 0.0
        for ref, val in zip(
            outs, (jnp.where(win, bt, jnp.inf),) + best[1:]
        ):
            ref[:, :] = val

    spec = pl.BlockSpec((SUB, L), lambda i: (i, 0), memory_space=pltpu.VMEM)
    lst_spec = pl.BlockSpec(
        (8, lists.shape[1]), lambda i: (i // 8, 0), memory_space=pltpu.SMEM)
    cnt_spec = pl.BlockSpec((8, 1), lambda i: (i // 8, 0), memory_space=pltpu.SMEM)
    outs = pl.pallas_call(
        kernel,
        grid=(n_pad // tile,),
        in_specs=[lst_spec, cnt_spec]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * len(fps)
        + [spec] * 7,
        out_specs=[spec] * n_out,
        out_shape=[jax.ShapeDtypeStruct((rows, L), jnp.float32)] * n_out,
        interpret=jax.default_backend() == "cpu",
    )(lists, counts, *fps, *ins)
    flat_out = [a.reshape(-1)[:n] for a in outs]
    mt, fx, fy, fz, gf = flat_out[:5]
    return mt, Vec3(fx, fy, fz), gf, tuple(flat_out[5:])


def mesh_rows_hit(meta, fs, o: Vec3, d: Vec3, t_cap,
                  with_uv: bool = False, with_tb: bool = False,
                  dma: bool | None = None, ex=None):
    """Row-granular shifted-face mesh tier (mesh_tier='rows').

    Same results as mesh_list_hit, two structural changes driven by
    scripts/sim_union_blocks.py (128-ray cluster unions are ~3x smaller
    than 1024-ray ones on the 23k-face ship):

    - visit decisions are per 128-ray ROW (visit lists at tile=128);
    - the face buffer is the sublane-shifted layout (DeviceScene.face_shift):
      one (8,128) block of a quantity holds 8 lane-shifted copies of a
      cluster's faces, so sublane s, lane l tests ray l against face
      (l + 16s - k) % 128 at step k — a visit covers all (ray, face) pairs
      in CS/8 = 16 roll-steps instead of CS.

    A visit streams into a per-(shift, ray) partial best; a 3-round
    circular sublane min-reduce (rolls, no cumsum — Mosaic has no cumsum
    lowering) selects the winner and its attributes into the row's slot.

    Textured/bumped meshes DEFER the uv/TBN fetch: the kernel streams only
    the 13 intersection quantities and carries the winner's barycentrics +
    face index; uv texcoords and the TBN frame are then computed outside
    the kernel with ONE row-major [Fp, 16]-by-winner gather from ``ex``
    (dev.face_ex_t). This keeps the streamed buffer at untextured size
    (the 25-quantity variant cost ~1.9x in roll-steps AND no longer fits
    the bounce-cond's 16 MiB scoped-vmem stack as a VMEM operand).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = o.x.shape[0]
    SUB, L = 8, 128
    tile = SUB * L
    n_pad = ((n + tile - 1) // tile) * tile
    rows = n_pad // L
    CS = meta.cluster_size
    C = len(meta.mesh_clusters)
    defer = with_uv or with_tb
    n_extra = 3 if defer else 0  # u, v, face-id carried for the late fetch
    n_attr = 4 + n_extra  # fn xyz, gid (+ u, v, fid)
    Q = 13
    n_out = 5 + n_extra

    def pad1d(a, fill):
        return jnp.full((n_pad,), fill, jnp.float32).at[:n].set(a)

    flat = (
        pad1d(o.x, 1e7), pad1d(o.y, 1e7), pad1d(o.z, 1e7),
        pad1d(d.x, 1.0), pad1d(d.y, 0.0), pad1d(d.z, 0.0),
        pad1d(t_cap, 0.0),
    )
    of = Vec3(flat[0], flat[1], flat[2])
    df = Vec3(flat[3], flat[4], flat[5])
    # Big face buffers leave VMEM residence: a whole-array VMEM operand must
    # fit the 16 MiB scoped-vmem stack of the XLA cond branch that wraps the
    # bounce (pathtrace.py any_alive cond) — the textured 25-quantity ship
    # buffer alone is ~18 MiB, and VMEM residence caps mesh size outright.
    # Above the threshold the buffer stays in HBM (memory_space=ANY) and
    # each visit DMAs its cluster's (Q*8, CS) panel into a VMEM scratch
    # (~100 KB textured): re-read traffic is visits x panel ~ a few GB/s,
    # well under HBM bandwidth, and the mesh-size ceiling becomes HBM.
    # Hardware-verified 2026-08-17 (scripts/probe_rows_dma.py): bit-exact
    # vs the lists tier, 0.52/0.70 Msam/s on the textured ship at 256/800^2.
    # Auto default ON above the scoped-vmem threshold: the VMEM-resident
    # textured kernel no longer compiles at ANY resolution on the current
    # toolchain (scripts/probe_compile_matrix.py — 18.00M operand staging vs
    # the bounce-cond's 16.00M stack). Callers pin it via
    # mesh_tier="rows_dma" (jit-cache safe); the env var is a debug override
    # read at trace time only.
    if dma is None:
        env_dma = os.environ.get("MYGPURT_ROWS_DMA")
        dma = (env_dma == "1" if env_dma is not None
               else fs.size * 4 >= 14 * 2**20)
    # Dynamic near-to-far recheck (measured +13%/+26% on shipOnly 256^2/
    # 800^2): always on — the DMA path keeps the kernel's VMEM footprint
    # small enough for the lax.cond that implements the skip.
    recheck = dma or fs.size * 4 < 14 * 2**20 or bool(
        os.environ.get("MYGPURT_FORCE_RECHECK"))
    lists, counts = _cluster_visit_lists(meta, of, df, flat[6], L,
                                         order_by_tin=recheck)
    # Cluster AABBs as an SMEM operand (6 x C f32, ~4 KB) for the in-kernel
    # dynamic recheck; rows: cmin xyz then cmax xyz.
    cb = jnp.asarray(
        [[c[0][i] for c in meta.mesh_clusters] for i in range(3)]
        + [[c[1][i] for c in meta.mesh_clusters] for i in range(3)],
        jnp.float32,
    )
    ins = tuple(a.reshape(rows, L) for a in flat)

    def kernel(lst_ref, cnt_ref, cb_ref, fs_ref, *refs):
        # lst/cnt are SMEM operands BLOCKED by the grid id (this tile's 8
        # per-row lists per step); whole-array scalar prefetch overflows the
        # 1 MB SMEM at 800^2 wavefronts (5000 rows x 256 cl x 4 B = 5 MB).
        ox, oy, oz, dx, dy, dz, tc = refs[:7]
        if dma:
            outs = refs[7:-2]
            fs_vmem, fs_sem = refs[-2], refs[-1]
        else:
            outs = refs[7:]
        zeros = jnp.zeros((SUB, L), jnp.float32)
        rowi = lax.broadcasted_iota(jnp.int32, (SUB, L), 0)
        eps = 1e-20
        best = [tc[:, :], zeros, zeros, zeros, zeros - 1.0] + [zeros] * n_extra
        if defer:
            # Within-cluster face index at roll-step 0: sublane s, lane l
            # holds face (l + SHIFT*s) % CS (DeviceScene.face_shift layout);
            # step k subtracts k with one wrap (right-rolls).
            lane = lax.broadcasted_iota(jnp.int32, (SUB, L), 1)
            bsum = lane + (CS // SUB) * rowi
            bmod = jnp.where(bsum >= CS, bsum - CS, bsum).astype(jnp.float32)

        Cl = lists.shape[1]

        def _panel_copy(c, slot):
            # One cluster panel HBM -> VMEM slot (double-buffered; the slot
            # index is traced — Mosaic allows dynamic leading-dim refs).
            return pltpu.make_async_copy(
                fs_ref.at[:, pl.ds(c * CS, CS)],
                fs_vmem.at[slot],
                fs_sem.at[slot],
            )

        for r in range(SUB):
            orx, ory, orz = ox[r : r + 1, :], oy[r : r + 1, :], oz[r : r + 1, :]
            drx, dry, drz = dx[r : r + 1, :], dy[r : r + 1, :], dz[r : r + 1, :]
            inx = 1.0 / jnp.where(jnp.abs(drx) < eps, eps, drx)
            iny = 1.0 / jnp.where(jnp.abs(dry) < eps, eps, dry)
            inz = 1.0 / jnp.where(jnp.abs(drz) < eps, eps, drz)

            def visit(i, best, r=r, orx=orx, ory=ory, orz=orz,
                      drx=drx, dry=dry, drz=drz, inx=inx, iny=iny, inz=inz):
                c = lst_ref[r, i]
                slot = None
                if dma:
                    # Pipeline: this visit's panel was issued by the row
                    # prologue / the previous visit — wait for it, then
                    # immediately issue the NEXT visit's panel into the
                    # other slot so the copy rides under this visit's
                    # 16 roll-steps (the synchronous start+wait stall
                    # measured ~2x on the textured ship).
                    slot = lax.rem(i, 2)
                    _panel_copy(c, slot).wait()
                    nxt = lst_ref[r, jnp.minimum(i + 1, Cl - 1)]

                    @pl.when(i + 1 < cnt_ref[r, 0])
                    def _():
                        _panel_copy(nxt, lax.rem(i + 1, 2)).start()

                if not recheck:
                    return _visit_stream(c, best, slot=slot)
                # Dynamic near-to-far prune: the list holds clusters ordered
                # by entry distance against the INITIAL t-cap; earlier
                # (nearer) visits shrink the row's best-t, so recheck the
                # slab test against the RUNNING best and skip dead visits
                # (reaches the final-t oracle — docs/MESH_TIERS.md).
                t1 = (cb_ref[0, c] - orx) * inx
                t2 = (cb_ref[3, c] - orx) * inx
                tin = jnp.minimum(t1, t2)
                tout = jnp.maximum(t1, t2)
                t1 = (cb_ref[1, c] - ory) * iny
                t2 = (cb_ref[4, c] - ory) * iny
                tin = jnp.maximum(tin, jnp.minimum(t1, t2))
                tout = jnp.minimum(tout, jnp.maximum(t1, t2))
                t1 = (cb_ref[2, c] - orz) * inz
                t2 = (cb_ref[5, c] - orz) * inz
                tin = jnp.maximum(tin, jnp.minimum(t1, t2))
                tout = jnp.minimum(tout, jnp.maximum(t1, t2))
                row_best = best[0][r : r + 1, :]
                alive = (tout >= jnp.maximum(tin, 0.0)) & (tin < row_best)
                return lax.cond(
                    jnp.any(alive),
                    lambda b: _visit_stream(c, b, slot=slot),
                    lambda b: b,
                    tuple(best),
                )

            def _visit_stream(c, best, slot=None, r=r, orx=orx, ory=ory,
                              orz=orz, drx=drx, dry=dry, drz=drz):
                best = list(best)
                sl_c = pl.ds(c * CS, CS)
                if dma:
                    # Panel already resident (waited in visit()).
                    blks = tuple(
                        fs_vmem[slot, q * 8 : (q + 1) * 8, :] for q in range(Q)
                    )
                else:
                    blks = tuple(
                        fs_ref[q * 8 : (q + 1) * 8, sl_c] for q in range(Q)
                    )
                pt = best[0][r : r + 1, :] + zeros  # row best, all sublanes
                partial = (pt,) + (zeros,) * n_attr

                def step(k, carry):
                    pt = carry[0]
                    pattr = carry[1 : 1 + n_attr]
                    B = carry[1 + n_attr :]
                    fnx, fny, fnz, cc = B[0], B[1], B[2], B[3]
                    ux, uy, uz, cu = B[4], B[5], B[6], B[7]
                    vx, vy, vz, cv, gid = B[8], B[9], B[10], B[11], B[12]
                    A = orx * fnx + ory * fny + orz * fnz
                    Bd = drx * fnx + dry * fny + drz * fnz
                    Bd = jnp.where(jnp.abs(Bd) < eps, eps, Bd)
                    t = (cc - A) / Bd
                    du = drx * ux + dry * uy + drz * uz
                    ou = orx * ux + ory * uy + orz * uz
                    u = ou + t * du - cu
                    dv = drx * vx + dry * vy + drz * vz
                    ov = orx * vx + ory * vy + orz * vz
                    v = ov + t * dv - cv
                    ok = (
                        (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
                        & (t > HIT_EPS) & (t < pt)
                    )
                    new_vals = [fnx, fny, fnz, gid]
                    if defer:
                        # pltpu.roll(x, 1, 1) shifts lanes RIGHT (jnp.roll
                        # semantics): after k rolls lane l holds face
                        # (l + SHIFT*s - k) % CS of the cluster.
                        idxk = bmod - k.astype(jnp.float32)
                        wrapped = jnp.where(idxk < 0.0, idxk + jnp.float32(CS), idxk)
                        fid = (c * CS).astype(jnp.float32) + wrapped
                        new_vals += [u, v, fid]
                    pt = jnp.where(ok, t, pt)
                    pattr = tuple(
                        jnp.where(ok, nv, pa) for nv, pa in zip(new_vals, pattr)
                    )
                    # Timing-only decomposition escape (WRONG image): roll
                    # just 4 of the Q face blocks to price the 13 per-step
                    # lane-rolls against the pair math. Never set outside
                    # scripts/probe_rows_rolls.py.
                    if os.environ.get("MYGPURT_ROWS_TIMING_ROLL4"):
                        rolled = tuple(
                            pltpu.roll(bb, 1, 1) for bb in B[:4]) + tuple(B[4:])
                    else:
                        rolled = tuple(pltpu.roll(bb, 1, 1) for bb in B)
                    return (pt,) + pattr + rolled

                out = lax.fori_loop(0, CS // 8, step, partial + blks)
                pt = out[0]
                pattr = list(out[1 : 1 + n_attr])
                # circular min-reduce over the 8 shift-sublanes
                for k in (4, 2, 1):
                    ot = pltpu.roll(pt, k, 0)
                    take = ot < pt
                    pattr = [
                        jnp.where(take, pltpu.roll(a, k, 0), a) for a in pattr
                    ]
                    pt = jnp.where(take, ot, pt)
                upd = (rowi == r) & (pt < best[0])
                best[0] = jnp.where(upd, pt, best[0])
                for j in range(n_attr):
                    best[1 + j] = jnp.where(upd, pattr[j], best[1 + j])
                return tuple(best)

            if dma:
                # Row prologue: issue visit 0's panel into slot 0.
                @pl.when(cnt_ref[r, 0] > 0)
                def _(r=r):
                    _panel_copy(lst_ref[r, 0], 0).start()

            best = lax.fori_loop(0, cnt_ref[r, 0], visit, tuple(best))

        bt, bg = best[0], best[4]
        win = bg >= 0.0
        for ref, val in zip(outs, (jnp.where(win, bt, jnp.inf),) + tuple(best[1:])):
            ref[:, :] = val

    spec = pl.BlockSpec((SUB, L), lambda i: (i, 0), memory_space=pltpu.VMEM)
    lst_spec = pl.BlockSpec(
        (SUB, lists.shape[1]), lambda i: (i, 0), memory_space=pltpu.SMEM)
    cnt_spec = pl.BlockSpec((SUB, 1), lambda i: (i, 0), memory_space=pltpu.SMEM)
    cb_spec = pl.BlockSpec(memory_space=pltpu.SMEM)  # whole array, ~4 KB
    fs_spec = pl.BlockSpec(
        memory_space=pl.ANY if dma else pltpu.VMEM)
    outs = pl.pallas_call(
        kernel,
        grid=(n_pad // tile,),
        in_specs=[lst_spec, cnt_spec, cb_spec, fs_spec] + [spec] * 7,
        out_specs=[spec] * n_out,
        out_shape=[jax.ShapeDtypeStruct((rows, L), jnp.float32)] * n_out,
        scratch_shapes=(
            [pltpu.VMEM((2, Q * 8, CS), jnp.float32),
             pltpu.SemaphoreType.DMA((2,))]
            if dma else []
        ),
        interpret=jax.default_backend() == "cpu",
    )(lists, counts, cb, fs, *ins)
    flat_out = [a.reshape(-1)[:n] for a in outs]
    mt, fx, fy, fz, gf = flat_out[:5]
    if not defer:
        return mt, Vec3(fx, fy, fz), gf, ()
    # Deferred uv/TBN fetch: one row-major [Fp, 12] gather on the winners'
    # face ids (non-winners carry fid 0 — garbage values, masked by the
    # caller's `better` merge). Columns 0-5 are (uv0, duv1, duv2);
    # columns 6-11 the unit tangent/bitangent (the streamed layout's pad
    # columns are dropped from the gather table: row gathers measured ~2x
    # faster than column gathers and scale with row bytes — and this runs
    # every bounce).
    u_b, v_b, fidf = flat_out[5:8]
    fid = jnp.clip(fidf.astype(jnp.int32), 0, ex.shape[0] - 1)
    gathered = jnp.take(ex, fid, axis=0)

    def _unpack_f16_pairs(words):
        # word j -> columns (2j, 2j+1), low half = even column
        lo = lax.bitcast_convert_type(
            (words & jnp.uint32(0xFFFF)).astype(jnp.uint16), jnp.float16
        ).astype(jnp.float32)
        hi = lax.bitcast_convert_type(
            (words >> jnp.uint32(16)).astype(jnp.uint16), jnp.float16
        ).astype(jnp.float32)
        return jnp.stack([lo, hi], axis=-1).reshape(words.shape[0], -1)

    # Table flavors (scene/device_scene.py): f32 [Fp,12]; "f16" u32[Fp,6]
    # of half pairs (24-byte rows); "oct" u32[Fp,4] (16-byte rows: 3 f16
    # uv words + one word of 8-bit octahedral tangent/bitangent).
    oct_mode = ex.dtype == jnp.uint32 and ex.shape[1] == 4
    if oct_mode:
        cols = _unpack_f16_pairs(gathered[:, :3])  # (N, 6) uv coefficients
    elif ex.dtype == jnp.uint32:
        cols = _unpack_f16_pairs(gathered)  # (N, 12)
    else:
        cols = gathered  # (N, 12) f32
    extras = []
    if with_uv:
        extras += [
            cols[:, 0] + u_b * cols[:, 2] + v_b * cols[:, 4],
            cols[:, 1] + u_b * cols[:, 3] + v_b * cols[:, 5],
        ]
    if with_tb:
        if oct_mode:
            w3 = gathered[:, 3]

            def _oct8_decode(qx, qy):
                x = qx.astype(jnp.float32) * (2.0 / 255.0) - 1.0
                y = qy.astype(jnp.float32) * (2.0 / 255.0) - 1.0
                z = 1.0 - jnp.abs(x) - jnp.abs(y)
                t = jnp.maximum(-z, 0.0)
                x = x + jnp.where(x >= 0.0, -t, t)
                y = y + jnp.where(y >= 0.0, -t, t)
                inv = lax.rsqrt(x * x + y * y + z * z)
                return x * inv, y * inv, z * inv

            q = [(w3 >> jnp.uint32(8 * k)) & jnp.uint32(0xFF)
                 for k in range(4)]
            extras += [*_oct8_decode(q[0], q[1]), *_oct8_decode(q[2], q[3])]
        else:
            extras += [cols[:, 6 + j] for j in range(6)]
    return mt, Vec3(fx, fy, fz), gf, tuple(extras)


def bvh_scene_hit(meta, fp_ref, o: Vec3, d: Vec3) -> HitSoA:
    """primitives_hit + the cluster BVH mesh tier, materials resolved.

    The megakernel entry for large-mesh scenes (> MEGA_FACE_CAP faces, no
    textures). Semantics match intersect_soa's mesh merge minus texcoords.
    """
    (t_best, normal, is_obj, col, spec, spec_ex, refl, refr, ior, emit,
     mat_id, uu, vv, kd, ks, ke, bump, set_mat) = intersect_primitives_soa(meta, o, d)

    win, mt, fn, gf, _ = mesh_cluster_hit(meta, fp_ref, o, d, t_best)
    t_best = jnp.where(win, mt, t_best)
    normal = v3.where(win, v3.normalize(fn), normal)
    is_obj = is_obj | win
    for gi, g in enumerate(meta.geoms):
        if g.type != int(GeomType.OBJ):
            continue
        sel = win & (jnp.abs(gf - gi) < 0.5)
        (col, spec, spec_ex, refl, refr, ior, emit, mat_id, kd, ks, ke, bump) = set_mat(
            sel, g, col, spec, spec_ex, refl, refr, ior, emit, mat_id, kd, ks, ke, bump
        )

    hit = jnp.isfinite(t_best)
    return HitSoA(
        t=t_best, hit=hit, normal=normal, is_obj=is_obj, color=col,
        spec_color=spec, spec_ex=spec_ex, refl=refl, refr=refr, ior=ior,
        emit=emit, material_id=mat_id, u=uu, v=vv, kd=kd, ks=ks, ke=ke, bump=bump,
    )


def fetch_texel_soa(dev, meta, tex_id, u, v):
    """Nearest texel fetch (textured OBJ scenes only).

    Slot metadata resolves through a literal select chain over the static
    atlas table (meta.tex_table) instead of a per-lane [N,4] gather: the
    table has a handful of slots, and at 800^2 x 8 bounces x 4 maps the
    meta gathers alone cost hundreds of ms on TPU. Only the texel row
    gather ([N] rows of the 4-channel atlas) remains.
    """
    zi = jnp.zeros_like(tex_id, jnp.int32)
    off, w, h, ch = zi, zi, zi, zi
    for t, (o_, w_, h_, c_) in enumerate(meta.tex_table):
        if t == 0 or c_ == 0:
            continue  # slot 0 / absent maps keep the zero defaults
        sel = jnp.abs(tex_id - t) < 0.5
        off = jnp.where(sel, o_, off)
        w = jnp.where(sel, w_, w)
        h = jnp.where(sel, h_, h)
        ch = jnp.where(sel, c_, ch)
    cu = jnp.clip((u * w).astype(jnp.int32), 0, jnp.maximum(w - 1, 0))
    cv = jnp.clip((v * h).astype(jnp.int32), 0, jnp.maximum(h - 1, 0))
    pix = off + cv * w + cu
    # Byte-packed gather: one uint32 word per texel instead of a 16-byte f32
    # row (gather cost scales with row bytes; textures are uint8 by contract
    # so u8/255 reconstructs dev.tex_atlas's values exactly).
    word = dev.tex_atlas_w[pix]
    present = ch > 0

    def chan(j):
        b = (word >> jnp.uint32(8 * j)) & jnp.uint32(0xFF)
        val = b.astype(jnp.float32) / jnp.float32(255.0)
        return jnp.where(present, val, 0.0)

    return Vec3(chan(0), chan(1), chan(2)), present


def fetch_texels_packed(dev, meta, kd_id, ks_id, ke_id, bump_id, u, v):
    """All four per-material texels in ONE [N]-row gather (packed atlas).

    Per-index gather cost dominates the textured mesh tier on TPU (~10 ms
    per 640k-lane take; docs/MESH_TIERS.md "per-bounce gathers"), so the
    four per-bounce map fetches (kd/ks/ke in shade_soa + bump in
    intersect_soa) collapse into one 16-channel row gather from
    dev.tex_atlas16 whenever the scene is packable (every textured geom's
    present maps share one resolution — scene/device_scene.py). Identical
    call sites CSE in XLA, so intersect and shade together still issue a
    single gather per bounce.

    Returns (kd Vec3, kd_present, ks Vec3, ks_present, ke Vec3,
    bump Vec3, bump_present); absent maps are zero/False, mirroring
    fetch_texel_soa's null-slot semantics (interactions.h:188-239).
    """
    assert meta.tex_pack_table, "scene has no packed atlas"
    zi = jnp.zeros_like(kd_id, jnp.int32)
    off, w, h = zi, zi, zi
    kd_p = ks_p = ke_p = bp_p = jnp.zeros(kd_id.shape, bool)
    for (kd_t, ks_t, ke_t, bp_t, o_, w_, h_) in meta.tex_pack_table:
        sel = (
            (jnp.abs(kd_id - kd_t) < 0.5) & (jnp.abs(ks_id - ks_t) < 0.5)
            & (jnp.abs(ke_id - ke_t) < 0.5) & (jnp.abs(bump_id - bp_t) < 0.5)
        )
        off = jnp.where(sel, o_, off)
        w = jnp.where(sel, w_, w)
        h = jnp.where(sel, h_, h)
        kd_p = kd_p | (sel & (kd_t > 0))
        ks_p = ks_p | (sel & (ks_t > 0))
        ke_p = ke_p | (sel & (ke_t > 0))
        bp_p = bp_p | (sel & (bp_t > 0))
    cu = jnp.clip((u * w).astype(jnp.int32), 0, jnp.maximum(w - 1, 0))
    cv = jnp.clip((v * h).astype(jnp.int32), 0, jnp.maximum(h - 1, 0))
    # Byte-packed gather: 16-byte uint32 rows instead of 64-byte f32 rows
    # (the 12 used channels live in words 0-2; u8/255 reconstructs
    # dev.tex_atlas16's values exactly — textures are uint8 by contract).
    words = dev.tex_atlas16_w[off + cv * w + cu]  # (N, 4) uint32

    def chan(j):
        b = (words[:, j // 4] >> jnp.uint32(8 * (j % 4))) & jnp.uint32(0xFF)
        return b.astype(jnp.float32) / jnp.float32(255.0)

    def vec(base, p):
        return Vec3(*(jnp.where(p, chan(base + j), 0.0) for j in range(3)))

    return (vec(0, kd_p), kd_p, vec(3, ks_p), ks_p, vec(6, ke_p),
            vec(9, bp_p), bp_p)


def mesh_nearfar_hit(meta, fs_ref, o: Vec3, d: Vec3, t_cap, active):
    """In-kernel near-to-far cluster walk for the bounce megakernel.

    The rows tier's visit discipline (near-to-far per 128-ray row + running
    best-t recheck, docs/MESH_TIERS.md) without its XLA visit-list prepass —
    bounce-N rays exist only inside the kernel, so the ordering is computed
    in-kernel:

    1. one vectorized slab pass over all clusters (AABBs baked as program
       literals) builds a per-(row, cluster) masked entry-distance matrix
       ``tin_min`` (rows x 128-padded-cluster lanes — two vregs);
    2. per row, a while-loop walk extracts the nearest unvisited cluster
       (min + lane-index min over the (1, CP) key vector), streams its
       faces with the 16-step sublane-shifted layout (DeviceScene.
       face_shift — the rows kernel's stream), and terminates when the
       nearest remaining entry distance can no longer beat the row's
       worst alive best-t.

    Rows whose rays all miss every cluster AABB (93.5%% of shipOnly primary
    rays) terminate before the first visit. ``active`` masks dead lanes
    (remaining == 0) out of the candidate pass, so fully dead rows cost one
    vector compare. Visits measured 2.9-4.2 per live row on shipOnly
    (scripts/sim_inkernel_walk.py), vs the Morton cond-walk's whole-union.

    fs_ref: the [104, Fp] sublane-shifted face buffer (13 quantities x 8
    shifted sublane copies). Returns (win, t, fn Vec3, geom f32) like
    mesh_cluster_hit's untextured form.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    R, L = o.x.shape
    CS = meta.cluster_size
    C = len(meta.mesh_clusters)
    CP = ((C + 127) // 128) * 128
    Q = 13
    eps = 1e-20
    zeros = jnp.zeros((R, L), jnp.float32)
    rowi = lax.broadcasted_iota(jnp.int32, (R, L), 0)
    lanec = lax.broadcasted_iota(jnp.int32, (1, CP), 1)

    ix = 1.0 / jnp.where(jnp.abs(d.x) < eps, eps, d.x)
    iy = 1.0 / jnp.where(jnp.abs(d.y) < eps, eps, d.y)
    iz = 1.0 / jnp.where(jnp.abs(d.z) < eps, eps, d.z)

    # --- prepass: per-row nearest masked entry distance per cluster --------
    INF = jnp.float32(3e38)
    tin_min = jnp.full((R, CP), INF, jnp.float32)
    for c in range(C):
        bmin, bmax = meta.mesh_clusters[c]
        t1 = (bmin[0] - o.x) * ix
        t2 = (bmax[0] - o.x) * ix
        tin = jnp.minimum(t1, t2)
        tout = jnp.maximum(t1, t2)
        t1 = (bmin[1] - o.y) * iy
        t2 = (bmax[1] - o.y) * iy
        tin = jnp.maximum(tin, jnp.minimum(t1, t2))
        tout = jnp.minimum(tout, jnp.maximum(t1, t2))
        t1 = (bmin[2] - o.z) * iz
        t2 = (bmax[2] - o.z) * iz
        tin = jnp.maximum(tin, jnp.minimum(t1, t2))
        tout = jnp.minimum(tout, jnp.maximum(t1, t2))
        m = (tout >= jnp.maximum(tin, 0.0)) & (tin < t_cap) & active
        row_min = jnp.min(jnp.where(m, tin, INF), axis=1, keepdims=True)
        tin_min = jnp.where(lanec == c, row_min, tin_min)

    best = [t_cap, zeros, zeros, zeros, zeros - 1.0]

    for r in range(R):
        orx, ory, orz = o.x[r : r + 1, :], o.y[r : r + 1, :], o.z[r : r + 1, :]
        drx, dry, drz = d.x[r : r + 1, :], d.y[r : r + 1, :], d.z[r : r + 1, :]
        act_r = active[r : r + 1, :]

        def row_best_max(bt, act_r=act_r):
            # worst alive best-t in the row: the scalar recheck bound
            return jnp.max(jnp.where(act_r, bt, -INF))

        def cond(carry):
            # Two bounds: the alive-ray best-t recheck AND key exhaustion.
            # The exhaustion check is load-bearing: rays that miss every
            # primitive have bt == +inf, so a row that never finds a face
            # keeps bound == +inf and min(key) == INF < inf would spin the
            # walk forever (60 s device-program kill on hardware).
            m = jnp.min(carry[0])
            return (m < carry[6]) & (m < INF)

        def body(carry, orx=orx, ory=ory, orz=orz,
                 drx=drx, dry=dry, drz=drz, act_r=act_r):
            key, bt, bx, by, bz, bg, _bound = carry
            m = jnp.min(key)
            c = jnp.min(jnp.where(key == m, lanec, CP + 7))
            key = jnp.where(lanec == c, INF, key)

            # 16-step sublane-shifted stream of cluster c (rows-kernel math)
            sl_c = pl.ds(c * CS, CS)
            blks = tuple(fs_ref[q * 8 : (q + 1) * 8, sl_c] for q in range(Q))
            pt = bt + jnp.zeros((8, L), jnp.float32)  # row best, 8 sublanes
            pattr = (jnp.zeros((8, L), jnp.float32),) * 4

            def step(k, carry2):
                pt = carry2[0]
                pattr = carry2[1:5]
                B = carry2[5:]
                fnx, fny, fnz, cc = B[0], B[1], B[2], B[3]
                ux, uy, uz, cu = B[4], B[5], B[6], B[7]
                vx, vy, vz, cv, gid = B[8], B[9], B[10], B[11], B[12]
                A = orx * fnx + ory * fny + orz * fnz
                Bd = drx * fnx + dry * fny + drz * fnz
                Bd = jnp.where(jnp.abs(Bd) < eps, eps, Bd)
                t = (cc - A) / Bd
                du = drx * ux + dry * uy + drz * uz
                ou = orx * ux + ory * uy + orz * uz
                u = ou + t * du - cu
                dv = drx * vx + dry * vy + drz * vz
                ov = orx * vx + ory * vy + orz * vz
                v = ov + t * dv - cv
                ok = (
                    (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
                    & (t > HIT_EPS) & (t < pt)
                )
                new_vals = (fnx, fny, fnz, gid)
                pt = jnp.where(ok, t, pt)
                pattr = tuple(
                    jnp.where(ok, nv, pa) for nv, pa in zip(new_vals, pattr)
                )
                rolled = tuple(pltpu.roll(bb, 1, 1) for bb in B)
                return (pt,) + pattr + rolled

            out = lax.fori_loop(0, CS // 8, step, (pt,) + pattr + blks)
            pt = out[0]
            pattr = list(out[1:5])
            for k in (4, 2, 1):  # circular min-reduce over shift-sublanes
                ot = pltpu.roll(pt, k, 0)
                take = ot < pt
                pattr = [
                    jnp.where(take, pltpu.roll(a, k, 0), a) for a in pattr
                ]
                pt = jnp.where(take, ot, pt)
            pt0 = pt[0:1, :]
            upd = pt0 < bt
            bt = jnp.where(upd, pt0, bt)
            bx = jnp.where(upd, pattr[0][0:1, :], bx)
            by = jnp.where(upd, pattr[1][0:1, :], by)
            bz = jnp.where(upd, pattr[2][0:1, :], bz)
            bg = jnp.where(upd, pattr[3][0:1, :], bg)
            return (key, bt, bx, by, bz, bg, row_best_max(bt))

        init = (
            tin_min[r : r + 1, :],
            best[0][r : r + 1, :],
            zeros[0:1, :], zeros[0:1, :], zeros[0:1, :],
            zeros[0:1, :] - 1.0,
            row_best_max(best[0][r : r + 1, :]),
        )
        outr = lax.while_loop(cond, body, init)
        row = rowi == r
        improved = row & (outr[1] + zeros < best[0])
        best[0] = jnp.where(improved, outr[1] + zeros, best[0])
        best[1] = jnp.where(improved, outr[2] + zeros, best[1])
        best[2] = jnp.where(improved, outr[3] + zeros, best[2])
        best[3] = jnp.where(improved, outr[4] + zeros, best[3])
        best[4] = jnp.where(improved, outr[5] + zeros, best[4])

    bt, bx, by, bz, bg = best
    win = bg >= 0.0
    return win, bt, Vec3(bx, by, bz), bg


def bvh_scene_hit_nearfar(meta, fs_ref, o: Vec3, d: Vec3, active) -> HitSoA:
    """bvh_scene_hit with the near-to-far walk tier (bounce megakernel).

    ``active`` masks dead lanes (remaining == 0) out of the mesh walk so
    fully terminated rows cost nothing; their HitSoA rows are misses.
    """
    (t_best, normal, is_obj, col, spec, spec_ex, refl, refr, ior, emit,
     mat_id, uu, vv, kd, ks, ke, bump, set_mat) = intersect_primitives_soa(meta, o, d)

    win, mt, fn, gf = mesh_nearfar_hit(meta, fs_ref, o, d, t_best, active)
    t_best = jnp.where(win, mt, t_best)
    normal = v3.where(win, v3.normalize(fn), normal)
    is_obj = is_obj | win
    for gi, g in enumerate(meta.geoms):
        if g.type != int(GeomType.OBJ):
            continue
        sel = win & (jnp.abs(gf - gi) < 0.5)
        (col, spec, spec_ex, refl, refr, ior, emit, mat_id, kd, ks, ke, bump) = set_mat(
            sel, g, col, spec, spec_ex, refl, refr, ior, emit, mat_id, kd, ks, ke, bump
        )

    hit = jnp.isfinite(t_best) & active
    t_best = jnp.where(active, t_best, jnp.inf)
    return HitSoA(
        t=t_best, hit=hit, normal=normal, is_obj=is_obj, color=col,
        spec_color=spec, spec_ex=spec_ex, refl=refl, refr=refr, ior=ior,
        emit=emit, material_id=mat_id, u=uu, v=vv, kd=kd, ks=ks, ke=ke, bump=bump,
    )
