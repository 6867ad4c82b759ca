"""Vectorized ray-scene intersection.

TPU-native equivalents of apps/src/intersections.h: every test runs over a
whole [N]-lane ray wavefront at once; per-geom dispatch is branchless selects
over a small static geom count, and mesh triangles stream through a
``lax.scan`` over fixed-size chunks so the [rays, faces] working set stays
bounded regardless of mesh size.

Semantics notes (vs the reference):
- box/sphere: local-space tests with the ray direction re-normalized after the
  inverse transform, hit point pulled back by 1e-4 along the local ray
  (getPointOnRay, intersections.h:27-29), t = world-space distance from the
  ray origin — all as in intersections.h:48-144.
- mesh: Moller-Trumbore in WORLD space over pre-transformed triangles. The
  reference tests in local space and returns the local-space distance
  (intersections.h:207-230), which mis-ranks mesh hits against other geoms
  whenever the geom scale isn't 1; we return true world distance (documented
  deviation). Two-sided test (glm's intersectRayTriangle backface-culls;
  watertight meshes make this invisible from outside).
- texture fetch: nearest-neighbor byte texel exactly like interactions.h
  (coord = int(u*w)), but indices are clamped in range — the reference reads
  out of bounds for u == 1.0.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from ..scene.structs import GeomType

HIT_EPS = 1e-4  # getPointOnRay pull-back (intersections.h:28)


class Intersection(NamedTuple):
    """SoA ShadeableIntersection (sceneStructs.h:115-121)."""

    t: jnp.ndarray  # f32[N], -1 for miss
    normal: jnp.ndarray  # f32[N,3]
    uv: jnp.ndarray  # f32[N,2]
    geom_id: jnp.ndarray  # i32[N], -1 for miss
    material_id: jnp.ndarray  # i32[N]
    outside: jnp.ndarray  # bool[N]


def _xform_point(m: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    """(m @ [p, 1])[:3] for m [4,4], p [...,3]."""
    return p @ m[:3, :3].T + m[:3, 3]


def _xform_dir(m: jnp.ndarray, d: jnp.ndarray) -> jnp.ndarray:
    """(m @ [d, 0])[:3]."""
    return d @ m[:3, :3].T


def _normalize(v: jnp.ndarray) -> jnp.ndarray:
    return v / jnp.linalg.norm(v, axis=-1, keepdims=True)


def box_intersect(transform, inverse_transform, inv_transpose, origins, directions):
    """Unit cube [-0.5, 0.5]^3 slab test (intersections.h:48-90).

    Returns (t, normal, outside): t = -1 on miss, else world distance.
    """
    qo = _xform_point(inverse_transform, origins)  # [N,3]
    qd = _normalize(_xform_dir(inverse_transform, directions))

    # Unguarded division, as in the reference (IEEE inf semantics).
    t1 = (-0.5 - qo) / qd  # [N,3]
    t2 = (0.5 - qo) / qd
    ta = jnp.minimum(t1, t2)
    tb = jnp.maximum(t1, t2)
    n_sign = jnp.where(t2 < t1, 1.0, -1.0)  # local axis normal sign

    # tmin = max over axes of ta where ta > 0 (reference keeps -1e38 otherwise)
    ta_masked = jnp.where(ta > 0, ta, -1e38)
    tmin = jnp.max(ta_masked, axis=-1)
    axis_min = jnp.argmax(ta_masked, axis=-1)
    tmax = jnp.min(tb, axis=-1)
    axis_max = jnp.argmin(tb, axis=-1)

    hit = (tmax >= tmin) & (tmax > 0)
    inside = tmin <= 0
    t_local = jnp.where(inside, tmax, tmin)
    axis = jnp.where(inside, axis_max, axis_min)
    outside = hit & ~inside

    eye = jnp.eye(3, dtype=origins.dtype)
    local_n = eye[axis] * jnp.take_along_axis(n_sign, axis[:, None], axis=-1)
    p_local = qo + (t_local[:, None] - HIT_EPS) * qd
    p_world = _xform_point(transform, p_local)
    normal = _normalize(_xform_dir(inv_transpose, local_n))
    t = jnp.linalg.norm(origins - p_world, axis=-1)
    return jnp.where(hit, t, -1.0), normal, outside


def sphere_intersect(transform, inverse_transform, inv_transpose, origins, directions):
    """Unit-diameter sphere (radius .5) quadratic test (intersections.h:102-144)."""
    qo = _xform_point(inverse_transform, origins)
    qd = _normalize(_xform_dir(inverse_transform, directions))

    v_dot_d = jnp.sum(qo * qd, axis=-1)
    radicand = v_dot_d * v_dot_d - (jnp.sum(qo * qo, axis=-1) - 0.25)
    has_root = radicand >= 0
    root = jnp.sqrt(jnp.maximum(radicand, 0.0))
    t1 = -v_dot_d + root
    t2 = -v_dot_d - root

    both_neg = (t1 < 0) & (t2 < 0)
    both_pos = (t1 > 0) & (t2 > 0)
    t_local = jnp.where(both_pos, jnp.minimum(t1, t2), jnp.maximum(t1, t2))
    outside = both_pos
    hit = has_root & ~both_neg

    p_local = qo + (t_local[:, None] - HIT_EPS) * qd
    p_world = _xform_point(transform, p_local)
    normal = _normalize(_xform_dir(inv_transpose, p_local))
    normal = jnp.where(outside[:, None], normal, -normal)
    t = jnp.linalg.norm(origins - p_world, axis=-1)
    return jnp.where(hit, t, -1.0), normal, outside & hit


def aabb_intersect(aabb_min, aabb_max, origins, directions):
    """World-space AABB slab pre-test (cf. intersections.h:146-175, which runs
    in local space on the loader's broken AABB; ours is a correct world test)."""
    inv_d = 1.0 / directions
    t1 = (aabb_min - origins) * inv_d
    t2 = (aabb_max - origins) * inv_d
    tmin = jnp.max(jnp.minimum(t1, t2), axis=-1)
    tmax = jnp.min(jnp.maximum(t1, t2), axis=-1)
    return (tmax >= tmin) & (tmax > 0)


def mesh_intersect(dev, origins, directions, face_chunk: int = 64):
    """Nearest triangle over the global world-space face buffer.

    Streams faces in chunks via lax.scan, carrying (best_t, best_face).
    Returns (t [N] with inf for miss, face_idx [N]).
    """
    F = dev.face_v0.shape[0]
    n = origins.shape[0]
    n_chunks = F // face_chunk
    assert n_chunks * face_chunk == F, "face buffer must be chunk-padded"

    def body(carry, ci):
        best_t, best_f = carry
        start = ci * face_chunk
        v0 = lax.dynamic_slice_in_dim(dev.face_v0, start, face_chunk)  # [C,3]
        e1 = lax.dynamic_slice_in_dim(dev.face_e1, start, face_chunk)
        e2 = lax.dynamic_slice_in_dim(dev.face_e2, start, face_chunk)

        # Moller-Trumbore, rays [N,1,3] x faces [1,C,3]
        d = directions[:, None, :]
        pvec = jnp.cross(d, e2[None, :, :])  # [N,C,3]
        det = jnp.sum(e1[None] * pvec, axis=-1)  # [N,C]
        inv_det = 1.0 / jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
        tvec = origins[:, None, :] - v0[None]
        u = jnp.sum(tvec * pvec, axis=-1) * inv_det
        qvec = jnp.cross(tvec, e1[None])
        v = jnp.sum(d * qvec, axis=-1) * inv_det
        t = jnp.sum(e2[None] * qvec, axis=-1) * inv_det
        hit = (
            (jnp.abs(det) > 1e-12)
            & (u >= 0.0)
            & (v >= 0.0)
            & (u + v <= 1.0)
            & (t > HIT_EPS)
        )
        t = jnp.where(hit, t, jnp.inf)  # [N,C]
        tc = jnp.min(t, axis=-1)
        jc = jnp.argmin(t, axis=-1).astype(jnp.int32) + start
        better = tc < best_t
        return (
            jnp.where(better, tc, best_t),
            jnp.where(better, jc, best_f),
        ), None

    init = (jnp.full((n,), jnp.inf, origins.dtype), jnp.zeros((n,), jnp.int32))
    (t, f), _ = lax.scan(body, init, jnp.arange(n_chunks))
    return t, f


def fetch_texel(dev, tex_id, uv):
    """Nearest-neighbor fetch from the decoded texture atlas.

    tex_id [N] (0 = null texture), uv [N,2]. Returns (rgb [N,3], present [N]).
    Matches interactions.h's int(u*w) indexing with clamping added.
    """
    meta = dev.tex_meta[tex_id]  # [N,4]
    off, w, h, ch = meta[:, 0], meta[:, 1], meta[:, 2], meta[:, 3]
    cu = jnp.clip((uv[:, 0] * w).astype(jnp.int32), 0, jnp.maximum(w - 1, 0))
    cv = jnp.clip((uv[:, 1] * h).astype(jnp.int32), 0, jnp.maximum(h - 1, 0))
    pix = off + cv * w + cu
    rgb = dev.tex_atlas[pix]  # [N,3]
    present = ch > 0
    return jnp.where(present[:, None], rgb, 0.0), present


def _mesh_normal_uv(dev, face_idx, directions):
    """Geometric normal, uv placeholder pieces for the winning face.

    Normal is normalize(cross(e1, e2)) in world space, matching the
    local-space cross + invTranspose of intersections.h:237-242. Bump-map
    perturbation (TBN, intersections.h:245-279) is applied on top when the
    owning geom has a bump texture.
    """
    e1 = dev.face_e1[face_idx]  # [N,3]
    e2 = dev.face_e2[face_idx]
    normal = _normalize(jnp.cross(e1, e2))
    return normal, e1, e2


def _apply_bump(dev, face_idx, gid, uv, normal, e1, e2):
    """TBN bump-map normal perturbation (intersections.h:245-279)."""
    uv0 = dev.face_uv0[face_idx]
    duv1 = dev.face_uv1[face_idx] - uv0
    duv2 = dev.face_uv2[face_idx] - uv0
    denom = duv1[:, 0] * duv2[:, 1] - duv2[:, 0] * duv1[:, 1]
    f = 1.0 / jnp.where(jnp.abs(denom) < 1e-20, 1e-20, denom)
    tangent = _normalize(f[:, None] * (duv2[:, 1:2] * e1 - duv1[:, 1:2] * e2))
    bitangent = _normalize(f[:, None] * (-duv2[:, 0:1] * e1 + duv1[:, 0:1] * e2))
    # e1/e2 are already world-space, so T/B need no extra transform.
    bump_id = dev.geom_bump[gid]
    texel, present = fetch_texel(dev, bump_id, uv)
    tsn = _normalize(_normalize(texel) * 2.0 - 1.0)
    bumped = _normalize(
        tsn[:, 0:1] * tangent + tsn[:, 1:2] * bitangent + tsn[:, 2:3] * normal
    )
    return jnp.where(present[:, None], bumped, normal)


def intersect_scene(dev, origins, directions, face_chunk: int = 64) -> Intersection:
    """Nearest hit over all geoms: branchless per-type tests + mesh stream.

    Equivalent of computeIntersections (pathtrace.cu:303-386): geoms are
    scanned with per-type dispatch; first geom wins ties (argmin picks the
    first minimum, like the strict `t_min > t` update). TRIANGLE-typed geoms
    have no dispatch case in the reference and never hit — preserved.
    """
    n = origins.shape[0]

    def per_geom(gtype, tf, itf, itt):
        tb, nb, ob = box_intersect(tf, itf, itt, origins, directions)
        ts, ns, os_ = sphere_intersect(tf, itf, itt, origins, directions)
        is_cube = gtype == int(GeomType.CUBE)
        is_sph = gtype == int(GeomType.SPHERE)
        t = jnp.where(is_cube, tb, jnp.where(is_sph, ts, -1.0))
        nrm = jnp.where(is_cube, nb, ns)
        out = jnp.where(is_cube, ob, os_)
        return t, nrm, out

    t_g, n_g, o_g = jax.vmap(per_geom)(
        dev.geom_type, dev.transform, dev.inverse_transform, dev.inv_transpose
    )  # [G,N], [G,N,3], [G,N]

    t_pos = jnp.where(t_g > 0, t_g, jnp.inf)  # [G,N]
    gi = jnp.argmin(t_pos, axis=0).astype(jnp.int32)  # [N]
    t_prim = jnp.take_along_axis(t_pos, gi[None], axis=0)[0]  # [N]
    lane = jnp.arange(n)
    n_prim = n_g[gi, lane]  # [N,3]
    o_prim = o_g[gi, lane]

    t_mesh, face_idx = mesh_intersect(dev, origins, directions, face_chunk)
    mesh_gid = dev.face_geom[face_idx]

    mesh_wins = t_mesh < t_prim
    t_best = jnp.where(mesh_wins, t_mesh, t_prim)
    hit = jnp.isfinite(t_best)

    # Mesh hit attributes
    bary_uv = _barycentric_uv(dev, face_idx, origins, directions, t_mesh)
    m_nrm, e1, e2 = _mesh_normal_uv(dev, face_idx, directions)
    m_out = jnp.sum(m_nrm * directions, axis=-1) < 0
    m_nrm = _apply_bump(dev, face_idx, mesh_gid, bary_uv, m_nrm, e1, e2)

    geom_id = jnp.where(mesh_wins, mesh_gid, gi)
    normal = jnp.where(mesh_wins[:, None], m_nrm, n_prim)
    uv = jnp.where(mesh_wins[:, None], bary_uv, 0.0)
    outside = jnp.where(mesh_wins, m_out, o_prim)

    material_id = dev.geom_material[geom_id]
    return Intersection(
        t=jnp.where(hit, t_best, -1.0),
        normal=normal,
        uv=uv,
        geom_id=jnp.where(hit, geom_id, -1),
        material_id=jnp.where(hit, material_id, 0),
        outside=outside,
    )


def _barycentric_uv(dev, face_idx, origins, directions, t):
    """Interpolated texcoord at the hit point (intersections.h:221-226).

    Recomputes (u, v) for the winning face only — cheaper than carrying
    [N, chunk] uv through the face scan.
    """
    v0 = dev.face_v0[face_idx]
    e1 = dev.face_e1[face_idx]
    e2 = dev.face_e2[face_idx]
    t_safe = jnp.where(jnp.isfinite(t), t, 0.0)
    pvec = jnp.cross(directions, e2)
    det = jnp.sum(e1 * pvec, axis=-1)
    inv_det = 1.0 / jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
    tvec = origins - v0
    u = jnp.sum(tvec * pvec, axis=-1) * inv_det
    qvec = jnp.cross(tvec, e1)
    v = jnp.sum(directions * qvec, axis=-1) * inv_det
    del t_safe
    uv0 = dev.face_uv0[face_idx]
    uv1 = dev.face_uv1[face_idx]
    uv2 = dev.face_uv2[face_idx]
    w = 1.0 - u - v
    return w[:, None] * uv0 + u[:, None] * uv1 + v[:, None] * uv2
