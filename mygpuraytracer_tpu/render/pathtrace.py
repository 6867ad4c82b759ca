"""One Monte-Carlo camera sample: the wavefront pipeline (SoA fast path).

TPU re-architecture of pathtrace() (apps/src/pathtrace.cu:527-671). The
reference's dynamic while-loop with stream compaction becomes a fixed-length
bounce loop over static-shape SoA buffers:

    one RNG block -> raygen -> bounce 0 (first-bounce cache + albedo AOV) ->
    lax.scan over bounces 1..depth-1 -> finalGather (color * pi)

Dead lanes are masked rather than compacted (see ops/compaction.py for why).
Each scanned bounce is guarded by a scalar ``any alive`` lax.cond so late
bounces in scenes with heavy early termination are skipped outright — the
static-shape analog of the reference's ``num_paths == 0`` early exit
(pathtrace.cu:651).

All per-iteration randomness is generated as ONE [K, N] block up front
(row-major streams: 2 AA + 2 DoF + 3 per bounce); per-bounce rows are carved
out with dynamic slices. One RNG dispatch per sample instead of 9+.

First-bounce cache semantics (pathtrace.cu:586-609): active only when AA and
DoF are off; iteration 1 writes the cache, later iterations reuse it.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from ..config import RenderOptions
from ..ops import rng
from ..ops.prng import iteration_uniforms
from ..ops.trace import HitSoA, intersect_soa
from ..ops.vec3 import Vec3
from ..scene.device_scene import DeviceScene, SceneMeta
from .camera import generate_camera_rays
from .shade import PathStateSoA, albedo_soa, shade_soa

PI = math.pi  # finalGather multiplies by pi (pathtrace.cu:508)


class SampleOutput(NamedTuple):
    color: Vec3  # [N] triple — this sample's contribution (already * pi)
    albedo: Vec3  # [N] triple — zero except at iteration 1
    normal: Vec3  # [N] triple — first-hit shading normal, zero except iter 1
    cache: HitSoA  # updated first-bounce cache
    # SH-L1 directional AOV (options.dir_aov): first-bounce scatter direction
    # weighted by this sample's path luminance, plus the luminance itself —
    # accumulating both and dividing yields the normalized [-1,1] mean
    # incident direction the rtlightmap_dir filter consumes.
    dirmap: Vec3 | None = None
    dirlum: jnp.ndarray | None = None


def make_empty_cache(n: int) -> HitSoA:
    # Distinct buffers per field: the cache is donated, and donated pytree
    # leaves must not alias each other.
    z = lambda: jnp.zeros((n,), jnp.float32)
    zi = lambda: jnp.zeros((n,), jnp.int32)
    zb = lambda: jnp.zeros((n,), bool)
    zv = lambda: Vec3(z(), z(), z())
    return HitSoA(
        t=jnp.full((n,), jnp.inf, jnp.float32),
        hit=zb(),
        normal=zv(),
        is_obj=zb(),
        color=zv(),
        spec_color=zv(),
        spec_ex=z(),
        refl=z(),
        refr=z(),
        ior=z(),
        emit=z(),
        material_id=zi(),
        u=z(),
        v=z(),
        kd=zi(),
        ks=zi(),
        ke=zi(),
        bump=zi(),
    )


def num_rng_streams(trace_depth: int) -> int:
    return 4 + 3 * trace_depth


def _rebuild_material_fields(meta, mat_id, hit_mask):
    """Re-expand the per-material constant HitSoA fields from a (sorted)
    material-id vector via the same literal select chain intersection used
    to set them (ops/trace.py set_mat) — miss lanes (hit_mask False) keep
    the zero defaults, exactly like intersect's init state. Values are
    bit-identical to the pre-sort fields: both sides select the same
    python-float constants from meta.geoms."""
    z = jnp.zeros_like(mat_id, dtype=jnp.float32)
    col = [z, z, z]
    spec = [z, z, z]
    spec_ex, refl, refr, ior, emit = z, z, z, z, z
    seen = set()
    for g in meta.geoms:
        if g.material_id in seen:
            continue  # same material -> same constants; one select suffices
        seen.add(g.material_id)
        sel = hit_mask & (mat_id == g.material_id)
        col = [jnp.where(sel, c, a) for c, a in zip(g.color, col)]
        spec = [jnp.where(sel, c, a) for c, a in zip(g.spec_color, spec)]
        spec_ex = jnp.where(sel, g.spec_exponent, spec_ex)
        refl = jnp.where(sel, g.has_reflective, refl)
        refr = jnp.where(sel, g.has_refractive, refr)
        ior = jnp.where(sel, g.ior, ior)
        emit = jnp.where(sel, g.emittance, emit)
    return Vec3(*col), Vec3(*spec), spec_ex, refl, refr, ior, emit


def _sort_wavefront(
    meta, state: PathStateSoA, hit: HitSoA, pixel: jnp.ndarray,
    num_materials: int, impl: str = "fused",
):
    """Material-sorted execution (thrust::sort_by_key, pathtrace.cu:590,612).

    Jointly sorts the path state, the intersections, and the pixel map by
    descending material id so lanes shading the same material are contiguous.
    Because RNG streams are then gathered by pixel id (matching the
    reference, whose RNG seed hashes the original pixel index,
    pathtrace.cu:409), the rendered image is bitwise identical with sorting
    on or off — only the execution order changes. The three ``impl`` forms
    apply the SAME stable permutation (RenderOptions.sort_impl).

    ``impl="fused"`` (the default) co-sorts ONLY the genuinely per-lane
    arrays in one variadic ``lax.sort`` — ray state, hit geometry (t,
    normal, texcoords, texture slots), pixel map — and re-expands the
    per-MATERIAL constant fields (diffuse/spec color, exponent, refl/refr/
    ior/emittance) from the sorted key afterwards: they are pure functions
    of material id, so moving them through the sort network is pure cost.
    The first fused form co-sorted all 37 wavefront arrays and its two
    sort ops compiled for >20 min on the tunnel (scripts/
    probe_sort_impls.py, 2026-08-19) — payload width is what both the
    Mosaic compile and the on-chip sort passes scale with.

    Measured on the BASELINE #3 config (cornell 800^2, DoF + first-bounce
    cache + sort, v5e, 2026-08-19): unsorted 13.6 ms/iter; 17-operand
    fused sort with the packed [N,4] RNG row fetch **98.9 ms/iter =
    6.47 Msam/s** (round 3's argsort+gathers form: 0.32). Decomposition:
    sort machinery ~6.6 ms/bounce (timing escape below: 66.4 ms/iter),
    RNG row gather ~4 ms/bounce; the three separate [N] stream gathers
    this replaces cost ~20 ms/bounce — per-index latency dominates
    gathers, so one 16-byte-row fetch is ~5x cheaper than three 4-byte
    ones.
    """
    if impl == "fused":
        textured = bool(meta.has_textures)
        operands = [
            state.origin.x, state.origin.y, state.origin.z,
            state.direction.x, state.direction.y, state.direction.z,
            state.color.x, state.color.y, state.color.z,
            state.remaining,
            hit.t, hit.normal.x, hit.normal.y, hit.normal.z, hit.is_obj,
            pixel,
        ]
        if textured:
            operands += [hit.u, hit.v, hit.kd, hit.ks, hit.ke, hit.bump]
        out = jax.lax.sort((-hit.material_id, *operands), num_keys=1,
                           is_stable=True)
        mat_id = -out[0]
        (ox, oy, oz, dx, dy, dz, cx, cy, cz, remaining,
         t, nx, ny, nz, is_obj, pix) = out[1:17]
        if textured:
            u, v, kd, ks, ke, bump = out[17:23]
        else:
            zf = jnp.zeros_like(t)
            zi = jnp.zeros_like(mat_id)
            u, v, kd, ks, ke, bump = zf, zf, zi, zi, zi, zi
        hit_mask = jnp.isfinite(t)
        col, spec, spec_ex, refl, refr, ior, emit = _rebuild_material_fields(
            meta, mat_id, hit_mask
        )
        state = PathStateSoA(
            origin=Vec3(ox, oy, oz), direction=Vec3(dx, dy, dz),
            color=Vec3(cx, cy, cz), remaining=remaining,
        )
        hit = HitSoA(
            t=t, hit=hit_mask, normal=Vec3(nx, ny, nz), is_obj=is_obj,
            color=col, spec_color=spec, spec_ex=spec_ex, refl=refl,
            refr=refr, ior=ior, emit=emit, material_id=mat_id,
            u=u, v=v, kd=kd, ks=ks, ke=ke, bump=bump,
        )
        return state, hit, pix

    flat_s, tree_s = jax.tree_util.tree_flatten(state)
    flat_h, tree_h = jax.tree_util.tree_flatten(hit)
    ns = len(flat_s)
    operands = (*flat_s, *flat_h, pixel)
    if impl == "perm":
        from ..ops.compaction import material_sort_perm

        perm = material_sort_perm(hit.material_id, num_materials)
        rest = tuple(a[perm] for a in operands)
    elif impl == "argsort":
        order = jnp.argsort(-hit.material_id, stable=True)
        rest = tuple(a[order] for a in operands)
    else:
        raise ValueError(f"unknown sort_impl {impl!r}")
    state = jax.tree_util.tree_unflatten(tree_s, rest[:ns])
    hit = jax.tree_util.tree_unflatten(tree_h, rest[ns:-1])
    return state, hit, rest[-1]


def render_sample(
    dev: DeviceScene,
    meta: SceneMeta,
    options: RenderOptions,
    iteration: jnp.ndarray,  # i32 scalar, 1-based like the reference
    base_key: jax.Array,
    cache: HitSoA,
) -> SampleOutput:
    width, height = meta.resolution
    n = width * height
    trace_depth = meta.trace_depth

    if options.megakernel and not options.dir_aov:
        from .megakernel import _uses_bvh, megakernel_sample, supports_megakernel

        if supports_megakernel(meta, options):
            from .megakernel import bounce_face_buffer

            fb = (bounce_face_buffer(dev) if _uses_bvh(meta)
                  else dev.face_plane)
            color, alb, nrm = megakernel_sample(
                meta, options, dev.camera, fb, iteration, base_key
            )
            first = iteration == 1
            z = lambda: jnp.zeros((n,), jnp.float32)
            albedo = Vec3(
                jnp.where(first, alb.x, z()),
                jnp.where(first, alb.y, z()),
                jnp.where(first, alb.z, z()),
            )
            normal = Vec3(
                jnp.where(first, nrm.x, z()),
                jnp.where(first, nrm.y, z()),
                jnp.where(first, nrm.z, z()),
            )
            return SampleOutput(color=color, albedo=albedo, normal=normal, cache=cache)

    ikey = rng.iteration_key(base_key, iteration)
    U = iteration_uniforms(options, ikey, iteration, num_rng_streams(trace_depth), n)

    o, d = generate_camera_rays(dev.camera, meta.resolution, options, U)
    ones = jnp.ones((n,), jnp.float32)
    state = PathStateSoA(
        origin=o,
        direction=d,
        color=Vec3(ones, ones, ones),
        remaining=jnp.full((n,), trace_depth, jnp.int32),
    )

    # ---- bounce 0: cache + albedo -------------------------------------------
    if options.first_bounce_cache_active:
        def compute_and_cache(_):
            h = intersect_soa(
                meta, dev, state.origin, state.direction, options.face_chunk,
                bounding_box=options.bounding_box,
                mesh_pallas=options.mesh_pallas,
                mesh_sort=options.mesh_sort,
                mesh_tier=options.mesh_tier,
                winner_table=options.winner_table,
            )
            return h, h

        def reuse(_):
            return cache, cache

        hit0, new_cache = lax.cond(iteration == 1, compute_and_cache, reuse, None)
    else:
        hit0 = intersect_soa(
            meta, dev, state.origin, state.direction, options.face_chunk,
            bounding_box=options.bounding_box,
            mesh_pallas=options.mesh_pallas,
            mesh_sort=options.mesh_sort,
            mesh_tier=options.mesh_tier,
            winner_table=options.winner_table,
        )
        new_cache = cache

    alb = albedo_soa(meta, dev, hit0)
    first = iteration == 1
    z = jnp.zeros((n,), jnp.float32)
    albedo = Vec3(
        jnp.where(first, alb.x, z), jnp.where(first, alb.y, z), jnp.where(first, alb.z, z)
    )
    hit_first = first & hit0.hit
    normal = Vec3(
        jnp.where(hit_first, hit0.normal.x, z),
        jnp.where(hit_first, hit0.normal.y, z),
        jnp.where(hit_first, hit0.normal.z, z),
    )
    do_sort = options.sort_by_material and meta.num_geoms > 1 and not options.dir_aov
    num_materials = int(dev.mat_color.shape[0])
    pixel = jnp.arange(n, dtype=jnp.int32)
    if do_sort:
        # RNG streams follow the ORIGINAL pixel id (the reference hashes
        # pixelIndex, pathtrace.cu:409), so the sorted wavefront fetches its
        # three shade streams through the accumulated permutation each
        # bounce. Pack them into 16-byte [N,4] rows up front: ONE row gather
        # per bounce instead of three [N] gathers — per-index latency, not
        # bytes, is what a 640k-lane gather costs on this TPU
        # (docs/MESH_TIERS.md "per-bounce gathers").
        import os as _os

        u_shade = U[4:4 + 3 * trace_depth].reshape(trace_depth, 3, n)
        U4 = jnp.concatenate(
            [
                jnp.moveaxis(u_shade, 1, 2),
                jnp.zeros((trace_depth, n, 1), U.dtype),
            ],
            axis=2,
        )
        # Timing-only escape (scripts/probe_sort_impls.py decomposition):
        # skips the permutation fetch so the probe can price the sort alone.
        # Renders the WRONG image — never set outside measurement.
        _skip_rng_gather = bool(_os.environ.get("MYGPURT_SORT_TIMING_NO_RNG_GATHER"))

        def bounce_rng(depth_idx, pix):
            rows = lax.dynamic_index_in_dim(U4, depth_idx, axis=0, keepdims=False)
            if not _skip_rng_gather:
                rows = rows[pix]
            return rows[:, 0], rows[:, 1], rows[:, 2]

        state, hit0, pixel = _sort_wavefront(
            meta, state, hit0, pixel, num_materials, options.sort_impl
        )
        u0, u1, u2 = bounce_rng(0, pixel)
        state = shade_soa(meta, dev, state, hit0, u0, u1, u2)
    else:
        state = shade_soa(meta, dev, state, hit0, U[4], U[5], U[6])

    # ---- bounces 1..depth-1 ---------------------------------------------------
    def bounce(carry, depth_idx):
        def do(c):
            s, pix = c
            h = intersect_soa(
                meta, dev, s.origin, s.direction, options.face_chunk,
                bounding_box=options.bounding_box,
                mesh_pallas=options.mesh_pallas,
                mesh_sort=options.mesh_sort,
                mesh_tier=options.mesh_tier,
                winner_table=options.winner_table,
                # Terminated lanes keep a stale ray (shade passes them
                # through) that still slab-hits mesh clusters; mask them out
                # of the mesh tiers' visit lists (on shipOnly only ~3% of
                # lanes survive bounce 0 — scripts/probe_liveness.py).
                # Image-invariant: shade ignores every field of a dead lane.
                active=s.remaining > 0,
            )
            if do_sort:
                s, h, pix = _sort_wavefront(
                    meta, s, h, pix, num_materials, options.sort_impl
                )
                u0, u1, u2 = bounce_rng(depth_idx, pix)
                return shade_soa(meta, dev, s, h, u0, u1, u2), pix
            u = lax.dynamic_slice_in_dim(U, 4 + 3 * depth_idx, 3, axis=0)
            return shade_soa(meta, dev, s, h, u[0], u[1], u[2]), pix

        any_alive = jnp.any(carry[0].remaining > 0)
        carry = lax.cond(any_alive, do, lambda c: c, carry)
        return carry, None

    if options.dir_aov:
        # First-bounce scatter direction of lanes that survived bounce 0
        # (miss / light-hit / depth-exhausted lanes carry no direction).
        dir0 = state.direction
        alive0 = state.remaining > 0

    if trace_depth > 1:
        (state, pixel), _ = lax.scan(bounce, (state, pixel), jnp.arange(1, trace_depth))

    color = Vec3(state.color.x * PI, state.color.y * PI, state.color.z * PI)
    if do_sort:
        # Scatter the sorted lanes back to pixel order (finalGather keys on
        # pathSegments.pixelIndex the same way, pathtrace.cu:501-510).
        color = Vec3(
            jnp.zeros((n,), jnp.float32).at[pixel].set(color.x),
            jnp.zeros((n,), jnp.float32).at[pixel].set(color.y),
            jnp.zeros((n,), jnp.float32).at[pixel].set(color.z),
        )
    dirmap, dirlum = None, None
    if options.dir_aov:
        lum = 0.2126 * color.x + 0.7152 * color.y + 0.0722 * color.z
        w_lum = jnp.where(alive0, lum, 0.0)
        dirmap = Vec3(dir0.x * w_lum, dir0.y * w_lum, dir0.z * w_lum)
        dirlum = w_lum
    return SampleOutput(
        color=color, albedo=albedo, normal=normal, cache=new_cache,
        dirmap=dirmap, dirlum=dirlum,
    )
