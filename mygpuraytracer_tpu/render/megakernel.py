"""Pallas megakernel: whole Monte-Carlo sample batches in ONE TPU kernel.

For scenes of primitives (+ small literal-baked meshes, SceneMeta.mega_faces),
everything — raygen with AA jitter, the full bounce loop with statically
unrolled geometry, BSDF shading, the pi-weighted gather, and the accumulation
across a whole batch of iterations — runs inside a single `pallas_call`:

- ray state and the image accumulator live in VMEM for the kernel's entire
  lifetime: zero HBM traffic between bounces AND between iterations (the XLA
  wavefront path round-trips ~10 state arrays per bounce);
- randomness comes from the on-core hardware PRNG, seeded per
  (renderer seed, iteration, block) so results are independent of batching;
- the accumulators are aliased in/out, so a batch costs one HBM read+write.

The geometry/shading math is the SAME code as the XLA path
(ops.trace.primitives_hit + render.shade.shade_soa, both shape-agnostic over
2D VMEM tiles), so the megakernel inherits the oracle-checked semantics.

Scenes with textures or >256-face meshes fall back to the wavefront path.
"""

from __future__ import annotations

import functools
import math

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops import vec3 as v3
from ..ops.trace import bvh_scene_hit, primitives_hit
from ..ops.vec3 import Vec3
from .shade import PathStateSoA, albedo_soa, shade_soa

PI = math.pi

ROWS = 32  # rays per tile = ROWS x 128
LANES = 128
# Rows per mesh sub-block: the BVH tier's cluster-skip lax.conds fire per
# sub-block, so smaller blocks skip more of the mesh per visit (at more cond
# overhead). 8 = one f32 vreg row.
MESH_SUB_ROWS = 8

_MIX = int(np.int32(np.uint32(0x9E3779B1)))  # golden-ratio odd constant (python int)


def _uses_bvh(meta) -> bool:
    """Large meshes take the cluster-BVH tier; small ones stay literal."""
    small = meta.mega_faces and len(meta.mega_faces) == meta.num_faces
    return bool(meta.has_obj and not small and meta.mesh_clusters)


def supports_megakernel(meta, options) -> bool:
    """Primitive scenes, small literal-baked meshes (mega_faces), and —
    only under the explicit ``bounce_megakernel`` opt-in — large meshes via
    the cluster-BVH bounce kernel; textured scenes and (by default) BVH
    meshes fall back to the wavefront path, which measures faster on them
    (docs/MESH_TIERS.md "bounce megakernel")."""
    mesh_ok = (
        (not meta.has_obj)
        or (meta.mega_faces and len(meta.mega_faces) == meta.num_faces)
        or (options.bounce_megakernel and bool(meta.mesh_clusters))
    )
    return bool(
        mesh_ok
        and not meta.has_textures
        and not options.first_bounce_cache_active
    )


def _uniform(shape):
    bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    mant = pltpu.bitcast(bits >> 8, jnp.int32)
    return mant.astype(jnp.float32) * (1.0 / (1 << 24))


def _make_kernel(meta, options):
    width, height = meta.resolution
    trace_depth = meta.trace_depth
    shape = (ROWS, LANES)
    use_bvh = _uses_bvh(meta)

    def scene_hit(fp_ref, o, d):
        if not use_bvh:
            return primitives_hit(meta, o, d)
        # BVH tier on sub-blocks: finer scalar cond granularity means a
        # sub-block whose rays all miss a cluster AABB skips its 128 faces.
        parts = []
        for s in range(0, ROWS, MESH_SUB_ROWS):
            e = s + MESH_SUB_ROWS
            parts.append(
                bvh_scene_hit(
                    meta, fp_ref,
                    Vec3(o.x[s:e], o.y[s:e], o.z[s:e]),
                    Vec3(d.x[s:e], d.y[s:e], d.z[s:e]),
                )
            )
        return jax.tree.map(lambda *xs: jnp.concatenate(xs, axis=0), *parts)

    def trace_one(iteration, cam_ref, fp_ref, in_image):
        """One camera sample for this tile; returns (color Vec3, albedo Vec3)."""
        pid = pl.program_id(0)
        base = pid * (ROWS * LANES)
        row = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
        colm = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
        idx = base + row * LANES + colm
        x = (idx % width).astype(jnp.float32)
        y = (idx // width).astype(jnp.float32)

        if options.antialiasing:
            x = x + (_uniform(shape) - 0.5)  # pathtrace.cu:267
            y = y + (_uniform(shape) - 0.5)

        sx = cam_ref[12] * (x - width * 0.5)
        sy = cam_ref[13] * (y - height * 0.5)
        d = v3.normalize(
            Vec3(
                cam_ref[3] - cam_ref[9] * sx - cam_ref[6] * sy,
                cam_ref[4] - cam_ref[10] * sx - cam_ref[7] * sy,
                cam_ref[5] - cam_ref[11] * sx - cam_ref[8] * sy,
            )
        )
        o = Vec3(
            jnp.full(shape, 0.0) + cam_ref[0],
            jnp.full(shape, 0.0) + cam_ref[1],
            jnp.full(shape, 0.0) + cam_ref[2],
        )

        if options.depth_of_field and options.lens_radius > 0:
            # thin-lens DoF via concentric disk (pathtrace.cu:225-293)
            ux = 2.0 * _uniform(shape) - 1.0
            uy = 2.0 * _uniform(shape) - 1.0
            use_x = jnp.abs(ux) > jnp.abs(uy)
            sx_ = jnp.where(ux == 0.0, 1.0, ux)
            sy_ = jnp.where(uy == 0.0, 1.0, uy)
            rr = jnp.where(use_x, ux, uy)
            theta = jnp.where(use_x, 0.785398 * (uy / sx_), 1.570796 - 0.785398 * (ux / sy_))
            degen = (ux == 0.0) & (uy == 0.0)
            px = jnp.where(degen, 0.0, options.lens_radius * rr * jnp.cos(theta))
            py = jnp.where(degen, 0.0, options.lens_radius * rr * jnp.sin(theta))
            ft = jnp.abs(options.focal_distance / d.z)
            focus = Vec3(o.x + d.x * ft, o.y + d.y * ft, o.z + d.z * ft)
            o = Vec3(o.x + px, o.y + py, o.z)
            d = v3.normalize(focus - o)

        ones = jnp.ones(shape, jnp.float32)
        state = PathStateSoA(
            origin=o,
            direction=d,
            color=Vec3(ones, ones * 1.0, ones * 1.0),
            remaining=jnp.full(shape, trace_depth, jnp.int32),
        )

        # bounce 0 (always) — also captures the AOVs
        hit0 = scene_hit(fp_ref, state.origin, state.direction)
        albedo = albedo_soa(meta, None, hit0)
        first_hit = hit0
        state = shade_soa(
            meta, None, state, hit0, _uniform(shape), _uniform(shape), _uniform(shape)
        )

        def bounce(s: PathStateSoA) -> PathStateSoA:
            h = scene_hit(fp_ref, s.origin, s.direction)
            return shade_soa(
                meta, None, s, h, _uniform(shape), _uniform(shape), _uniform(shape)
            )

        def guarded_bounce(s: PathStateSoA) -> PathStateSoA:
            # Tile-level early exit: rays in a tile die together for coherent
            # tiles (misses, light hits); skip whole bounces when none live.
            return lax.cond(jnp.any(s.remaining > 0), bounce, lambda x: x, s)

        if use_bvh:
            # fori, not unroll: the BVH tier's cluster scan would multiply
            # the program by trace_depth otherwise (compile-time blowup).
            state = lax.fori_loop(
                1, trace_depth, lambda i, s: guarded_bounce(s), state
            )
        else:
            for depth in range(1, trace_depth):
                state = guarded_bounce(state)

        mask = in_image.astype(jnp.float32)
        color = Vec3(
            state.color.x * (PI * mask),
            state.color.y * (PI * mask),
            state.color.z * (PI * mask),
        )
        albedo = Vec3(albedo.x * mask, albedo.y * mask, albedo.z * mask)
        nm = first_hit.hit.astype(jnp.float32) * mask
        normal = Vec3(first_hit.normal.x * nm, first_hit.normal.y * nm, first_hit.normal.z * nm)
        return color, albedo, normal

    def kernel(
        seed_ref, start_ref, niter_ref, cam_ref, fp_ref,
        in_r, in_g, in_b, in_ar, in_ag, in_ab, in_nr, in_ng, in_nb,
        r_ref, g_ref, b_ref, ar_ref, ag_ref, ab_ref, nr_ref, ng_ref, nb_ref,
    ):
        pid = pl.program_id(0)
        base = pid * (ROWS * LANES)
        row = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
        colm = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
        idx = base + row * LANES + colm
        in_image = idx < (width * height)

        def body(i, acc):
            img, alb, nrm = acc
            iteration = start_ref[0] + i
            # Stream depends on (seed, iteration, block) only — batching-
            # independent and reproducible.
            pltpu.prng_seed((seed_ref[0] + iteration) * jnp.int32(_MIX) + pid)
            color, a, nn = trace_one(iteration, cam_ref, fp_ref, in_image)
            img = Vec3(img.x + color.x, img.y + color.y, img.z + color.z)
            first = jnp.full(shape, iteration == 1)
            alb = v3.where(first, a, alb)
            nrm = v3.where(first, nn, nrm)
            return (img, alb, nrm)

        img0 = Vec3(in_r[:, :], in_g[:, :], in_b[:, :])
        alb0 = Vec3(in_ar[:, :], in_ag[:, :], in_ab[:, :])
        nrm0 = Vec3(in_nr[:, :], in_ng[:, :], in_nb[:, :])
        img, alb, nrm = lax.fori_loop(0, niter_ref[0], body, (img0, alb0, nrm0))
        r_ref[:, :] = img.x
        g_ref[:, :] = img.y
        b_ref[:, :] = img.z
        ar_ref[:, :] = alb.x
        ag_ref[:, :] = alb.y
        ab_ref[:, :] = alb.z
        nr_ref[:, :] = nrm.x
        ng_ref[:, :] = nrm.y
        nb_ref[:, :] = nrm.z

    return kernel


def _pad_to_tiles(n: int) -> int:
    tile = ROWS * LANES
    return ((n + tile - 1) // tile) * tile


@functools.partial(jax.jit, static_argnames=("meta", "options"))
def megakernel_accumulate(
    meta, options, camera, face_plane, image: Vec3, albedo: Vec3, normal: Vec3,
    start_iteration, num_iters, base_key,
):
    """Accumulate ``num_iters`` MC iterations into (image, albedo, normal)
    [N] Vec3 triples — one kernel dispatch for the whole batch."""
    width, height = meta.resolution
    n = width * height
    n_pad = _pad_to_tiles(n)
    grid = (n_pad // (ROWS * LANES),)

    # Per-renderer seed (NOT per-iteration: the kernel mixes the iteration in)
    seed = jax.random.randint(base_key, (1,), 0, 2**31 - 1, dtype=jnp.int32)

    cam_vec = jnp.concatenate(
        [camera.position, camera.view, camera.up, camera.right, camera.pixel_length]
    ).astype(jnp.float32)

    if not _uses_bvh(meta):
        face_plane = jnp.zeros((16, LANES), jnp.float32)  # unused dummy

    def to2d(a):
        return jnp.zeros((n_pad,), jnp.float32).at[:n].set(a).reshape(n_pad // LANES, LANES)

    ins2d = [to2d(a) for v in (image, albedo, normal) for a in (v.x, v.y, v.z)]

    spec = pl.BlockSpec((ROWS, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    vmem_full = pl.BlockSpec(memory_space=pltpu.VMEM)
    out_shape = [jax.ShapeDtypeStruct((n_pad // LANES, LANES), jnp.float32)] * 9
    outs = pl.pallas_call(
        _make_kernel(meta, options),
        grid=grid,
        in_specs=[smem, smem, smem, smem, vmem_full] + [spec] * 9,
        out_specs=[spec] * 9,
        out_shape=out_shape,
        input_output_aliases={5 + k: k for k in range(9)},
    )(
        seed,
        jnp.asarray(start_iteration, jnp.int32).reshape(1),
        jnp.asarray(num_iters, jnp.int32).reshape(1),
        cam_vec,
        face_plane,
        *ins2d,
    )

    flat = [a.reshape(-1)[:n] for a in outs]
    return Vec3(*flat[:3]), Vec3(*flat[3:6]), Vec3(*flat[6:9])


@functools.partial(jax.jit, static_argnames=("meta", "options"))
def megakernel_sample(meta, options, camera, face_plane, iteration, base_key):
    """One full MC iteration via the megakernel (render_sample-compatible).

    Returns (color, albedo, normal) Vec3 [N] triples — this sample's
    contribution and first-hit AOVs (caller applies the iteration==1 rule).
    """
    width, height = meta.resolution
    n = width * height
    z = lambda: jnp.zeros((n,), jnp.float32)
    accumulate = (bvh_bounce_accumulate if _uses_bvh(meta)
                  else megakernel_accumulate)
    img, alb, nrm = accumulate(
        meta,
        options,
        camera,
        face_plane,
        Vec3(z(), z(), z()),
        Vec3(z(), z(), z()),
        Vec3(z(), z(), z()),
        iteration,
        jnp.int32(1),
        base_key,
    )
    return img, alb, nrm


# ---------------------------------------------------------------------------
# Bounce megakernel: the cluster-BVH mesh tier fused with shading.
#
# The FULL iteration megakernel (raygen + iteration-fori + SMEM scalars +
# aliasing) crashes the Mosaic compiler when the BVH tier is fused in
# (array.h:480 CHECK, docs/MESH_TIERS.md bisection) — but the bisection also
# showed each crash-contributing feature passes individually on top of the
# bounce-loop core (P5-P7 + one feature probes). This variant keeps ONLY the
# SMEM seed and drops the rest: raygen is hoisted to XLA (reference-exact
# generate_camera_rays, pathtrace.cu:225-293), the iteration loop is an XLA
# fori around the pallas_call, accumulators add outside (no aliasing), and
# every trip count is static. What remains inside is the whole bounce loop —
# cluster-BVH intersect + BSDF shade + hardware PRNG — so the per-bounce
# wavefront HBM round-trips (~10 arrays x N per bounce) and the full-N
# elementwise floor disappear for mesh scenes too.


def bounce_face_buffer(dev):
    """Face buffer matching _make_bounce_kernel's walk variant.

    The near-to-far walk streams the sublane-shifted buffer
    (DeviceScene.face_shift, [104, Fp]); the MYGPURT_BOUNCE_WALK=conds
    debug escape streams the plane-form [16, Fp] face_plane. Callers must
    select through this helper so the buffer always matches the kernel."""
    import os

    return (dev.face_plane
            if os.environ.get("MYGPURT_BOUNCE_WALK") == "conds"
            else dev.face_shift)


def _make_bounce_kernel(meta, options):
    import os

    from ..ops.trace import bvh_scene_hit_nearfar

    width, height = meta.resolution
    n = width * height
    trace_depth = meta.trace_depth
    shape = (ROWS, LANES)
    # Debug escape hatch: the Morton cond-walk tier (slower: whole-union
    # visits, measured 883 vs the near-to-far walk on shipOnly 800^2) in
    # case a toolchain change breaks the while-loop walk's lowering.
    conds_walk = os.environ.get("MYGPURT_BOUNCE_WALK") == "conds"

    def scene_hit(fs_ref, o, d, active):
        parts = []
        for s in range(0, ROWS, MESH_SUB_ROWS):
            e = s + MESH_SUB_ROWS
            ov = Vec3(o.x[s:e], o.y[s:e], o.z[s:e])
            dv = Vec3(d.x[s:e], d.y[s:e], d.z[s:e])
            if conds_walk:
                parts.append(bvh_scene_hit(meta, fs_ref, ov, dv))
            else:
                parts.append(
                    bvh_scene_hit_nearfar(meta, fs_ref, ov, dv, active[s:e])
                )
        return jax.tree.map(lambda *xs: jnp.concatenate(xs, axis=0), *parts)

    def kernel(
        sc_ref, fp_ref, ox, oy, oz, dx, dy, dz,
        r_ref, g_ref, b_ref, ar_ref, ag_ref, ab_ref, nr_ref, ng_ref, nb_ref,
    ):
        pid = pl.program_id(0)
        # Stream depends on (seed+iteration, block) only — same mixing as the
        # iteration megakernel, so results are batching-independent.
        pltpu.prng_seed(sc_ref[0] * jnp.int32(_MIX) + pid)
        base = pid * (ROWS * LANES)
        row = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
        colm = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
        in_image = (base + row * LANES + colm) < n

        ones = jnp.ones(shape, jnp.float32)
        state = PathStateSoA(
            origin=Vec3(ox[:, :], oy[:, :], oz[:, :]),
            direction=Vec3(dx[:, :], dy[:, :], dz[:, :]),
            color=Vec3(ones, ones * 1.0, ones * 1.0),
            remaining=jnp.full(shape, trace_depth, jnp.int32),
        )

        # Mask the zero-padded out-of-image lanes out of the first walk:
        # their eps-clamped directions give tin ~1e21 < inf for EVERY
        # cluster, so an all-ones mask makes each padded row visit the
        # whole mesh at bounce 0 (~184 visits vs ~3 for live rows).
        hit0 = scene_hit(fp_ref, state.origin, state.direction, in_image)
        albedo = albedo_soa(meta, None, hit0)
        first_hit = hit0
        state = shade_soa(
            meta, None, state, hit0,
            _uniform(shape), _uniform(shape), _uniform(shape),
        )

        def bounce(s: PathStateSoA) -> PathStateSoA:
            h = scene_hit(fp_ref, s.origin, s.direction, s.remaining > 0)
            return shade_soa(
                meta, None, s, h,
                _uniform(shape), _uniform(shape), _uniform(shape),
            )

        def guarded(i, s):
            return lax.cond(jnp.any(s.remaining > 0), bounce, lambda x: x, s)

        state = lax.fori_loop(1, trace_depth, guarded, state)

        mask = in_image.astype(jnp.float32)
        r_ref[:, :] = state.color.x * (PI * mask)
        g_ref[:, :] = state.color.y * (PI * mask)
        b_ref[:, :] = state.color.z * (PI * mask)
        ar_ref[:, :] = albedo.x * mask
        ag_ref[:, :] = albedo.y * mask
        ab_ref[:, :] = albedo.z * mask
        nm = first_hit.hit.astype(jnp.float32) * mask
        nr_ref[:, :] = first_hit.normal.x * nm
        ng_ref[:, :] = first_hit.normal.y * nm
        nb_ref[:, :] = first_hit.normal.z * nm

    return kernel


@functools.partial(jax.jit, static_argnames=("meta", "options"))
def bvh_bounce_accumulate(
    meta, options, camera, face_buf, image: Vec3, albedo: Vec3, normal: Vec3,
    start_iteration, num_iters, base_key,
):
    """megakernel_accumulate-compatible batch accumulate for BVH scenes:
    XLA fori over iterations, each = XLA raygen -> one bounce-kernel call.

    ``face_buf`` is the sublane-shifted buffer (DeviceScene.face_shift,
    [104, Fp]) consumed by the in-kernel near-to-far walk — or, under the
    MYGPURT_BOUNCE_WALK=conds debug escape, the plane-form [16, Fp]
    face_plane the Morton cond-walk streams (callers select to match)."""
    from ..ops import rng as rng_mod
    from ..ops.prng import iteration_uniforms
    from .camera import generate_camera_rays

    width, height = meta.resolution
    n = width * height
    n_pad = _pad_to_tiles(n)
    grid = (n_pad // (ROWS * LANES),)
    seed = jax.random.randint(base_key, (), 0, 2**31 - 1, dtype=jnp.int32)

    spec = pl.BlockSpec((ROWS, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    out_shape = [jax.ShapeDtypeStruct((n_pad // LANES, LANES), jnp.float32)] * 9
    call = pl.pallas_call(
        _make_bounce_kernel(meta, options),
        grid=grid,
        in_specs=[smem, pl.BlockSpec(memory_space=pltpu.VMEM)] + [spec] * 6,
        out_specs=[spec] * 9,
        out_shape=out_shape,
    )

    def to2d(a):
        return jnp.zeros((n_pad,), jnp.float32).at[:n].set(a).reshape(
            n_pad // LANES, LANES)

    def body(i, carry):
        image, alb, nrm = carry
        iteration = start_iteration + i
        ikey = rng_mod.iteration_key(base_key, iteration)
        U = iteration_uniforms(options, ikey, iteration, 4, n)
        o, d = generate_camera_rays(camera, meta.resolution, options, U)
        sc = (seed + iteration).reshape(1)
        outs = call(sc, face_buf,
                    to2d(o.x), to2d(o.y), to2d(o.z),
                    to2d(d.x), to2d(d.y), to2d(d.z))
        flat = [a.reshape(-1)[:n] for a in outs]
        color, a, nn = Vec3(*flat[:3]), Vec3(*flat[3:6]), Vec3(*flat[6:9])
        image = Vec3(image.x + color.x, image.y + color.y, image.z + color.z)
        first = iteration == 1
        alb = v3.where(jnp.full((n,), first), a, alb)
        nrm = v3.where(jnp.full((n,), first), nn, nrm)
        return (image, alb, nrm)

    return lax.fori_loop(0, num_iters, body, (image, albedo, normal))
