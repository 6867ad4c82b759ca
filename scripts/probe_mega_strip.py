"""Reverse-bisect the megakernel+BVH Mosaic CHECK failure
(`limits[i] <= dim(i) (2 vs 1)`): start from the full megakernel at 64x64
(known crash) and strip one feature at a time. probe_mega_bisect.py showed
BVH + bounce-cond + iter-fori + PRNG + shade all compile standalone, so the
trigger is in the delta: raygen/SMEM camera, SMEM iter scalars, the 9-buffer
aliasing, or the grid.

One variant per process (the failure is a SIGABRT in the compiler):
    PYTHONPATH=/root/repo:/root/.axon_site \
        python scripts/probe_mega_strip.py <variant>

Variants:
    full      exact megakernel_accumulate call (sanity: expect crash)
    noalias   input_output_aliases removed
    fixray    raygen replaced by constant rays (cam SMEM still passed)
    constseed prng_seed(7) instead of the (seed,iter,pid) mix
    nogrid    grid=(1,) with the whole image as one block (ROWS=32 only
              covers 4096 px, so run 64x64 = exactly one tile anyway)
    staticiter fori bound = python constant 4 instead of niter_ref[0]
"""

import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mygpuraytracer_tpu.ops.vec3 import Vec3
from mygpuraytracer_tpu.render import megakernel as mk
from mygpuraytracer_tpu.config import RenderOptions
from mygpuraytracer_tpu.scene import load_scene
from mygpuraytracer_tpu.scene.device_scene import build_device_scene

VARIANT = sys.argv[1]

scene = load_scene("scenes/cornellShip.txt")
scene.set_resolution(64, 64)
DEV, META = build_device_scene(scene, 128)
OPTS = RenderOptions(megakernel=True)

ROWS, LANES = mk.ROWS, mk.LANES
shape = (ROWS, LANES)
width, height = META.resolution
n = width * height
n_pad = mk._pad_to_tiles(n)
grid = (n_pad // (ROWS * LANES),)


def make_kernel():
    base_kernel = mk._make_kernel(META, OPTS)
    if VARIANT in ("full", "noalias", "nogrid"):
        return base_kernel

    # patched kernels re-implement the wrapper with one feature stripped
    trace_depth = META.trace_depth

    def kernel(seed_ref, start_ref, niter_ref, cam_ref, fp_ref,
               in_r, in_g, in_b, in_ar, in_ag, in_ab, in_nr, in_ng, in_nb,
               r_ref, g_ref, b_ref, ar_ref, ag_ref, ab_ref, nr_ref, ng_ref,
               nb_ref):
        pid = pl.program_id(0)
        from mygpuraytracer_tpu.ops.trace import bvh_scene_hit
        from mygpuraytracer_tpu.render.shade import PathStateSoA, shade_soa

        def scene_hit(o, d):
            parts = []
            for s in range(0, ROWS, mk.MESH_SUB_ROWS):
                e = s + mk.MESH_SUB_ROWS
                parts.append(bvh_scene_hit(
                    META, fp_ref,
                    Vec3(o.x[s:e], o.y[s:e], o.z[s:e]),
                    Vec3(d.x[s:e], d.y[s:e], d.z[s:e])))
            return jax.tree.map(lambda *xs: jnp.concatenate(xs, 0), *parts)

        def raygen():
            if VARIANT == "fixray":
                o = Vec3(jnp.full(shape, 0.0), jnp.full(shape, 5.0),
                         jnp.full(shape, 10.0))
                # spread directions a bit with iota so clusters differ
                t = jax.lax.broadcasted_iota(jnp.int32, shape, 1).astype(
                    jnp.float32) / LANES - 0.5
                import mygpuraytracer_tpu.ops.vec3 as v3
                d = v3.normalize(Vec3(t, -0.2 + 0 * t, -1.0 + 0 * t))
                return o, d
            # real raygen (megakernel lines 105-130, sans AA/DoF branches)
            import mygpuraytracer_tpu.ops.vec3 as v3
            base = pid * (ROWS * LANES)
            row = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
            colm = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
            idx = base + row * LANES + colm
            x = (idx % width).astype(jnp.float32)
            y = (idx // width).astype(jnp.float32)
            x = x + (mk._uniform(shape) - 0.5)
            y = y + (mk._uniform(shape) - 0.5)
            sx = cam_ref[12] * (x - width * 0.5)
            sy = cam_ref[13] * (y - height * 0.5)
            d = v3.normalize(Vec3(
                cam_ref[3] - cam_ref[9] * sx - cam_ref[6] * sy,
                cam_ref[4] - cam_ref[10] * sx - cam_ref[7] * sy,
                cam_ref[5] - cam_ref[11] * sx - cam_ref[8] * sy))
            o = Vec3(jnp.full(shape, 0.0) + cam_ref[0],
                     jnp.full(shape, 0.0) + cam_ref[1],
                     jnp.full(shape, 0.0) + cam_ref[2])
            return o, d

        def body(i, acc):
            img = acc
            iteration = start_ref[0] + i
            if VARIANT == "constseed":
                pltpu.prng_seed(7)
            else:
                pltpu.prng_seed(
                    (seed_ref[0] + iteration) * jnp.int32(mk._MIX) + pid)
            o, d = raygen()
            ones = jnp.ones(shape, jnp.float32)
            state = PathStateSoA(
                origin=o, direction=d, color=Vec3(ones, ones, ones),
                remaining=jnp.full(shape, trace_depth, jnp.int32))

            def bounce(s):
                h = scene_hit(s.origin, s.direction)
                return shade_soa(META, None, s, h, mk._uniform(shape),
                                 mk._uniform(shape), mk._uniform(shape))

            def guarded(s):
                return lax.cond(jnp.any(s.remaining > 0), bounce,
                                lambda x: x, s)

            state = bounce(state)
            state = lax.fori_loop(1, trace_depth, lambda i, s: guarded(s),
                                  state)
            return Vec3(img.x + state.color.x, img.y + state.color.y,
                        img.z + state.color.z)

        img0 = Vec3(in_r[:, :], in_g[:, :], in_b[:, :])
        bound = 4 if VARIANT == "staticiter" else niter_ref[0]
        img = lax.fori_loop(0, bound, body, img0)
        r_ref[:, :] = img.x
        g_ref[:, :] = img.y
        b_ref[:, :] = img.z
        ar_ref[:, :] = in_ar[:, :]
        ag_ref[:, :] = in_ag[:, :]
        ab_ref[:, :] = in_ab[:, :]
        nr_ref[:, :] = in_nr[:, :]
        ng_ref[:, :] = in_ng[:, :]
        nb_ref[:, :] = in_nb[:, :]

    return kernel


def run():
    cam = DEV.camera
    cam_vec = jnp.concatenate(
        [cam.position, cam.view, cam.up, cam.right, cam.pixel_length]
    ).astype(jnp.float32)
    seed = jnp.array([1234], jnp.int32)
    start = jnp.array([1], jnp.int32)
    niter = jnp.array([4], jnp.int32)

    def to2d(a):
        return jnp.zeros((n_pad,), jnp.float32).at[:n].set(a).reshape(
            n_pad // LANES, LANES)

    zeros = [to2d(jnp.zeros((n,), jnp.float32)) for _ in range(9)]
    spec = pl.BlockSpec((ROWS, LANES), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    vmem_full = pl.BlockSpec(memory_space=pltpu.VMEM)
    out_shape = [jax.ShapeDtypeStruct((n_pad // LANES, LANES), jnp.float32)] * 9

    kwargs = dict(
        grid=grid,
        in_specs=[smem, smem, smem, smem, vmem_full] + [spec] * 9,
        out_specs=[spec] * 9,
        out_shape=out_shape,
    )
    if VARIANT != "noalias":
        kwargs["input_output_aliases"] = {5 + k: k for k in range(9)}
    if VARIANT == "nogrid":
        kwargs["grid"] = (1,)
        kwargs["in_specs"] = [smem] * 4 + [vmem_full] + [vmem_full] * 9
        kwargs["out_specs"] = [vmem_full] * 9

    t0 = time.perf_counter()
    outs = pl.pallas_call(make_kernel(), **kwargs)(
        seed, start, niter, cam_vec, DEV.face_plane, *zeros)
    s = float(np.asarray(outs[0]).sum())
    print(f"{VARIANT} OK sum={s:.3f} {time.perf_counter()-t0:.0f}s",
          flush=True)


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    run()
