"""Bisect the megakernel+BVH Mosaic crash by adding one structural layer at
a time around bvh_scene_hit (which compiles standalone).

P5: bounce fori + any-alive cond around scene_hit.
P6: P5 + outer iterations-fori + hardware PRNG.
P7: P6 + shade_soa (the full trace_one shape, minus raygen/aliasing).

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_mega_bisect.py
"""

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mygpuraytracer_tpu.ops.trace import bvh_scene_hit
from mygpuraytracer_tpu.ops.vec3 import Vec3
from mygpuraytracer_tpu.render.shade import PathStateSoA, shade_soa
from mygpuraytracer_tpu.scene import load_scene
from mygpuraytracer_tpu.scene.device_scene import build_device_scene

scene = load_scene("scenes/cornellShip.txt")
scene.set_resolution(8, 8)
DEV, META = build_device_scene(scene, 128)

rngd = np.random.default_rng(0)
SHAPE = (32, 128)


def scene_hit(fp, o, d):
    parts = []
    for s in range(0, SHAPE[0], 8):
        e = s + 8
        parts.append(
            bvh_scene_hit(
                META, fp,
                Vec3(o.x[s:e], o.y[s:e], o.z[s:e]),
                Vec3(d.x[s:e], d.y[s:e], d.z[s:e]),
            )
        )
    return jax.tree.map(lambda *xs: jnp.concatenate(xs, axis=0), *parts)


def probe(name, kernel):
    o = Vec3(*(jnp.asarray(rngd.uniform(-4, 9, SHAPE).astype(np.float32))
               for _ in range(3)))
    d = Vec3(*(jnp.asarray(rngd.normal(size=SHAPE).astype(np.float32))
               for _ in range(3)))
    try:
        out = jax.jit(
            lambda fp, *a: pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct(SHAPE, jnp.float32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 7,
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(fp, *a)
        )(DEV.face_plane, o.x, o.y, o.z, d.x, d.y, d.z)
        print(name, "OK", float(np.asarray(out).sum()), flush=True)
    except Exception as e:
        print(name, "FAILED:", type(e).__name__, str(e)[:160], flush=True)


def k_p5(fp, ox, oy, oz, dx, dy, dz, out):
    o = Vec3(ox[:, :], oy[:, :], oz[:, :])
    d = Vec3(dx[:, :], dy[:, :], dz[:, :])

    def bounce(c):
        t, o, d = c
        h = scene_hit(fp, o, d)
        t = jnp.minimum(t, h.t)
        # perturb rays a bit so the loop isn't trivial
        o = Vec3(o.x + 0.01, o.y, o.z)
        return (t, o, d)

    def guarded(i, c):
        return lax.cond(jnp.any(c[0] > 0), bounce, lambda x: x, c)

    t0 = jnp.full(SHAPE, 1e30, jnp.float32)
    t, _, _ = lax.fori_loop(1, 8, guarded, (t0, o, d))
    out[:, :] = jnp.where(t < 1e29, t, -1.0)


def k_p6(fp, ox, oy, oz, dx, dy, dz, out):
    pltpu.prng_seed(7)
    o0 = Vec3(ox[:, :], oy[:, :], oz[:, :])
    d0 = Vec3(dx[:, :], dy[:, :], dz[:, :])

    def one(c):
        t, o, d = c
        h = scene_hit(fp, o, d)
        bits = pltpu.bitcast(pltpu.prng_random_bits(SHAPE), jnp.uint32)
        jitter = (pltpu.bitcast(bits >> 8, jnp.int32)).astype(jnp.float32) * (
            1.0 / (1 << 24))
        return (jnp.minimum(t, h.t + jitter * 1e-6), o, d)

    def guarded(i, c):
        return lax.cond(jnp.any(c[0] > 0), one, lambda x: x, c)

    def iteration(it, acc):
        t0 = jnp.full(SHAPE, 1e30, jnp.float32)
        t, _, _ = lax.fori_loop(1, 8, guarded, (t0, o0, d0))
        return acc + t * 1e-3

    out[:, :] = lax.fori_loop(0, 2, iteration, jnp.zeros(SHAPE, jnp.float32))


def k_p7(fp, ox, oy, oz, dx, dy, dz, out):
    pltpu.prng_seed(9)

    def uni():
        bits = pltpu.bitcast(pltpu.prng_random_bits(SHAPE), jnp.uint32)
        return (pltpu.bitcast(bits >> 8, jnp.int32)).astype(jnp.float32) * (
            1.0 / (1 << 24))

    o0 = Vec3(ox[:, :], oy[:, :], oz[:, :])
    d0 = Vec3(dx[:, :], dy[:, :], dz[:, :])
    ones = jnp.ones(SHAPE, jnp.float32)
    state0 = PathStateSoA(
        origin=o0, direction=d0, color=Vec3(ones, ones, ones),
        remaining=jnp.full(SHAPE, 8, jnp.int32),
    )

    def bounce(s):
        h = scene_hit(fp, s.origin, s.direction)
        return shade_soa(META, None, s, h, uni(), uni(), uni())

    def guarded(i, s):
        return lax.cond(jnp.any(s.remaining > 0), bounce, lambda x: x, s)

    def iteration(it, acc):
        s = lax.fori_loop(1, 8, guarded, state0)
        return acc + s.color.x * 1e-3

    out[:, :] = lax.fori_loop(0, 2, iteration, jnp.zeros(SHAPE, jnp.float32))


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    probe("P5 bounce-fori + cond", k_p5)
    probe("P6 + iter-fori + prng", k_p6)
    probe("P7 + shade_soa", k_p7)
    print("ALLDONE", flush=True)
