"""Forward-bisect: start from probe_mega_bisect's P7 (compiles+runs) and add
ONE megakernel feature per variant. All probe_mega_strip variants crash, so
the trigger is in their common delta vs P7:

    seedloop   prng_seed() inside the iteration fori body (P7 seeds once)
    grid       grid=(1,) + blocked in/out specs (P7 has no grid)
    smem       SMEM scalar input used as the fori bound
    seedsmem   seedloop, but the seed value comes from an SMEM scalar

Run one variant per process:
    PYTHONPATH=/root/repo:/root/.axon_site \
        python scripts/probe_mega_add.py <variant>
"""

import sys
import time

sys.path.insert(0, "/root/repo")

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

VARIANT = sys.argv[1]

scene = load_scene("scenes/cornellShip.txt")
scene.set_resolution(8, 8)
DEV, META = build_device_scene(scene, 128)

rngd = np.random.default_rng(0)
SHAPE = (32, 128)


def scene_hit(fp, o, d):
    parts = []
    for s in range(0, SHAPE[0], 8):
        e = s + 8
        parts.append(bvh_scene_hit(
            META, fp,
            Vec3(o.x[s:e], o.y[s:e], o.z[s:e]),
            Vec3(d.x[s:e], d.y[s:e], d.z[s:e])))
    return jax.tree.map(lambda *xs: jnp.concatenate(xs, 0), *parts)


def uni():
    bits = pltpu.bitcast(pltpu.prng_random_bits(SHAPE), jnp.uint32)
    return (pltpu.bitcast(bits >> 8, jnp.int32)).astype(jnp.float32) * (
        1.0 / (1 << 24))


def make_kernel():
    def kernel(sc_ref, fp, ox, oy, oz, dx, dy, dz, out):
        if VARIANT not in ("seedloop", "seedsmem"):
            pltpu.prng_seed(9)

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
            if VARIANT == "seedloop":
                pltpu.prng_seed(7 + it)
            elif VARIANT == "seedsmem":
                pltpu.prng_seed((sc_ref[0] + it) * jnp.int32(-1640531535))
            s = lax.fori_loop(1, 8, guarded, state0)
            return acc + s.color.x * 1e-3

        bound = sc_ref[0] if VARIANT == "smem" else 2
        out[:, :] = lax.fori_loop(0, bound, iteration,
                                  jnp.zeros(SHAPE, jnp.float32))

    return kernel


def run():
    o = Vec3(*(jnp.asarray(rngd.uniform(-4, 9, SHAPE).astype(np.float32))
               for _ in range(3)))
    d = Vec3(*(jnp.asarray(rngd.normal(size=SHAPE).astype(np.float32))
               for _ in range(3)))
    sc = jnp.array([2], jnp.int32)

    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    if VARIANT == "grid":
        spec = pl.BlockSpec((SHAPE[0], SHAPE[1]), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
        kwargs = dict(
            grid=(1,),
            in_specs=[smem, pl.BlockSpec(memory_space=pltpu.VMEM)] + [spec] * 6,
            out_specs=spec,
            out_shape=jax.ShapeDtypeStruct(SHAPE, jnp.float32),
        )
    else:
        kwargs = dict(
            in_specs=[smem] + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 7,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(SHAPE, jnp.float32),
        )

    t0 = time.perf_counter()
    out = jax.jit(
        lambda sc, fp, *a: pl.pallas_call(make_kernel(), **kwargs)(sc, fp, *a)
    )(sc, DEV.face_plane, o.x, o.y, o.z, d.x, d.y, d.z)
    print(f"{VARIANT} OK sum={float(np.asarray(out).sum()):.3f} "
          f"{time.perf_counter()-t0:.0f}s", flush=True)


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    run()
