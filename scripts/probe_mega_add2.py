"""Round-2 forward-bisect (all single features passed in probe_mega_add):

    bounce0   unguarded scene_hit (cluster lax.conds NOT nested in the
              any-alive cond) directly in the iteration-fori body — the real
              megakernel's bounce-0 shape
    nineout   9 blocked inputs + 9 blocked outputs with a grid (the real
              kernel's I/O arity)
    camvec    (14,)-element SMEM input read at scalar indices

Run: PYTHONPATH=/root/repo:/root/.axon_site \
        python scripts/probe_mega_add2.py <variant>
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


def common_body(fp, state0):
    def bounce(s):
        h = scene_hit(fp, s.origin, s.direction)
        return shade_soa(META, None, s, h, uni(), uni(), uni())

    def guarded(i, s):
        return lax.cond(jnp.any(s.remaining > 0), bounce, lambda x: x, s)

    def iteration(it, acc):
        if VARIANT == "bounce0":
            s = bounce(state0)  # unguarded first bounce (megakernel:158-163)
            s = lax.fori_loop(1, 8, guarded, s)
        else:
            s = lax.fori_loop(1, 8, guarded, state0)
        return acc + s.color.x * 1e-3

    return iteration


def run():
    o = Vec3(*(jnp.asarray(rngd.uniform(-4, 9, SHAPE).astype(np.float32))
               for _ in range(3)))
    d = Vec3(*(jnp.asarray(rngd.normal(size=SHAPE).astype(np.float32))
               for _ in range(3)))
    cam = jnp.arange(14, dtype=jnp.float32)

    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)

    if VARIANT == "nineout":
        spec = pl.BlockSpec((SHAPE[0], SHAPE[1]), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)

        def kernel(fp, *refs):
            pltpu.prng_seed(9)
            ins, outs = refs[:9], refs[9:]
            o0 = Vec3(ins[0][:, :], ins[1][:, :], ins[2][:, :])
            d0 = Vec3(ins[3][:, :], ins[4][:, :], ins[5][:, :])
            ones = jnp.ones(SHAPE, jnp.float32)
            state0 = PathStateSoA(origin=o0, direction=d0,
                                  color=Vec3(ones, ones, ones),
                                  remaining=jnp.full(SHAPE, 8, jnp.int32))
            acc = lax.fori_loop(0, 2, common_body(fp, state0),
                                jnp.zeros(SHAPE, jnp.float32))
            outs[0][:, :] = acc
            for k in range(1, 9):
                outs[k][:, :] = ins[k][:, :] + acc * 0.0

        ins = [o.x, o.y, o.z, d.x, d.y, d.z] + [
            jnp.zeros(SHAPE, jnp.float32)] * 3
        t0 = time.perf_counter()
        outs = jax.jit(lambda fp, *a: pl.pallas_call(
            kernel,
            grid=(1,),
            in_specs=[vmem] + [spec] * 9,
            out_specs=[spec] * 9,
            out_shape=[jax.ShapeDtypeStruct(SHAPE, jnp.float32)] * 9,
        )(fp, *a))(DEV.face_plane, *ins)
        s = float(np.asarray(outs[0]).sum())
    else:
        def kernel(cam_ref, fp, ox, oy, oz, dx, dy, dz, out):
            pltpu.prng_seed(9)
            o0 = Vec3(ox[:, :], oy[:, :], oz[:, :])
            d0 = Vec3(dx[:, :], dy[:, :], dz[:, :])
            if VARIANT == "camvec":
                o0 = Vec3(o0.x + cam_ref[12] * 0.0, o0.y + cam_ref[13] * 0.0,
                          o0.z + cam_ref[0] * 0.0)
            ones = jnp.ones(SHAPE, jnp.float32)
            state0 = PathStateSoA(origin=o0, direction=d0,
                                  color=Vec3(ones, ones, ones),
                                  remaining=jnp.full(SHAPE, 8, jnp.int32))
            out[:, :] = lax.fori_loop(0, 2, common_body(fp, state0),
                                      jnp.zeros(SHAPE, jnp.float32))

        t0 = time.perf_counter()
        out = jax.jit(lambda cam, fp, *a: pl.pallas_call(
            kernel,
            in_specs=[smem] + [vmem] * 7,
            out_specs=vmem,
            out_shape=jax.ShapeDtypeStruct(SHAPE, jnp.float32),
        )(cam, fp, *a))(cam, DEV.face_plane, o.x, o.y, o.z, d.x, d.y, d.z)
        s = float(np.asarray(out).sum())
    print(f"{VARIANT} OK sum={s:.3f} {time.perf_counter()-t0:.0f}s",
          flush=True)


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    run()
