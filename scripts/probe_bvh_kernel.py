"""Bisect the Mosaic crash in the BVH mesh tier.

P1: mesh_cluster_hit alone, real 183-cluster scene, (8,128) rays.
P2: same, clusters truncated to 4.
P3: bvh_scene_hit (adds primitives + set_mat merge).
P4: full sub-block concat (4x (8,128) -> (32,128)).

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_bvh_kernel.py
"""

import dataclasses

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mygpuraytracer_tpu.ops.trace import bvh_scene_hit, mesh_cluster_hit
from mygpuraytracer_tpu.ops.vec3 import Vec3
from mygpuraytracer_tpu.scene import load_scene
from mygpuraytracer_tpu.scene.device_scene import build_device_scene

scene = load_scene("scenes/cornellShip.txt")
scene.set_resolution(8, 8)
DEV, META = build_device_scene(scene, 128)
META_SMALL = dataclasses.replace(META, mesh_clusters=META.mesh_clusters[:4])

rngd = np.random.default_rng(0)


def rays(shape):
    o = Vec3(*(jnp.asarray(rngd.uniform(-4, 9, shape).astype(np.float32))
               for _ in range(3)))
    d = Vec3(*(jnp.asarray(rngd.normal(size=shape).astype(np.float32))
               for _ in range(3)))
    return o, d


def probe(name, kernel, shape):
    o, d = rays(shape)
    try:
        out = jax.jit(
            lambda fp, *a: pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct(shape, jnp.float32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 7,
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(fp, *a)
        )(DEV.face_plane, o.x, o.y, o.z, d.x, d.y, d.z)
        print(name, "OK", float(np.asarray(out).sum()), flush=True)
    except Exception as e:
        print(name, "FAILED:", type(e).__name__, str(e)[:200], flush=True)


def k_mch(meta):
    def kernel(fp, ox, oy, oz, dx, dy, dz, out):
        o = Vec3(ox[:, :], oy[:, :], oz[:, :])
        d = Vec3(dx[:, :], dy[:, :], dz[:, :])
        t_cap = jnp.full(o.x.shape, 100.0, jnp.float32)
        win, t, fn, g, _ = mesh_cluster_hit(meta, fp, o, d, t_cap)
        out[:, :] = jnp.where(win, t, -1.0) + fn.x * 1e-6 + g * 1e-9

    return kernel


def k_bsh(meta, sub):
    def kernel(fp, ox, oy, oz, dx, dy, dz, out):
        o = Vec3(ox[:, :], oy[:, :], oz[:, :])
        d = Vec3(dx[:, :], dy[:, :], dz[:, :])
        parts = []
        R = o.x.shape[0]
        for s in range(0, R, sub):
            e = s + sub
            parts.append(
                bvh_scene_hit(
                    meta, fp,
                    Vec3(o.x[s:e], o.y[s:e], o.z[s:e]),
                    Vec3(d.x[s:e], d.y[s:e], d.z[s:e]),
                )
            )
        h = jax.tree.map(lambda *xs: jnp.concatenate(xs, axis=0), *parts)
        out[:, :] = jnp.where(h.hit, h.t, -1.0) + h.emit * 1e-6

    return kernel


if __name__ == "__main__":
    print("devices:", jax.devices(), "clusters:", len(META.mesh_clusters), flush=True)
    probe("P2 mch 4 clusters (8,128)", k_mch(META_SMALL), (8, 128))
    probe("P1 mch 183 clusters (8,128)", k_mch(META), (8, 128))
    probe("P3 bvh_scene_hit 183 (8,128)", k_bsh(META, 8), (8, 128))
    probe("P4 full concat (32,128)", k_bsh(META, 8), (32, 128))
    print("ALLDONE", flush=True)
