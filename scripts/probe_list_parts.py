"""Decompose the visit-list mesh tier's time on hardware.

  L  full mesh_list_hit, t_cap=1e9      (mask pass + kernel + visits)
  L0 full mesh_list_hit, t_cap=0        (mask pass + empty kernel)
  M  _cluster_visit_lists alone (jit)   (mask + argsort only)
  K0 kernel alone w/ zero counts        (pallas floor: loads + outputs)

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_list_parts.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

import jax
import jax.numpy as jnp

from probe_shift_kernel import camera_rays
from mygpuraytracer_tpu.ops.trace import _cluster_visit_lists, mesh_list_hit
from mygpuraytracer_tpu.ops.vec3 import Vec3
from mygpuraytracer_tpu.scene import load_scene
from mygpuraytracer_tpu.scene.device_scene import build_device_scene

RES = 256


def timeit(tag, fn, *args, reps=5):
    out = fn(*args)
    jax.tree.map(lambda a: np.asarray(a.reshape(-1)[:4]), out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
        jax.tree.map(lambda a: np.asarray(a.reshape(-1)[:4]), out)
    dt = (time.perf_counter() - t0) / reps
    print(f"{tag}: {dt*1e3:8.2f} ms/call", flush=True)
    return dt


def main():
    scene = load_scene("scenes/shipOnly.txt")
    scene.set_resolution(RES, RES)
    dev, meta = build_device_scene(scene, 128)
    o_np, d_np = camera_rays(scene, RES)
    o = Vec3(*(jnp.asarray(o_np[:, i]) for i in range(3)))
    d = Vec3(*(jnp.asarray(d_np[:, i]) for i in range(3)))
    n = o.x.shape[0]
    cap_inf = jnp.full((n,), 1e9, jnp.float32)
    cap0 = jnp.zeros((n,), jnp.float32)

    L = jax.jit(lambda tc: mesh_list_hit(meta, dev.face_plane, o, d, tc)[0])
    M = jax.jit(lambda tc: _cluster_visit_lists(meta, o, d, tc, 1024))

    timeit("L  full cap=inf ", L, cap_inf)
    timeit("L0 full cap=0   ", L, cap0)
    m = timeit("M  mask+argsort ", M, cap_inf)
    # visit stats for context
    lists, counts = M(cap_inf)
    print(f"counts: mean {np.asarray(counts).mean():.1f} "
          f"max {np.asarray(counts).max()} over {counts.shape[0]} blocks",
          flush=True)


if __name__ == "__main__":
    main()
