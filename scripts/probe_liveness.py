"""Lane-liveness-per-bounce probe (CPU) — sizes the 'ray compaction' lever.

docs/MESH_TIERS.md lists "panel/ray compaction" as a remaining mesh-tier
lever; ops/compaction.py's masked-lane rationale ("a gather/scatter pass per
bounce costs more HBM traffic than it saves in a closed scene") was argued,
not measured. This probe measures the actual alive fraction after each
bounce for the mesh scenes: if liveness stays high the lever is closed with
data; if it collapses, compacting mesh-bound lanes before the cluster-BVH
kernel is worth a hardware prototype.

Reference analog: the compacted wavefront size printed by pathtrace.cu's
stream compaction (apps/src/pathtrace.cu:649-651).

Run: PYTHONPATH=/root/repo python scripts/probe_liveness.py  (CPU, ~1 min)
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from mygpuraytracer_tpu.config import RenderOptions
from mygpuraytracer_tpu.ops import rng
from mygpuraytracer_tpu.ops.prng import iteration_uniforms
from mygpuraytracer_tpu.ops.trace import intersect_soa
from mygpuraytracer_tpu.ops.vec3 import Vec3
from mygpuraytracer_tpu.render.camera import generate_camera_rays
from mygpuraytracer_tpu.render.pathtrace import num_rng_streams
from mygpuraytracer_tpu.render.shade import PathStateSoA, shade_soa
from mygpuraytracer_tpu.scene import build_device_scene, load_scene

RES = 64  # CPU XLA fallback is an O(rays x faces) loop — keep it small
ITERS = 2  # average over a couple of iterations (different RNG streams)


def probe(scene_path):
    scene = load_scene(scene_path)
    scene.set_resolution(RES, RES)
    dev, meta = build_device_scene(scene)
    options = RenderOptions()
    n = RES * RES
    depth = meta.trace_depth

    @jax.jit
    def one_iter(iteration):
        ikey = rng.iteration_key(jax.random.key(0), iteration)
        U = iteration_uniforms(options, ikey, iteration, num_rng_streams(depth), n)
        o, d = generate_camera_rays(dev.camera, meta.resolution, options, U)
        ones = jnp.ones((n,), jnp.float32)
        state = PathStateSoA(
            origin=o, direction=d, color=Vec3(ones, ones, ones),
            remaining=jnp.full((n,), depth, jnp.int32),
        )
        fracs = []
        for b in range(depth):
            h = intersect_soa(meta, dev, state.origin, state.direction)
            state = shade_soa(
                meta, dev, state, h, U[4 + 3 * b], U[5 + 3 * b], U[6 + 3 * b]
            )
            fracs.append(jnp.mean((state.remaining > 0).astype(jnp.float32)))
        return jnp.stack(fracs)

    acc = np.zeros(depth)
    for it in range(1, ITERS + 1):
        acc += np.asarray(one_iter(jnp.int32(it)))
    acc /= ITERS
    name = os.path.basename(scene_path)
    print(f"{name}: depth={depth} alive-after-bounce " +
          " ".join(f"{f:.3f}" for f in acc))
    # mesh-kernel work is proportional to the alive fraction entering each
    # bounce (bounce 0 always runs on 100%)
    entering = np.concatenate([[1.0], acc[:-1]])
    print(f"  mean alive entering a bounce: {entering.mean():.3f} "
          f"(compaction ceiling: {1.0 / entering.mean():.2f}x)")


if __name__ == "__main__":
    for s in ["scenes/shipOnly.txt", "scenes/shipTexOnly.txt",
              "scenes/cornellShipReal.txt", "scenes/builtin_cornell.txt"]:
        probe(s)
    print("ALLDONE")
