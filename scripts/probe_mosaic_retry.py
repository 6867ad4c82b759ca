"""Chipless retry of the Mosaic CHECK blocking the fused iteration megakernel
with the BVH tier (array.h:480; bisection in docs/MESH_TIERS.md).

The crashing combination is no longer reachable through the Renderer
(supports_megakernel routes BVH scenes to the wavefront / bounce kernel), so
this probes `megakernel_accumulate` directly on a cluster-BVH scene via the
AOT compiler — compile-only, never touches the chip. Cheap to re-run on any
toolchain bump; if it ever prints MOSAIC FIXED, the fully fused form would
remove the bounce megakernel's remaining per-iteration XLA raygen +
accumulate traffic.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_mosaic_retry.py
(run it in a fresh process AFTER banked work: a compiler-side crash can
wedge the shared worker for ~4 min.)
"""

import time

import jax
import jax.numpy as jnp

from mygpuraytracer_tpu.config import RenderOptions
from mygpuraytracer_tpu.ops.vec3 import Vec3
from mygpuraytracer_tpu.render.megakernel import _uses_bvh, megakernel_accumulate
from mygpuraytracer_tpu.scene import load_scene
from mygpuraytracer_tpu.scene.device_scene import build_device_scene

if __name__ == "__main__":
    assert jax.default_backend() != "cpu", (
        "CPU backend — the probe must compile for TPU "
        "(PYTHONPATH must include /root/.axon_site)")
    scene = load_scene("scenes/shipOnly.txt")
    scene.set_resolution(64, 64)
    dev, meta = build_device_scene(scene, 128)
    assert _uses_bvh(meta), "shipOnly must take the cluster-BVH tier"
    options = RenderOptions(megakernel=True)

    n = 64 * 64
    z = lambda: jnp.zeros((n,), jnp.float32)
    args = (
        meta, options, dev.camera, dev.face_plane,
        Vec3(z(), z(), z()), Vec3(z(), z(), z()), Vec3(z(), z(), z()),
        jnp.int32(1), jnp.int32(2), jax.random.PRNGKey(0),
    )
    t0 = time.time()
    try:
        # megakernel_accumulate is already jitted (static meta/options);
        # .lower().compile() AOT-builds the TPU program without running it.
        megakernel_accumulate.lower(*args).compile()
    except Exception as e:
        print(f"MOSAIC STILL BROKEN ({time.time()-t0:.0f}s): "
              f"{type(e).__name__}: {str(e)[:300]}", flush=True)
    else:
        print(f"MOSAIC FIXED — fused megakernel+BVH compiles "
              f"({time.time()-t0:.0f}s)", flush=True)
    print("ALLDONE", flush=True)
