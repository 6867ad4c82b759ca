"""Split fixed dispatch latency from real compute through the axon tunnel.

  T  trivial jit (x+1 on 8 floats)       — pure dispatch+sync latency
  S1 shipOnly step_many(1)               — 1 iteration per dispatch
  S8 shipOnly step_many(8)               — 8 iterations per dispatch
  P8 same with rng='pallas'              — hardware PRNG vs threefry

per-iteration cost = (S8 - fixed)/8 etc.; if S1 and S8/8 diverge, the
fixed dispatch cost is significant at this scale.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_dispatch.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from mygpuraytracer_tpu.config import RenderOptions
from mygpuraytracer_tpu.render import Renderer
from mygpuraytracer_tpu.scene import load_scene


def main():
    f = jax.jit(lambda x: x + 1)
    x = jnp.zeros((8,), jnp.float32)
    np.asarray(f(x))
    t0 = time.perf_counter()
    reps = 20
    for _ in range(reps):
        x = f(x)
        np.asarray(x)
    print(f"T  trivial dispatch: {(time.perf_counter()-t0)/reps*1e3:.2f} ms",
          flush=True)

    for tag, opts, batch in (
        ("S1 threefry b1", {}, 1),
        ("S8 threefry b8", {}, 8),
        ("P8 pallas   b8", {"rng": "pallas"}, 8),
        ("P1 pallas   b1", {"rng": "pallas"}, 1),
    ):
        scene = load_scene("scenes/shipOnly.txt")
        scene.set_resolution(256, 256)
        r = Renderer(scene, RenderOptions(megakernel=False, **opts), seed=0)
        r.step_many(batch)
        np.asarray(r.image.x[:8])
        t0 = time.perf_counter()
        n = 0
        while time.perf_counter() - t0 < 6.0:
            r.step_many(batch)
            np.asarray(r.image.x[:8])
            n += batch
        dt = (time.perf_counter() - t0) / n
        print(f"{tag}: {dt*1e3:7.1f} ms/iter "
              f"({256*256/dt/1e6:.3f} Msam/s, mean {float(np.asarray(r.image.x).mean()):.3f})",
              flush=True)


if __name__ == "__main__":
    main()
