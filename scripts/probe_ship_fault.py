"""Bisect the ship-wavefront TPU kernel fault (384x384 crashes, 64x64 ok).

One config per process (a worker crash kills the client):
    PYTHONPATH=/root/repo:/root/.axon_site \
        python scripts/probe_ship_fault.py <res> <face_chunk> <spp> [single]

`single` uses per-iteration step() instead of the fori_loop batch.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

from mygpuraytracer_tpu.config import RenderOptions
from mygpuraytracer_tpu.render import Renderer
from mygpuraytracer_tpu.scene import load_scene

res = int(sys.argv[1])
chunk = int(sys.argv[2])
spp = int(sys.argv[3])
single = len(sys.argv) > 4 and sys.argv[4] == "single"

s = load_scene("scenes/cornellShip.txt")
s.set_resolution(res, res)
r = Renderer(s, RenderOptions(megakernel=False, face_chunk=chunk), seed=1)
t0 = time.time()
if single:
    for _ in range(spp):
        r.step()
else:
    r.step_many(spp)
print(
    f"OK res={res} chunk={chunk} spp={spp} single={single} "
    f"mean={float(np.asarray(r.image.x).mean()):.4f} {time.time()-t0:.0f}s",
    flush=True,
)
