import sys, time
sys.path.insert(0, '/root/repo')
import numpy as np
from mygpuraytracer_tpu.scene.builtin import cornell_box
from mygpuraytracer_tpu.render import Renderer
from mygpuraytracer_tpu.config import RenderOptions

for mode in ('threefry', 'pallas'):
    s = cornell_box()
    r = Renderer(s, RenderOptions(rng=mode), seed=0)
    t0 = time.time(); r.step_many(4); np.asarray(r.image.x[:4])
    print(f'{mode}: compile {time.time()-t0:.0f}s', flush=True)
    t0 = time.time(); r.step_many(64); np.asarray(r.image.x[:4])
    dt = time.time()-t0
    print(f'{mode}: {64/dt:.1f} iters/s, {800*800*64/dt/1e6:.1f} Msamples/s, mean {float(r.image.x.mean())/r.iteration:.4f}', flush=True)
