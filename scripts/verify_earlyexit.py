import sys, time
sys.path.insert(0, '/root/repo')
import numpy as np
from mygpuraytracer_tpu.scene.builtin import cornell_box, emissive_sphere
from mygpuraytracer_tpu.render import Renderer
from mygpuraytracer_tpu.config import RenderOptions

for name, maker, expect in (('cornell', cornell_box, 0.576), ('sphere', emissive_sphere, None)):
    r = Renderer(maker(), RenderOptions(megakernel=True), seed=0)
    t0=time.time(); r.step_many(4); np.asarray(r.image.x[:4]); print(f'{name} compile {time.time()-t0:.0f}s', flush=True)
    t0=time.time(); r.step_many(256); np.asarray(r.image.x[:4]); dt=time.time()-t0
    m = float(np.asarray(r.image.x).mean())/r.iteration
    print(f'{name}: {800*800*256/dt/1e6:.1f} Msamples/s, mean {m:.4f}' + (f' (expect ~{expect})' if expect else ''), flush=True)
