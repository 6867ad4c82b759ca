import sys, time
sys.path.insert(0, '/root/repo')
import numpy as np
from mygpuraytracer_tpu.scene.builtin import cornell_box
from mygpuraytracer_tpu.render import Renderer
from mygpuraytracer_tpu.config import RenderOptions

r = Renderer(cornell_box(), RenderOptions(megakernel=True), seed=0)
t0=time.time(); r.step_many(4); np.asarray(r.image.x[:4]); print(f'compile {time.time()-t0:.0f}s', flush=True)
t0=time.time(); r.step_many(256); np.asarray(r.image.x[:4]); dt=time.time()-t0
print(f'batched megakernel: {256/dt:.1f} iters/s, {800*800*256/dt/1e6:.1f} Msamples/s', flush=True)
print(f'mean/iter {float(np.asarray(r.image.x).mean())/r.iteration:.4f} (expect 0.5757)', flush=True)
# batching independence: 16 in one batch == 8+8
r2 = Renderer(cornell_box(), RenderOptions(megakernel=True), seed=0)
r2.step_many(16)
r3 = Renderer(cornell_box(), RenderOptions(megakernel=True), seed=0)
r3.step_many(8); r3.step_many(8)
a, b = np.asarray(r2.image.x), np.asarray(r3.image.x)
print('batching-independent:', np.allclose(a, b, atol=1e-5), flush=True)
