import time, numpy as np, jax
from mygpuraytracer_tpu.scene import load_scene
from mygpuraytracer_tpu.render import Renderer
from mygpuraytracer_tpu.config import RenderOptions

s = load_scene('/root/reference/scenes/cornell.txt')
r = Renderer(s, RenderOptions(), seed=0)
t0=time.time(); r.step_many(1); _=np.asarray(r.image.x[:8]); print('compile+1:', round(time.time()-t0,1), flush=True)
for n in (16, 64):
    t0=time.time(); r.step_many(n); _=np.asarray(r.image.x[:8]); dt=time.time()-t0
    print(f'{n} iters: {dt:.3f}s -> {n/dt:.2f} iters/s, {800*800*n/dt/1e6:.2f} Msamples/s', flush=True)
img = r.beauty(); print('mean', img.mean(), 'max', img.max())
