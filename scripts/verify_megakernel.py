import sys, time
sys.path.insert(0, '/root/repo')
import numpy as np
from mygpuraytracer_tpu.scene.builtin import cornell_box
from mygpuraytracer_tpu.render import Renderer
from mygpuraytracer_tpu.config import RenderOptions

# ground truth from the wavefront threefry path (CPU-verified 0.5757)
r = Renderer(cornell_box(), RenderOptions(megakernel=True), seed=0)
t0 = time.time(); r.step_many(4); np.asarray(r.image.x[:4])
print(f'compile: {time.time()-t0:.0f}s', flush=True)
t0 = time.time(); r.step_many(64); np.asarray(r.image.x[:4])
dt = time.time()-t0
print(f'megakernel: {64/dt:.1f} iters/s, {800*800*64/dt/1e6:.1f} Msamples/s', flush=True)
img = np.asarray(r.image.x)
print(f'mean/iter: {img.mean()/r.iteration:.4f} (expect ~0.576)', flush=True)
alb = np.asarray(r.albedo.x)
print(f'albedo mean: {alb.mean():.4f} finite {np.isfinite(img).all()}', flush=True)
