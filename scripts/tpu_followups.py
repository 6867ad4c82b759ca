"""cornellObj megakernel verify + example render + denoise timing on TPU."""
import sys, time
sys.path.insert(0, '/root/repo')
import numpy as np
from mygpuraytracer_tpu.scene import load_scene
from mygpuraytracer_tpu.render import Renderer
from mygpuraytracer_tpu.config import RenderOptions
from mygpuraytracer_tpu.utils.png import write_png

# 1. cornellObj on the mega-faces kernel
s = load_scene('/root/reference/scenes/cornellObj.txt')
r = Renderer(s, RenderOptions(megakernel=True), seed=0)
t0=time.time(); r.step_many(4); np.asarray(r.image.x[:4]); print(f'obj compile {time.time()-t0:.0f}s', flush=True)
t0=time.time(); r.step_many(256); np.asarray(r.image.x[:4]); dt=time.time()-t0
print(f'cornellObj megakernel: {256/dt:.1f} iters/s, {800*800*256/dt/1e6:.1f} Msamples/s', flush=True)
r.step_many(1024)
img = r.beauty()
print(f'obj mean {img.mean():.4f} finite {np.isfinite(img).all()}', flush=True)
write_png('examples/cornellObj_beauty_1284spp.png', img[:, ::-1])

# 2. denoiser timing at 1920x1080 (ldr color+albedo)
from mygpuraytracer_tpu.denoise import Device
rng = np.random.default_rng(0)
dev = Device(); dev.commit()
f = dev.new_filter('RT')
color = rng.random((1080, 1920, 3)).astype(np.float32)
f.set_image('color', color)
f.set_image('albedo', rng.random((1080, 1920, 3)).astype(np.float32))
out = np.zeros((1080, 1920, 3), np.float32)
f.set_image('output', out)
f.set('inputScale', 1.0)
f.commit()
t0=time.time(); f.execute(); print(f'denoise 1920x1080 first (compile): {time.time()-t0:.1f}s', flush=True)
t0=time.time()
for _ in range(4): f.execute()
print(f'denoise 1920x1080: {(time.time()-t0)/4*1000:.1f} ms/image', flush=True)
