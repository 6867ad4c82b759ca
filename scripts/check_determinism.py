import sys, time
sys.path.insert(0, '/root/repo')
import numpy as np
from mygpuraytracer_tpu.scene.builtin import cornell_box
from mygpuraytracer_tpu.render import Renderer
from mygpuraytracer_tpu.config import RenderOptions

means = []
for run in range(3):
    r = Renderer(cornell_box(), RenderOptions(), seed=0)
    r.step_many(16)
    img = np.asarray(r.image.x)
    means.append(img.mean() / 16)
    print(f'run {run}: mean {means[-1]:.4f}', flush=True)

r = Renderer(cornell_box(), RenderOptions(), seed=0)
r.step_many(8); r.step_many(8)
img2 = np.asarray(r.image.x)
print(f'split 8+8: mean {img2.mean()/16:.4f}', flush=True)

# per-step accumulation check: mean should grow ~linearly with iterations
r = Renderer(cornell_box(), RenderOptions(), seed=0)
for k in range(4):
    r.step_many(4)
    print(f'after {r.iteration}: raw mean {float(np.asarray(r.image.x).mean()):.4f}', flush=True)
