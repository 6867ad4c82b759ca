import sys; sys.path.insert(0, '/root/repo')
import numpy as np
from mygpuraytracer_tpu.scene.builtin import cornell_box
from mygpuraytracer_tpu.render import Renderer
from mygpuraytracer_tpu.config import RenderOptions
import jax.numpy as jnp
from mygpuraytracer_tpu.ops.prng import pallas_uniforms
u = np.asarray(pallas_uniforms(jnp.int32(7), 28, 100_000))
print('uniforms:', u.min().round(6), u.max().round(6), u.mean().round(4), flush=True)
r = Renderer(cornell_box(), RenderOptions(rng='pallas'), seed=0)
r.step_many(16)
print('pallas render mean/iter:', round(float(np.asarray(r.image.x).mean())/16, 4), '(expect ~0.576)', flush=True)
