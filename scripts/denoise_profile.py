import sys, time
sys.path.insert(0, '/root/repo')
import numpy as np, jax, jax.numpy as jnp
from mygpuraytracer_tpu.denoise.unet import unet_apply, init_unet_params

h, w = 720, 1280
params = jax.tree.map(lambda a: a.astype(jnp.bfloat16), init_unet_params(6))
fn = jax.jit(lambda p, x: unet_apply(p, x)[0, 0, 0, 0])
x = jnp.ones((1, h, w, 6), jnp.bfloat16)
t0=time.time(); r = fn(params, x); _=np.asarray(r); print(f'unet compile+1: {time.time()-t0:.1f}s', flush=True)
t0=time.time()
for _ in range(6): r = fn(params, x)
_=np.asarray(r)
print(f'unet only ({w}x{h} bf16): {(time.time()-t0)/6*1000:.1f} ms', flush=True)

big = np.ones((h, w, 6), np.float32)
t0=time.time()
for _ in range(6): y = jnp.asarray(big); _=np.asarray(y[:1,:1])
print(f'h2d 22MB: {(time.time()-t0)/6*1000:.1f} ms', flush=True)
