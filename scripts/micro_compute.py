import time, numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def timeit(name, f, *args, reps=10):
    t0=time.time()
    r = f(*args); _=np.asarray(jax.tree_util.tree_leaves(r)[0]).ravel()[:1]
    c=time.time()-t0
    t0=time.time()
    for _ in range(reps): r = f(*args)
    _=np.asarray(jax.tree_util.tree_leaves(r)[0]).ravel()[:1]
    print(f'{name}: {(time.time()-t0)/reps*1000:.2f} ms (compile {c:.0f}s)', flush=True)

# 1. MXU: bf16 4096^3 matmul = 137 GFLOP
A = jnp.ones((4096,4096), jnp.bfloat16); B = jnp.ones((4096,4096), jnp.bfloat16)
@jax.jit
def mm(a,b):
    return jnp.dot(a,b, preferred_element_type=jnp.float32).astype(jnp.bfloat16)
timeit('matmul 4096^3 bf16 (137 GFLOP)', mm, A, B)

# 2. compute-heavy chain on small data: 640k f32, 200 fma rounds, one output
@jax.jit
def heavy(x):
    for _ in range(200):
        x = x * 1.000001 + 0.5
    return x
x = jnp.ones((640_000,), jnp.float32)
timeit('fma chain x200 on [640k] (128 MFLOP...)', heavy, x)

# 3. pallas VPU kernel: same fma chain inside one kernel
def k(x_ref, o_ref):
    x = x_ref[:, :]
    for _ in range(200):
        x = x * 1.000001 + 0.5
    o_ref[:, :] = x
@jax.jit
def pheavy(x2):
    return pl.pallas_call(
        k,
        grid=(640_000 // (8*128) // 8,),
        in_specs=[pl.BlockSpec((64, 128), lambda i: (i, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((64, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((640_000 // 128, 128), jnp.float32),
    )(x2)
x2 = jnp.ones((640_000 // 128, 128), jnp.float32)
timeit('pallas fma chain x200', pheavy, x2)

# 4. scan-of-64-trivial vs unrolled: control flow cost
@jax.jit
def scan64(x):
    def body(c, _):
        return c * 1.0001 + 1.0, None
    c, _ = jax.lax.scan(body, x, None, length=64)
    return c
timeit('lax.scan 64 trivial steps [640k]', scan64, x)

@jax.jit
def fori_traced(x, n):
    return jax.lax.fori_loop(0, n, lambda i, c: c * 1.0001 + 1.0, x)
timeit('fori traced-bound 64 steps', fori_traced, x, jnp.int32(64))
