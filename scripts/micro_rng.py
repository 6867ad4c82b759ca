import time, numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N = 640_000
K = 32  # streams per iteration

def timeit(name, f, *args, reps=20):
    t0=time.time()
    r = f(*args); _=np.asarray(jax.tree_util.tree_leaves(r)[0]).ravel()[:1]
    c = time.time()-t0
    t0=time.time()
    for _ in range(reps): r = f(*args)
    _=np.asarray(jax.tree_util.tree_leaves(r)[0]).ravel()[:1]
    print(f'{name}: {(time.time()-t0)/reps*1000:.2f} ms (compile {c:.0f}s)', flush=True)

@jax.jit
def f_threefry(key):
    return jax.random.uniform(key, (K, N))
timeit('threefry [K,N]', f_threefry, jax.random.key(0))

@jax.jit
def f_rbg(key):
    return jax.random.uniform(key, (K, N))
with jax.default_prng_impl('unsafe_rbg'):
    timeit('unsafe_rbg [K,N]', f_rbg, jax.random.key(0))

BLK = 2048
def _kernel(seed_ref, out_ref):
    pid = pl.program_id(0)
    pltpu.prng_seed(seed_ref[0] + pid)
    bits = pltpu.prng_random_bits(out_ref.shape)
    out_ref[:, :] = (bits >> 8).astype(jnp.float32) * (1.0 / (1 << 24))

@jax.jit
def f_pallas(seed):
    return pl.pallas_call(
        _kernel,
        grid=(N // BLK,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec((K, BLK), lambda i: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((K, N), jnp.float32),
    )(seed)
timeit('pallas prng [K,N]', f_pallas, jnp.array([1234], jnp.int32))

# also: how slow is a [N]-chunk elementwise pipeline op for scale reference
@jax.jit
def f_axpy(a, b):
    return a * 1.0001 + b
timeit('axpy [K,N]', f_axpy, jnp.ones((K,N)), jnp.ones((K,N)))
