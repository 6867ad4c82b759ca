import time, numpy as np, jax, jax.numpy as jnp

N = 640_000
def timeit(name, f, *args, reps=20):
    t0=time.time()
    r = f(*args); _=np.asarray(jax.tree_util.tree_leaves(r)[0]).ravel()[:1]
    compile_s = time.time()-t0
    t0=time.time()
    for _ in range(reps): r = f(*args)
    _=np.asarray(jax.tree_util.tree_leaves(r)[0]).ravel()[:1]
    ms = (time.time()-t0)/reps*1000
    print(f'{name}: {ms:.2f} ms  (compile {compile_s:.0f}s)', flush=True)

@jax.jit
def fa(o, d):
    x = o
    for _ in range(8):
        x = x / jnp.linalg.norm(x, axis=-1, keepdims=True)
        x = jnp.cross(x, d) + d
    return x
o = jnp.ones((N,3)); d = jnp.full((N,3), 0.5)
timeit('A [N,3] vec math x8', fa, o, d)

@jax.jit
def fb(ox,oy,oz,dx,dy,dz):
    x,y,z = ox,oy,oz
    for _ in range(8):
        inv = jax.lax.rsqrt(x*x+y*y+z*z)
        x,y,z = x*inv,y*inv,z*inv
        cx = y*dz - z*dy; cy = z*dx - x*dz; cz = x*dy - y*dx
        x,y,z = cx+dx, cy+dy, cz+dz
    return x
a = jnp.ones(N); b = jnp.full(N, 0.5)
timeit('B SoA [N] same math', fb, a,a,a,b,b,b)

@jax.jit
def fc(idx, table):
    return table[idx]
idx = jnp.zeros(N, jnp.int32); table = jnp.ones((8,3))
timeit('C gather [N]<-[8,3]', fc, idx, table)

@jax.jit
def fd(key):
    return jax.random.uniform(key, (N,3))
timeit('D threefry uniform [N,3]', fd, jax.random.key(0))

@jax.jit
def fe(key):
    return jax.random.uniform(key, (N,3))
with jax.default_prng_impl('unsafe_rbg'):
    timeit('E unsafe_rbg uniform [N,3]', fe, jax.random.key(1))
