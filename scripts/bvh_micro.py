"""Microbenchmarks that decide the BVH mesh-tier design (round 2).

Every benchmark loops K times INSIDE one jitted program (dispatch through the
axon tunnel costs ~1.5 ms, so per-dispatch timing is useless). Questions:

  1. Does per-lane sublane gather (jnp.take_along_axis axis=0) compile in
     Mosaic, and how fast for (32,128) idx over (R,128) tables?
     -> decides per-ray stackless BVH traversal in the megakernel.
  2. Cost of a chain of all-false lax.cond inside a kernel.
     -> decides tile-granularity cluster skipping.
  3. Scalar-broadcast face streaming from VMEM (sublane-dynamic row reads).
     -> decides how leaf faces are streamed.
  4. XLA gather throughput (wavefront path) for small/large tables.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/bvh_micro.py [sect]
"""

import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROWS, LANES = 32, 128
SHAPE = (ROWS, LANES)

INTERPRET = os.environ.get("BVH_MICRO_INTERPRET", "0") == "1"
K = int(os.environ.get("BVH_MICRO_K", "50"))


def sync(x):
    return np.asarray(jax.device_get(x)).ravel()[:4]


def bench(f, *args):
    """f must already loop K times internally. Returns seconds per inner iter."""
    out = f(*args)
    sync(out)
    t0 = time.perf_counter()
    out = f(*args)
    sync(out)
    dt = time.perf_counter() - t0
    return (dt - 0.0015) / K  # subtract approximate dispatch latency


def repeat_jit(step):
    """jit(lambda *a: fori_loop of step, carrying the first arg)."""

    @jax.jit
    def f(x, *rest):
        def body(i, x):
            # fold i in so iterations can't be CSE'd
            return step(x + jnp.float32(0) * i, *rest)

        return lax.fori_loop(0, K, body, x)

    return f


# ---------------------------------------------------------------- 1. gather
def make_gather_call(table_rows, n_gathers=8):
    def kernel(table_ref, x_ref, out_ref):
        idx = (x_ref[:, :] * 1000.0).astype(jnp.int32) % table_rows
        acc = x_ref[:, :]
        for k in range(n_gathers):
            i = (idx + k * 37) % table_rows
            vals = jnp.take_along_axis(table_ref[:, :], i, axis=0)
            acc = acc + vals
        out_ref[:, :] = acc * 1e-6

    def call(x, table):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(SHAPE, jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            interpret=INTERPRET,
        )(table, x)

    return call


def try_gather(table_rows):
    table = jnp.asarray(np.random.rand(table_rows, LANES).astype(np.float32))
    x = jnp.asarray(np.random.rand(*SHAPE).astype(np.float32))
    f = repeat_jit(make_gather_call(table_rows))
    dt = bench(f, x, table)
    print(f"gather table=({table_rows},128): {dt*1e6:.2f} us/kernel, "
          f"{dt/8*1e6:.3f} us per (32,128) gather", flush=True)


# ------------------------------------------------------------- 2. cond chain
def make_cond_call(n_conds, frac_true):
    def kernel(x_ref, out_ref):
        x = x_ref[:, :]
        acc = jnp.zeros(SHAPE, jnp.float32)

        def work(a):
            y = x * 1.1 + a
            for _ in range(10):
                y = y * x + 0.5
            return a + y

        for c in range(n_conds):
            pred = jnp.max(x) > (0.0 if c < n_conds * frac_true else 10.0)
            acc = lax.cond(pred, work, lambda a: a, acc)
        out_ref[:, :] = acc * 1e-6

    def call(x):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(SHAPE, jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            interpret=INTERPRET,
        )(x)

    return call


def try_conds(n_conds, frac_true):
    x = jnp.asarray(np.random.rand(*SHAPE).astype(np.float32))
    f = repeat_jit(make_cond_call(n_conds, frac_true))
    dt = bench(f, x)
    print(f"cond chain n={n_conds} frac_true={frac_true}: {dt*1e6:.2f} us/kernel "
          f"({dt/n_conds*1e9:.0f} ns per cond incl body)", flush=True)


# ---------------------------------------------------- 3. face stream layouts
def make_facestream_call(n_faces):
    def kernel(fv_ref, o_ref, out_ref):
        o = o_ref[:, :]
        t_best = jnp.full(SHAPE, jnp.inf, jnp.float32)

        def body(i, tb):
            row = fv_ref[i, :]
            px = o * row[0] + row[1]
            py = o * row[2] + row[3]
            pz = o * row[4] + row[5]
            det = px * row[6] + py * row[7] + pz * row[8]
            t = det * row[0] + px
            for _ in range(4):
                t = t * det + py
            return jnp.minimum(tb, t + pz * 1e-9)

        t_best = lax.fori_loop(0, n_faces, body, t_best)
        out_ref[:, :] = t_best * 1e-6

    def call(x, fv):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(SHAPE, jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            interpret=INTERPRET,
        )(fv, x)

    return call


def try_facestream(n_faces):
    fv = jnp.asarray(np.random.rand(n_faces, 16).astype(np.float32))
    x = jnp.asarray(np.random.rand(*SHAPE).astype(np.float32))
    f = repeat_jit(make_facestream_call(n_faces))
    dt = bench(f, x, fv)
    print(f"facestream scalar-bcast n={n_faces}: {dt*1e6:.2f} us/kernel, "
          f"{dt/n_faces*1e9:.2f} ns/face/tile", flush=True)


# ------------------------------------------------------- 4. XLA-level gather
def try_xla_gather(n_rays, table_rows, cols):
    table = jnp.asarray(np.random.rand(table_rows, cols).astype(np.float32))
    x0 = jnp.asarray(np.random.rand(n_rays).astype(np.float32))

    def step(x, table):
        idx = (x * 997.0).astype(jnp.int32) % table_rows
        v = table[idx]  # [n_rays, cols]
        return x + v[:, 0] * 1e-9

    f = repeat_jit(step)
    dt = bench(f, x0, table)
    print(f"XLA gather rays={n_rays} table=({table_rows},{cols}): {dt*1e3:.3f} ms",
          flush=True)


# ---------------------------------------------------------- 5. onehot matmul
def try_onehot(n_rays, table_rows, cols):
    table = jnp.asarray(np.random.rand(table_rows, cols).astype(np.float32))
    x0 = jnp.asarray(np.random.rand(n_rays, table_rows).astype(np.float32))

    def step(x, table):
        v = jnp.dot(x, table, preferred_element_type=jnp.float32)
        return x + v[:, :1] * 1e-9

    f = repeat_jit(step)
    dt = bench(f, x0, table)
    print(f"onehot matmul ({n_rays},{table_rows})@({table_rows},{cols}): "
          f"{dt*1e3:.4f} ms", flush=True)


def main():
    print("devices:", jax.devices(), flush=True)
    which = sys.argv[1] if len(sys.argv) > 1 else "all"

    if which in ("all", "gather"):
        for rows in (64, 256, 2048):
            try:
                try_gather(rows)
            except Exception as e:
                print(f"gather table=({rows},128) FAILED: {type(e).__name__}: "
                      f"{str(e)[:400]}", flush=True)

    if which in ("all", "cond"):
        for n, frac in ((64, 0.0), (64, 1.0), (256, 0.0), (256, 0.1)):
            try:
                try_conds(n, frac)
            except Exception as e:
                print(f"cond n={n} FAILED: {type(e).__name__}: {str(e)[:300]}", flush=True)

    if which in ("all", "faces"):
        for n in (256, 2048):
            try:
                try_facestream(n)
            except Exception as e:
                print(f"facestream n={n} FAILED: {type(e).__name__}: {str(e)[:300]}",
                      flush=True)

    if which in ("all", "xla"):
        for n_rays, rows, cols in (
            (640_000, 4096, 8),
            (640_000, 256, 8),
            (65_536, 4096, 8),
            (640_000, 20_000, 16),
        ):
            try:
                try_xla_gather(n_rays, rows, cols)
            except Exception as e:
                print(f"xla gather FAILED: {e}", flush=True)

    if which in ("all", "onehot"):
        for args in ((4096, 4096, 16), (4096, 256, 64)):
            try:
                try_onehot(*args)
            except Exception as e:
                print(f"onehot FAILED: {e}", flush=True)

    print("ALLDONE", flush=True)


if __name__ == "__main__":
    main()
