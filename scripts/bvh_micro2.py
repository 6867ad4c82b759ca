"""Round-2 BVH microbenchmarks: tpu.dynamic_gather and a mock traversal step.

Mosaic's gather lowering (jax/_src/pallas/mosaic/lowering.py:2464-2524)
requires indices.shape == table.shape (axis=0: out[i,j] = T[idx[i,j], j];
axis=1: out[i,j] = T[i, idx[i,j]]). This measures:

  1. axis=0 gather cost vs table height R (cost should be ~R*128 lanes).
  2. axis=1 gather cost on (32,128).
  3. A mock 8-ary BVH traversal step on a (32,128) ray tile: 12 quantized
     child-AABB gathers + dequant + 8 box tests + next-child bookkeeping.
  4. In-kernel onehot-matmul scatter (compaction building block).

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/bvh_micro2.py
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
    out = f(*args)
    sync(out)
    t0 = time.perf_counter()
    out = f(*args)
    sync(out)
    return (time.perf_counter() - t0 - 0.0015) / K


def repeat_jit(step):
    @jax.jit
    def f(x, *rest):
        def body(i, x):
            return step(x + jnp.float32(0) * i, *rest)

        return lax.fori_loop(0, K, body, x)

    return f


def pcall(kernel, n_in, out_shape=None):
    out_shape = out_shape or jax.ShapeDtypeStruct(SHAPE, jnp.float32)

    def call(*args):
        return pl.pallas_call(
            kernel,
            out_shape=out_shape,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * n_in,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            interpret=INTERPRET,
        )(*args)

    return call


# ------------------------------------------------- 1. axis=0 dynamic_gather
def try_gather0(table_rows, n_gathers=8):
    def kernel(x_ref, table_ref, out_ref):
        # idx must be table-shaped: (R,128)
        base = (x_ref[:, :] * 997.0).astype(jnp.int32) % table_rows  # (32,128)
        idxf = jnp.zeros((table_rows, LANES), jnp.int32)
        idx = lax.dynamic_update_slice(idxf, base, (0, 0))
        acc = x_ref[:, :]
        for k in range(n_gathers):
            g = jnp.take_along_axis(table_ref[:, :], (idx + k) % table_rows, axis=0)
            acc = acc + g[:ROWS, :]
        out_ref[:, :] = acc * 1e-6

    table = jnp.asarray(np.random.rand(table_rows, LANES).astype(np.float32))
    x = jnp.asarray(np.random.rand(*SHAPE).astype(np.float32))
    f = repeat_jit(pcall(kernel, 2))
    dt = bench(f, x, table)
    print(f"gather0 R={table_rows}: {dt*1e6:.2f} us/kernel, "
          f"{dt/n_gathers*1e6:.3f} us/gather", flush=True)


# ------------------------------------------------- 2. axis=1 dynamic_gather
def try_gather1(n_gathers=8):
    def kernel(x_ref, table_ref, out_ref):
        idx = (x_ref[:, :] * 997.0).astype(jnp.int32) % LANES
        acc = x_ref[:, :]
        for k in range(n_gathers):
            g = jnp.take_along_axis(table_ref[:, :], (idx + k) % LANES, axis=1)
            acc = acc + g
        out_ref[:, :] = acc * 1e-6

    table = jnp.asarray(np.random.rand(*SHAPE).astype(np.float32))
    x = jnp.asarray(np.random.rand(*SHAPE).astype(np.float32))
    f = repeat_jit(pcall(kernel, 2))
    dt = bench(f, x, table)
    print(f"gather1 (32,128): {dt*1e6:.2f} us/kernel, "
          f"{dt/n_gathers*1e6:.3f} us/gather", flush=True)


# ------------------------------------------------- 3. mock traversal step
def try_traversal(n_nodes=128, n_steps=10):
    """Per (32,128) ray tile: each step gathers 12 packed-u8 child-AABB words
    from a replicated node table, dequantizes 8 child boxes, slab-tests, and
    picks the nearest hit child."""

    def kernel(ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, tab_ref, out_ref):
        ox, oy, oz = ox_ref[:, :], oy_ref[:, :], oz_ref[:, :]
        dx, dy, dz = dx_ref[:, :], dy_ref[:, :], dz_ref[:, :]
        node = jnp.zeros(SHAPE, jnp.int32)
        t_best = jnp.full(SHAPE, 1e30, jnp.float32)

        idxf = jnp.zeros((n_nodes, LANES), jnp.int32)

        for step in range(n_steps):
            idx = lax.dynamic_update_slice(idxf, node, (0, 0))
            words = []
            for w in range(12):
                tw = tab_ref[w]  # (n_nodes, 128) f32 (bitcast u8x4 payload)
                words.append(
                    jnp.take_along_axis(tw, idx, axis=0)[:ROWS, :]
                )
            # dequant: treat each word as 4 u8s via bit ops on the bitcast
            best_t = jnp.full(SHAPE, 1e30, jnp.float32)
            best_c = jnp.zeros(SHAPE, jnp.int32)
            for c in range(8):
                w0 = words[c + (0 if c < 6 else 4 - c)]  # mix of words
                bits = jnp.abs(w0).astype(jnp.int32)
                lo = (bits & 255).astype(jnp.float32) * (1.0 / 255.0)
                hi = ((bits >> 8) & 255).astype(jnp.float32) * (1.0 / 255.0)
                bmnx, bmxx = lo, hi + 1.0
                t1 = (bmnx - ox) / dx
                t2 = (bmxx - ox) / dx
                u1 = (bmnx - oy) / dy
                u2 = (bmxx - oy) / dy
                v1 = (bmnx - oz) / dz
                v2 = (bmxx - oz) / dz
                tmin = jnp.maximum(
                    jnp.maximum(jnp.minimum(t1, t2), jnp.minimum(u1, u2)),
                    jnp.minimum(v1, v2),
                )
                tmax = jnp.minimum(
                    jnp.minimum(jnp.maximum(t1, t2), jnp.maximum(u1, u2)),
                    jnp.maximum(v1, v2),
                )
                hit = (tmax >= tmin) & (tmax > 0) & (tmin < best_t)
                best_t = jnp.where(hit, tmin, best_t)
                best_c = jnp.where(hit, c, best_c)
            node = (node * 8 + best_c + 1) % n_nodes
            t_best = jnp.minimum(t_best, best_t)

        out_ref[:, :] = t_best * 1e-6 + node.astype(jnp.float32) * 1e-9

    rngd = np.random.default_rng(0)
    rays = [jnp.asarray(rngd.random(SHAPE, np.float32) + 0.1) for _ in range(6)]
    tab = jnp.asarray(rngd.random((12, n_nodes, LANES), np.float32))

    def call(x, *rest):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(SHAPE, jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 7,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            interpret=INTERPRET,
        )(x, *rest)

    f = repeat_jit(lambda x, *r: call(x, *r))
    dt = bench(f, rays[0], *rays[1:], tab)
    print(f"traversal nodes={n_nodes} steps={n_steps}: {dt*1e6:.2f} us/kernel, "
          f"{dt/n_steps*1e6:.3f} us/step/tile", flush=True)


# ------------------------------------------------- 4. in-kernel onehot matmul
def try_onehot_kernel(slots=640, n_attr=8):
    def kernel(x_ref, attr_ref, out_ref):
        # dest slot per ray in [0, slots)
        dest = (x_ref[:, :] * 997.0).astype(jnp.int32) % slots  # (32,128)
        destv = dest.reshape(ROWS * LANES, 1)  # (4096,1)
        slot_ids = jax.lax.broadcasted_iota(jnp.int32, (ROWS * LANES, slots), 1)
        onehot = (slot_ids == destv).astype(jnp.bfloat16)  # (4096, slots)
        attrs = attr_ref[:, :]  # (4096, n_attr)
        packed = jax.lax.dot_general(
            onehot, attrs.astype(jnp.bfloat16),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (slots, n_attr)
        out_ref[:, :] = (
            x_ref[:, :] + jnp.sum(packed) * 1e-9
        )

    x = jnp.asarray(np.random.rand(*SHAPE).astype(np.float32))
    attrs = jnp.asarray(np.random.rand(ROWS * LANES, n_attr).astype(np.float32))
    f = repeat_jit(pcall(kernel, 2))
    dt = bench(f, x, attrs)
    print(f"onehot-scatter slots={slots} attrs={n_attr}: {dt*1e6:.2f} us/kernel",
          flush=True)


def main():
    print("devices:", jax.devices(), flush=True)
    which = sys.argv[1] if len(sys.argv) > 1 else "all"

    if which in ("all", "gather"):
        for rows in (32, 256, 640, 2560):
            try:
                try_gather0(rows)
            except Exception as e:
                print(f"gather0 R={rows} FAILED: {type(e).__name__}: {str(e)[:500]}",
                      flush=True)
        try:
            try_gather1()
        except Exception as e:
            print(f"gather1 FAILED: {type(e).__name__}: {str(e)[:500]}", flush=True)

    if which in ("all", "trav"):
        for nodes, steps in ((128, 10), (512, 10)):
            try:
                try_traversal(nodes, steps)
            except Exception as e:
                print(f"traversal nodes={nodes} FAILED: {type(e).__name__}: "
                      f"{str(e)[:500]}", flush=True)

    if which in ("all", "onehot"):
        for slots in (640, 4096):
            try:
                try_onehot_kernel(slots)
            except Exception as e:
                print(f"onehot slots={slots} FAILED: {type(e).__name__}: "
                      f"{str(e)[:500]}", flush=True)

    print("ALLDONE", flush=True)


if __name__ == "__main__":
    main()
