"""Round-3 BVH microbenchmarks: calibrated floor + working gather forms.

Learnings from round 2: dynamic_update_slice does not lower in Mosaic (pad
idx with a static concatenate instead); there is a large per-kernel floor
(~0.5 ms?) that must be calibrated with an empty kernel and subtracted; the
onehot matmul must be built in (slots, rays) orientation without transposes.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/bvh_micro3.py
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
K = int(os.environ.get("BVH_MICRO_K", "100"))


def sync(x):
    return np.asarray(jax.device_get(x)).ravel()[:4]


def bench_raw(f, *args):
    out = f(*args)
    sync(out)
    t0 = time.perf_counter()
    out = f(*args)
    sync(out)
    return (time.perf_counter() - t0) / K


def repeat_jit(step):
    @jax.jit
    def f(x, *rest):
        def body(i, x):
            return step(x + jnp.float32(0) * i, *rest)

        return lax.fori_loop(0, K, body, x)

    return f


def pcall(kernel, n_in):
    def call(*args):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(SHAPE, jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * n_in,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            interpret=INTERPRET,
        )(*args)

    return call


FLOOR = [0.0]


def calibrate():
    def kernel(x_ref, out_ref):
        out_ref[:, :] = x_ref[:, :] * 1.000001

    x = jnp.asarray(np.random.rand(*SHAPE).astype(np.float32))
    f = repeat_jit(pcall(kernel, 1))
    dt = bench_raw(f, x)
    FLOOR[0] = dt
    print(f"empty-kernel floor: {dt*1e6:.2f} us/kernel", flush=True)


def report(name, dt, n_ops):
    net = dt - FLOOR[0]
    print(f"{name}: {dt*1e6:.2f} us/kernel ({net*1e6:.2f} net), "
          f"{net/n_ops*1e6:.3f} us/op", flush=True)


# ---- axis=0 gather: table (R,128), idx padded with static concatenate ----
def try_gather0(table_rows, n_gathers=32):
    pad_rows = table_rows - ROWS

    def kernel(x_ref, table_ref, out_ref):
        base = (x_ref[:, :] * 997.0).astype(jnp.int32) % table_rows
        if pad_rows:
            idx = jnp.concatenate(
                [base, jnp.zeros((pad_rows, LANES), jnp.int32)], axis=0
            )
        else:
            idx = base
        acc = x_ref[:, :]
        for k in range(n_gathers):
            g = jnp.take_along_axis(table_ref[:, :], (idx + k) % table_rows, axis=0)
            acc = acc + g[:ROWS, :]
        out_ref[:, :] = acc * 1e-6

    table = jnp.asarray(np.random.rand(table_rows, LANES).astype(np.float32))
    x = jnp.asarray(np.random.rand(*SHAPE).astype(np.float32))
    f = repeat_jit(pcall(kernel, 2))
    dt = bench_raw(f, x, table)
    report(f"gather0 R={table_rows} x{n_gathers}", dt, n_gathers)


# ---- axis=1 gather with op-count sweep --------------------------------------
def try_gather1(n_gathers):
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
    dt = bench_raw(f, x, table)
    report(f"gather1 x{n_gathers}", dt, n_gathers)


# ---- plain vector-op sweep (FLOPs calibration) ------------------------------
def try_vecops(n_ops):
    def kernel(x_ref, out_ref):
        acc = x_ref[:, :]
        y = acc * 1.0001
        for k in range(n_ops):
            acc = acc * y + 0.5
        out_ref[:, :] = acc * 1e-6

    x = jnp.asarray(np.random.rand(*SHAPE).astype(np.float32))
    f = repeat_jit(pcall(kernel, 1))
    dt = bench_raw(f, x)
    report(f"vecops fma x{n_ops} (32,128)", dt, n_ops)


# ---- onehot matmul, (slots, rays) orientation -------------------------------
def try_onehot(slots=640, n_attr=8):
    def kernel(x_ref, attr_ref, out_ref):
        dest = (x_ref[:, :] * 997.0).astype(jnp.int32) % slots
        dest_row = dest.reshape(1, ROWS * LANES)
        slot_ids = jax.lax.broadcasted_iota(jnp.int32, (slots, ROWS * LANES), 0)
        onehot = (slot_ids == dest_row).astype(jnp.bfloat16)  # (slots, 4096)
        packed = jnp.dot(
            onehot, attr_ref[:, :].astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )  # (slots, n_attr)
        out_ref[:, :] = x_ref[:, :] + jnp.sum(packed) * 1e-9

    x = jnp.asarray(np.random.rand(*SHAPE).astype(np.float32))
    attrs = jnp.asarray(np.random.rand(ROWS * LANES, n_attr).astype(np.float32))
    f = repeat_jit(pcall(kernel, 2))
    dt = bench_raw(f, x, attrs)
    report(f"onehot-scatter slots={slots}", dt, 1)


def main():
    print("devices:", jax.devices(), flush=True)
    which = sys.argv[1] if len(sys.argv) > 1 else "all"

    calibrate()

    if which in ("all", "vec"):
        for n in (64, 512):
            try:
                try_vecops(n)
            except Exception as e:
                print(f"vecops x{n} FAILED: {type(e).__name__}: {str(e)[:300]}", flush=True)

    if which in ("all", "gather"):
        for rows in (32, 256, 2560):
            try:
                try_gather0(rows)
            except Exception as e:
                print(f"gather0 R={rows} FAILED: {type(e).__name__}: {str(e)[:400]}",
                      flush=True)
        for n in (8, 64):
            try:
                try_gather1(n)
            except Exception as e:
                print(f"gather1 x{n} FAILED: {type(e).__name__}: {str(e)[:400]}",
                      flush=True)

    if which in ("all", "onehot"):
        for slots in (256, 640):
            try:
                try_onehot(slots)
            except Exception as e:
                print(f"onehot slots={slots} FAILED: {type(e).__name__}: "
                      f"{str(e)[:400]}", flush=True)

    print("ALLDONE", flush=True)


if __name__ == "__main__":
    main()
