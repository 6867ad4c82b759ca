"""Round-4 microbenchmarks: in-kernel repeat loops (floor-free timing).

Measures the primitives of the per-ray mesh tier ("the MXU is the gather
engine") with the work loop INSIDE the kernel, so the ~300 us per-call floor
amortizes away:

  1. FMA chain on (32,128)           -> VPU cycles per vector op
  2. 183-cluster literal AABB scan   -> candidate-mask cost per tile
  3. onehot build + matmul           -> compaction / face-fetch cost
  4. dynamic_gather axis=1           -> per-lane small-table gather cost
  5. panel Moller-Trumbore           -> face-test cost per (slots, faces)

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/bvh_micro4.py
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
REPS = int(os.environ.get("BVH_MICRO_REPS", "200"))


def sync(x):
    return np.asarray(jax.device_get(x)).ravel()[:4]


def bench(f, *args):
    out = f(*args)
    sync(out)
    t0 = time.perf_counter()
    out = f(*args)
    sync(out)
    return time.perf_counter() - t0


def run(name, make_kernel, inputs, n_per_rep, n_in=None):
    n_in = n_in if n_in is not None else len(inputs)
    try:
        call = lambda *a: pl.pallas_call(
            make_kernel(REPS),
            out_shape=jax.ShapeDtypeStruct(SHAPE, jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * n_in,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            interpret=INTERPRET,
        )(*a)
        f = jax.jit(call)
        dt = bench(f, *inputs)
        per = (dt - 0.002) / REPS / n_per_rep
        print(f"{name}: {dt*1e3:.2f} ms total, {per*1e9:.1f} ns per unit "
              f"({(dt-0.002)/REPS*1e6:.2f} us per rep)", flush=True)
    except Exception as e:
        print(f"{name} FAILED: {type(e).__name__}: {str(e)[:400]}", flush=True)


# 1. FMA chain ---------------------------------------------------------------
def make_fma(reps):
    def kernel(x_ref, out_ref):
        x = x_ref[:, :]

        def body(i, acc):
            for _ in range(64):
                acc = acc * x + 0.5
            return acc

        out_ref[:, :] = lax.fori_loop(0, reps, body, x) * 1e-6

    return kernel


# 2. literal AABB scan --------------------------------------------------------
def make_aabb(reps, n_clus=183):
    rngd = np.random.default_rng(0)
    boxes = rngd.random((n_clus, 6)).astype(np.float32)

    def kernel(ox_ref, oy_ref, oz_ref, ix_ref, iy_ref, iz_ref, out_ref):
        ox, oy, oz = ox_ref[:, :], oy_ref[:, :], oz_ref[:, :]
        ix, iy, iz = ix_ref[:, :], iy_ref[:, :], iz_ref[:, :]

        def body(i, acc):
            t_best = acc
            count = acc * 0.0
            for c in range(n_clus):
                b = boxes[c]
                t1 = (b[0] - ox) * ix
                t2 = (b[3] + 1.0 - ox) * ix
                u1 = (b[1] - oy) * iy
                u2 = (b[4] + 1.0 - oy) * iy
                v1 = (b[2] - oz) * iz
                v2 = (b[5] + 1.0 - oz) * iz
                tin = jnp.maximum(
                    jnp.maximum(jnp.minimum(t1, t2), jnp.minimum(u1, u2)),
                    jnp.minimum(v1, v2),
                )
                tout = jnp.minimum(
                    jnp.minimum(jnp.maximum(t1, t2), jnp.maximum(u1, u2)),
                    jnp.maximum(v1, v2),
                )
                hit = (tout >= tin) & (tout > 0) & (tin < t_best)
                count = count + hit.astype(jnp.float32)
            return t_best * 0.9999 + count * 1e-9

        out_ref[:, :] = lax.fori_loop(0, reps, body, jnp.abs(ox) + 10.0) * 1e-6

    return kernel


# 3. onehot build + matmul -----------------------------------------------------
def make_onehot(reps, slots, src, cols):
    def kernel(x_ref, attr_ref, out_ref):
        x = x_ref[:, :]

        def body(i, acc):
            dest = (x * 997.0 + acc[0, 0]).astype(jnp.int32) % slots
            dest_row = dest.reshape(1, ROWS * LANES)[:, :src]
            slot_ids = jax.lax.broadcasted_iota(jnp.int32, (slots, src), 0)
            onehot = (slot_ids == dest_row).astype(jnp.bfloat16)
            packed = jnp.dot(
                onehot, attr_ref[:, :].astype(jnp.bfloat16),
                preferred_element_type=jnp.float32,
            )
            return acc + jnp.sum(packed) * 1e-9

        out_ref[:, :] = lax.fori_loop(0, reps, body, x) * 1e-6

    return kernel


# 4. dynamic_gather axis=1 ------------------------------------------------------
def make_gather1(reps, n_gathers=16):
    def kernel(x_ref, table_ref, out_ref):
        x = x_ref[:, :]
        t = table_ref[:, :]

        def body(i, acc):
            idx = (acc * 997.0).astype(jnp.int32) % LANES
            for k in range(n_gathers):
                g = jnp.take_along_axis(t, (idx + k) % LANES, axis=1)
                acc = acc + g
            return acc * 1e-3

        out_ref[:, :] = lax.fori_loop(0, reps, body, x) * 1e-6

    return kernel


# 5. panel Moller-Trumbore -------------------------------------------------------
def make_mt(reps, n_slots, n_faces):
    """(n_slots,1) rays x (1,n_faces) faces panels, plane-based test."""

    def kernel(r_ref, f_ref, out_ref):
        rays = [r_ref[i, :n_slots].reshape(n_slots, 1) for i in range(7)]
        fa = [f_ref[i, :n_faces].reshape(1, n_faces) for i in range(12)]
        ox, oy, oz, dx, dy, dz, tb = rays
        fnx, fny, fnz, cc, ux, uy, uz, cu, vx, vy, vz, cv = fa

        def body(i, acc):
            A = ox * fnx + oy * fny + oz * fnz
            B = dx * fnx + dy * fny + dz * fnz
            B = jnp.where(jnp.abs(B) < 1e-20, 1e-20, B)
            t = (cc - A) / B
            xu = ox * ux + oy * uy + oz * uz + t * (dx * ux + dy * uy + dz * uz) - cu
            xv = ox * vx + oy * vy + oz * vz + t * (dx * vx + dy * vy + dz * vz) - cv
            ok = (xu >= 0) & (xv >= 0) & (xu + xv <= 1) & (t > 1e-4)
            tmin = jnp.min(jnp.where(ok, t, 1e30), axis=1)  # (n_slots,)
            return acc * 0.9999 + jnp.sum(tmin) * 1e-12

        acc = lax.fori_loop(0, reps, body, r_ref[0, :1].reshape(1, 1) * 0.0)
        out_ref[:, :] = jnp.zeros(SHAPE, jnp.float32) + acc[0, 0] * 1e-6

    return kernel


def main():
    print("devices:", jax.devices(), flush=True)
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    rngd = np.random.default_rng(0)
    x = jnp.asarray(rngd.random(SHAPE, np.float32))

    if which in ("all", "fma"):
        run("fma x64 (32,128)", make_fma, (x,), 64)

    if which in ("all", "aabb"):
        rays = tuple(jnp.asarray(rngd.random(SHAPE, np.float32) + 0.2) for _ in range(6))
        run("aabb-scan 183 clusters", lambda r: make_aabb(r, 183), rays, 183)

    if which in ("all", "onehot"):
        for slots, src, cols in ((256, 4096, 8), (1024, 768, 288), (2048, 768, 144)):
            attrs = jnp.asarray(rngd.random((src, cols), np.float32))
            run(
                f"onehot ({slots},{src})@({src},{cols})",
                lambda r, s=slots, sr=src, c=cols: make_onehot(r, s, sr, c),
                (x, attrs),
                1,
            )

    if which in ("all", "gather"):
        table = jnp.asarray(rngd.random(SHAPE, np.float32))
        run("gather1 x16 (32,128)", make_gather1, (x, table), 16)

    if which in ("all", "mt"):
        for n_slots, n_faces in ((256, 32), (1024, 32), (1024, 128)):
            r = jnp.asarray(rngd.random((8, max(n_slots, 128)), np.float32) + 0.1)
            f = jnp.asarray(rngd.random((12, max(n_faces, 128)), np.float32) + 0.1)
            run(
                f"mt panel ({n_slots}x{n_faces})",
                lambda rep, s=n_slots, nf=n_faces: make_mt(rep, s, nf),
                (r, f),
                n_slots * n_faces,
            )

    print("ALLDONE", flush=True)


if __name__ == "__main__":
    main()
