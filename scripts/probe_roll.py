"""Probe which roll/slice form Mosaic accepts, to fix the BVH tier crash.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_roll.py
"""

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def try_variant(name, kernel, args, n_in):
    try:
        out = jax.jit(
            lambda *a: pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * n_in,
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(*a)
        )(*args)
        print(name, "OK", float(np.asarray(out).sum()), flush=True)
    except Exception as e:
        print(name, "FAILED:", type(e).__name__, str(e)[:200], flush=True)


rngd = np.random.default_rng(0)
x = jnp.asarray(rngd.random((8, 128), np.float32))
tab = jnp.asarray(rngd.random((16, 512), np.float32))


def k_roll_1x128(tab_ref, x_ref, out_ref):
    row = tab_ref[0:1, 0:128]

    def step(k, carry):
        acc, row = carry
        acc = acc + row * x_ref[:, :]
        return acc, pltpu.roll(row, 1, 1)

    acc, _ = lax.fori_loop(0, 128, step, (jnp.zeros((8, 128), jnp.float32), row))
    out_ref[:, :] = acc


def k_roll_block(tab_ref, x_ref, out_ref):
    blk = tab_ref[:, 0:128]  # (16,128)

    def step(k, carry):
        acc, blk = carry
        acc = acc + blk[0:1, :] * x_ref[:, :] + blk[3:4, :]
        return acc, pltpu.roll(blk, 1, 1)

    acc, _ = lax.fori_loop(0, 128, step, (jnp.zeros((8, 128), jnp.float32), blk))
    out_ref[:, :] = acc


def k_roll_8x128(tab_ref, x_ref, out_ref):
    blk = tab_ref[0:8, 0:128]  # (8,128)

    def step(k, carry):
        acc, blk = carry
        acc = acc + blk * x_ref[:, :]
        return acc, pltpu.roll(blk, 1, 1)

    acc, _ = lax.fori_loop(0, 128, step, (jnp.zeros((8, 128), jnp.float32), blk))
    out_ref[:, :] = acc


def k_bcast_only(tab_ref, x_ref, out_ref):
    row = tab_ref[0:1, 0:128]
    out_ref[:, :] = x_ref[:, :] * row + tab_ref[1:2, 128:256]


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    try_variant("bcast (1,128) only", k_bcast_only, (tab, x), 2)
    try_variant("roll (8,128) block", k_roll_8x128, (tab, x), 2)
    try_variant("roll (16,128) block + row slices", k_roll_block, (tab, x), 2)
    try_variant("roll (1,128) row", k_roll_1x128, (tab, x), 2)
    print("ALLDONE", flush=True)
