"""Hardware PRNG uniforms via a Pallas kernel.

The per-sample RNG block ([K, N] uniforms) is a measurable slice of the
render iteration when generated with threefry. This kernel uses the TPU's
per-core hardware PRNG (pltpu.prng_seed / prng_random_bits) instead:
one seed per grid block, 24-bit mantissa uniforms in [0, 1).

Monte-Carlo suitability: streams are decorrelated by seeding each block with
(seed, block_id) and each sample with a distinct seed; this is not a
counter-based crypto PRNG like threefry, but path tracing only needs
white-noise quality. Select with RenderOptions(rng="pallas").
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BLK = 2048  # lanes per grid block (16 f32 tiles)


def _uniform_kernel(seed_ref, out_ref):
    pid = pl.program_id(0)
    # Distinct stream per block; the multiplier is an odd 32-bit constant so
    # consecutive seeds map to distant states.
    # 0x9E3779B1 as a signed 32-bit constant (golden-ratio odd multiplier)
    mult = jnp.int32(np.int32(np.uint32(0x9E3779B1)))
    pltpu.prng_seed(seed_ref[0] * mult + pid)
    # prng_random_bits may come back as signed int32: bitcast to uint32 BEFORE
    # shifting, or the sign bit arithmetic-shifts into the mantissa.
    bits = pltpu.bitcast(pltpu.prng_random_bits(out_ref.shape), jnp.uint32)
    # Mosaic has no uint32->f32 cast; after >>8 the value fits in int31,
    # so bitcast to int32 first.
    mant = pltpu.bitcast(bits >> 8, jnp.int32)
    out_ref[:, :] = mant.astype(jnp.float32) * (1.0 / (1 << 24))


@functools.partial(jax.jit, static_argnames=("k", "n", "interpret"))
def pallas_uniforms(seed, k: int, n: int, interpret: bool = False) -> jnp.ndarray:
    """[k, n] U(0,1) from the TPU hardware PRNG. ``seed``: traced i32 scalar."""
    n_pad = ((n + _BLK - 1) // _BLK) * _BLK
    out = pl.pallas_call(
        _uniform_kernel,
        grid=(n_pad // _BLK,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec((k, _BLK), lambda i: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((k, n_pad), jnp.float32),
        interpret=interpret,
    )(jnp.asarray(seed, jnp.int32).reshape(1))
    return out[:, :n]


def iteration_uniforms(options, ikey, iteration, k: int, n: int) -> jnp.ndarray:
    """Dispatch between threefry (counter-based, reproducible across
    platforms) and the Pallas hardware PRNG ('pallas'/'auto' on TPU).

    On the CPU backend this always uses threefry: the interpreter has no
    lowering for the TPU prng primitives.
    """
    mode = getattr(options, "rng", "auto")
    if mode in ("pallas", "auto") and jax.default_backend() != "cpu":
        seed = jax.random.randint(ikey, (), 0, 2**31 - 1, dtype=jnp.int32)
        return pallas_uniforms(seed, k, n)
    return jax.random.uniform(ikey, (k, n), dtype=jnp.float32)
