"""Counter-based RNG for the path tracer.

The reference seeds a thrust LCG per (iter, index, depth) via utilhash
(apps/src/intersections.h:12-20, pathtrace.cu:66-70). On TPU we use JAX's
counter-based threefry: one key folded with (iteration, depth), with the lane
index acting as the counter. Streams are therefore stable in
(iteration, pixel, depth) — the property the first-bounce cache and
accumulation logic rely on — without any per-lane hashing.

Exact RNG parity with thrust is impossible (different engines); parity with
the reference is statistical (same distributions, same draw semantics).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def make_key(seed: int) -> jax.Array:
    return jax.random.key(seed)


def iteration_key(base_key: jax.Array, iteration: jax.Array) -> jax.Array:
    """Key for one camera sample (MC iteration)."""
    return jax.random.fold_in(base_key, iteration)


def bounce_key(iter_key: jax.Array, depth) -> jax.Array:
    return jax.random.fold_in(iter_key, depth)


def bounce_uniforms(iter_key: jax.Array, depth, n: int, m: int) -> jnp.ndarray:
    """[n, m] U(0,1) draws for bounce `depth`. m uniforms per ray mirrors the
    reference's fixed per-bounce u01 draw pattern (interactions.h)."""
    return jax.random.uniform(bounce_key(iter_key, depth), (n, m), dtype=jnp.float32)
