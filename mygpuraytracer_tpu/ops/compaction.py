"""Stream compaction & material sort with static shapes.

TPU-native equivalents of the reference's stream_compaction/ library
(efficient.cu map->scan->scatter, naive.cu, thrust wrappers) and the render
loop's thrust::stable_partition / sort_by_key calls (pathtrace.cu:590,612,649).

On TPU, buffers cannot shrink: ``compact`` returns a full-size buffer with
live elements packed to the front plus a live count, exactly the
"fixed-size buffers + live-count scalar" design from SURVEY.md §7. The render
loop itself defaults to masked-lane execution (dead lanes idle) because a
gather/scatter pass per bounce costs more HBM traffic than it saves in a
closed scene; these primitives are provided for parity, tests, and workloads
with high early-termination rates.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def exclusive_scan(x: jnp.ndarray) -> jnp.ndarray:
    """Exclusive prefix sum — semantic equivalent of the Blelloch
    up/down-sweep in efficient.cu:35-113 (XLA lowers cumsum to a parallel
    scan on its own; no hand-written tree needed)."""
    c = jnp.cumsum(x, axis=0)
    return c - x


def compact(mask: jnp.ndarray, *arrays: jnp.ndarray):
    """Pack elements where ``mask`` to the front of each array (stable).

    Returns (count, packed_arrays...). Trailing slots hold the (stable)
    failing elements — i.e. this is thrust::stable_partition
    (pathtrace.cu:649), which the reference uses rather than dropping them.
    """
    mask = mask.astype(jnp.int32)
    count = jnp.sum(mask)
    n = mask.shape[0]
    live_pos = exclusive_scan(mask)  # position among live
    dead_pos = exclusive_scan(1 - mask)  # position among dead
    dest = jnp.where(mask == 1, live_pos, count + dead_pos)
    perm = jnp.zeros(n, jnp.int32).at[dest].set(jnp.arange(n, dtype=jnp.int32))
    packed = tuple(a[perm] for a in arrays)
    return (count, *packed)


def sort_by_material_key(material_id: jnp.ndarray, *arrays: jnp.ndarray):
    """Stable sort of wavefront arrays by DESCENDING material id.

    Equivalent of thrust::sort_by_key with sortByMaterial comparator
    (pathtrace.cu:512-516,590,612). Descending order is matched by sorting
    the negated key.

    One VARIADIC ``lax.sort`` co-sorts every operand through a single fused
    comparator network. The previous argsort-then-take form paid one full
    per-index gather PER ARRAY (~10 ms each at 640k lanes on this TPU —
    docs/MESH_TIERS.md "per-bounce gathers"), which made the
    sorted-wavefront BASELINE config ~370x slower than unsorted.
    """
    out = lax_sort_by_neg_key(-material_id, arrays)
    return (-out[0], *out[1:])


def lax_sort_by_neg_key(neg_key: jnp.ndarray, arrays):
    """Fused variadic stable sort: co-sorts ``arrays`` by ascending
    ``neg_key`` in one XLA sort op (no materialized permutation gathers)."""
    return jax.lax.sort((neg_key, *arrays), num_keys=1, is_stable=True)


def material_sort_perm(material_id: jnp.ndarray, num_materials: int):
    """Stable DESCENDING-material permutation via counting sort.

    Returns ``perm`` with ``sorted[i] = orig[perm[i]]`` — identical to
    ``jnp.argsort(-material_id, stable=True)`` but built from
    ``num_materials`` cumsum passes + one inverse-permutation scatter
    instead of a full bitonic argsort (which XLA lowers to on TPU).
    Material ids are dense geom-material indices in ``[0, num_materials)``
    with misses at 0 (ops/trace.py), so the bucket loop is static.
    """
    n = material_id.shape[0]
    dest = jnp.zeros(n, jnp.int32)
    offset = jnp.int32(0)
    for m in range(num_materials - 1, -1, -1):
        is_m = material_id == m
        im = is_m.astype(jnp.int32)
        rank = exclusive_scan(im)
        dest = jnp.where(is_m, offset + rank, dest)
        offset = offset + jnp.sum(im)
    return jnp.zeros(n, jnp.int32).at[dest].set(jnp.arange(n, dtype=jnp.int32))
