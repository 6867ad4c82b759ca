"""Multi-chip rendering over a jax.sharding.Mesh.

The reference is single-GPU (SURVEY.md §2d: no distributed rendering exists);
its only scaling mechanism is OIDN's overlapped spatial tiling. The TPU
framework scales two ways:

1. **Sample-parallel** (render_multichip_sample): every chip renders disjoint
   MC iterations of the full image; one ``psum`` over ICI merges the
   accumulators. Embarrassingly parallel — the multi-chip mode of choice for
   offline rendering throughput.

2. **Pixel-sharded** (sharded_render_step): the flat wavefront (and the
   accumulator image) is sharded across chips and XLA partitions the whole
   trace program automatically — per-chip memory scales as N/devices, the
   mode of choice when one image exceeds a chip's HBM. The scene stays
   replicated; no collectives appear in the bounce loop because path tracing
   is per-lane independent (XLA inserts only the initial broadcast).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import RenderOptions
from ..ops.vec3 import Vec3
from ..render.pathtrace import make_empty_cache, render_sample
from ..scene.device_scene import DeviceScene, SceneMeta


def render_multichip_sample(
    dev: DeviceScene,
    meta: SceneMeta,
    options: RenderOptions,
    base_key,
    spp: int,
    mesh: Mesh,
):
    """Render ``spp`` samples split across the mesh; returns (image Vec3
    [N] triples summed over devices, albedo Vec3).

    Per-device iteration indices are disjoint (device d renders iterations
    d*spp/D+1 ...), so the RNG streams match a sequential render's first
    spp iterations exactly. The first-bounce cache is per-device and only
    valid when AA/DoF keep primary rays deterministic (same rule as the
    reference, pathtrace.cu:586).
    """
    n_dev = mesh.devices.size
    axis = mesh.axis_names[0]
    per_dev = spp // n_dev
    if per_dev * n_dev != spp:
        raise ValueError(f"spp {spp} must divide evenly over {n_dev} devices")
    width, height = meta.resolution
    n = width * height

    @functools.partial(
        jax.shard_map, mesh=mesh, in_specs=(P(),), out_specs=(P(), P(), P())
    )
    def shard_fn(dev_rep):
        didx = lax.axis_index(axis)
        cache = make_empty_cache(n)

        def first_sel(first, new, old):
            return Vec3(
                jnp.where(first, new.x, old.x),
                jnp.where(first, new.y, old.y),
                jnp.where(first, new.z, old.z),
            )

        def body(i, carry):
            img, alb, nrm, cache = carry
            iteration = didx * per_dev + i + 1
            out = render_sample(dev_rep, meta, options, iteration, base_key, cache)
            img = Vec3(img.x + out.color.x, img.y + out.color.y, img.z + out.color.z)
            first = iteration == 1
            alb = first_sel(first, out.albedo, alb)
            nrm = first_sel(first, out.normal, nrm)
            return img, alb, nrm, out.cache

        # pcast-to-varying: the carry becomes device-varying inside the loop
        # (it depends on axis_index), so the init must be marked varying over
        # 'dp' too (pvary was deprecated in favor of pcast in jax 0.9).
        vary = lambda a: lax.pcast(a, axis, to="varying")
        z = lambda: vary(jnp.zeros((n,), jnp.float32))
        img = Vec3(z(), z(), z())
        alb = Vec3(z(), z(), z())
        nrm = Vec3(z(), z(), z())
        cache = jax.tree.map(vary, cache)
        img, alb, nrm, _ = lax.fori_loop(0, per_dev, body, (img, alb, nrm, cache))
        img = jax.tree.map(lambda a: lax.psum(a, axis), img)
        alb = jax.tree.map(lambda a: lax.psum(a, axis), alb)
        nrm = jax.tree.map(lambda a: lax.psum(a, axis), nrm)
        return img, alb, nrm

    return shard_fn(dev)


def sharded_render_step(meta: SceneMeta, options: RenderOptions, mesh: Mesh):
    """Build a pixel-sharded single-iteration step.

    Returns (step_fn, make_state): ``step_fn(dev, image, albedo, cache,
    iteration, key)`` with image/albedo/cache sharded over the mesh axis and
    the scene replicated. XLA partitions raygen, the bounce loop, and the
    accumulator update; per-chip memory is N/devices.
    """
    axis = mesh.axis_names[0]
    width, height = meta.resolution
    n = width * height
    if n % mesh.devices.size:
        raise ValueError("pixel count must divide the mesh size")

    sharded = NamedSharding(mesh, P(axis))
    replicated = NamedSharding(mesh, P())

    def make_state():
        z = lambda: jax.device_put(jnp.zeros((n,), jnp.float32), sharded)
        image = Vec3(z(), z(), z())
        albedo = Vec3(z(), z(), z())
        cache = jax.tree.map(lambda a: jax.device_put(a, sharded), make_empty_cache(n))
        return image, albedo, cache

    @functools.partial(jax.jit, donate_argnums=(1, 2, 3))
    def step_fn(dev, image, albedo, cache, iteration, key):
        out = render_sample(dev, meta, options, iteration, key, cache)
        image = Vec3(image.x + out.color.x, image.y + out.color.y, image.z + out.color.z)
        first = iteration == 1
        albedo = Vec3(
            jnp.where(first, out.albedo.x, albedo.x),
            jnp.where(first, out.albedo.y, albedo.y),
            jnp.where(first, out.albedo.z, albedo.z),
        )
        return image, albedo, out.cache

    return step_fn, make_state
