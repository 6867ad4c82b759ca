"""Stateful render orchestration.

Host-side equivalent of pathtraceInit/pathtrace/pathtraceFree + the runCuda
accumulation protocol (apps/src/pathtrace.cu:130-223,527-671;
apps/src/main.cpp:221-281): owns the accumulator image, albedo AOV,
first-bounce cache and the iteration counter; camera moves reset the
accumulator (main.cpp:222-248).

All per-iteration work — raygen, the bounce loop, the pi-weighted gather and
the accumulator update — runs inside ONE jit with the accumulators donated.
``step_many`` additionally folds a whole batch of iterations into a single
device program (traced loop bound: one compile serves any sample count),
which matters when the host<->device link has per-dispatch latency. The
reference instead copies the full image GPU->host every frame
(pathtrace.cu:663-669).
"""

from __future__ import annotations

import dataclasses
import functools

import numpy as np

import jax
import jax.numpy as jnp

from ..config import RenderOptions
from ..ops.vec3 import Vec3
from ..scene.device_scene import build_device_scene, camera_params
from ..scene.structs import GeomType, Scene
from ..utils.timer import PerformanceTimer
from .pathtrace import make_empty_cache, render_sample


def mesh_reach_fraction(scene: Scene, meta, grid: int = 64) -> float:
    """Host-side bounce-0 estimate of the fraction of camera rays that can
    reach any OBJ-mesh AABB (numpy replica of generate_camera_rays pixel
    centers + the aabb_hit_soa slab test; no device work, no compiles).

    Drives the ``mesh_sort`` auto mode: when most primary rays can't reach
    the mesh ("embedded" scenes like cornellShip), the need-partition
    concentrates the reaching minority into dense blocks and is a measured
    ~1.5x win; when the mesh fills the view it is a slight loss
    (docs/MESH_TIERS.md)."""
    cam = scene.state.camera
    w, h = meta.resolution
    xs = (np.arange(grid, dtype=np.float32) + 0.5) * (w / grid)
    ys = (np.arange(grid, dtype=np.float32) + 0.5) * (h / grid)
    x, y = np.meshgrid(xs, ys)
    sx = np.float32(cam.pixel_length[0]) * (x - w * 0.5)
    sy = np.float32(cam.pixel_length[1]) * (y - h * 0.5)
    view = np.asarray(cam.view, np.float32)
    right = np.asarray(cam.right, np.float32)
    up = np.asarray(cam.up, np.float32)
    pos = np.asarray(cam.position, np.float32)
    d = view[None, None] - right[None, None] * sx[..., None] - up[None, None] * sy[..., None]
    mask = np.zeros(x.shape, bool)
    for g in meta.geoms:
        if g.type != int(GeomType.OBJ) or g.face_count <= 0:
            continue
        bmin = np.asarray(g.aabb_min, np.float32)
        bmax = np.asarray(g.aabb_max, np.float32)
        da = np.where(np.abs(d) < 1e-20, 1e-20, d)
        t1 = (bmin[None, None] - pos[None, None]) / da
        t2 = (bmax[None, None] - pos[None, None]) / da
        tmin = np.minimum(t1, t2).max(axis=-1)
        tmax = np.maximum(t1, t2).min(axis=-1)
        mask |= (tmax >= tmin) & (tmax > 0)
    return float(mask.mean())


def _resolve_auto_options(options: RenderOptions, scene: Scene, meta) -> RenderOptions:
    """Resolve mesh_sort=None (auto) ONCE at Renderer construction.

    'need' is enabled only where it measured a win: TPU backend, cluster-BVH
    Pallas tier active, and an EMBEDDED mesh — bounce-0 reach < 30% AND an
    enclosing primitive environment (>= 4 non-OBJ geoms, e.g. cornell
    walls) that keeps non-mesh rays alive past the first miss. Mesh-only
    scenes fail that second test: their misses terminate, so the alive
    wavefront is all mesh rays and the partition only adds sort cost
    (measured loss on shipOnly, docs/MESH_TIERS.md). The decision is
    pinned at init — flipping it on camera moves would retrace and
    recompile the render program (minutes through the TPU tunnel)."""
    if options.mesh_sort is not None:
        return options
    use: bool | str = False
    pallas = options.mesh_pallas
    if pallas is None:
        pallas = jax.default_backend() != "cpu"
    n_prim = sum(1 for g in meta.geoms if g.type != int(GeomType.OBJ))
    if (
        pallas
        and meta.has_obj
        and bool(meta.mesh_clusters)
        and meta.num_faces > 256
        and n_prim >= 4
        and mesh_reach_fraction(scene, meta) < 0.30
    ):
        use = "need"
    return dataclasses.replace(options, mesh_sort=use)


def _resolve_winner_table(options: RenderOptions) -> RenderOptions:
    """winner_table="auto": oct on TPU, f32 on CPU.

    Deferred winner uv/TBN gather rows, measured on shipTexOnly 800^2:
    f32 48-byte rows 1.60 Msam/s -> f16 24-byte 2.137 -> oct 16-byte
    2.213 (same-session control, probe_winner_oct.py 2026-08-19; t/hit
    bitwise identical by construction for all three, oct-vs-f16 image
    mean drift 6e-6 from the ~1-deg octahedral TBN quantization of
    bump-mapped shading normals — docs/MESH_TIERS.md "winner_table").
    CPU keeps exact f32 so committed goldens are platform-stable."""
    if options.winner_table != "auto":
        return options
    use = "oct" if jax.default_backend() != "cpu" else "f32"
    return dataclasses.replace(options, winner_table=use)


def _first_select(first, new: Vec3, old: Vec3) -> Vec3:
    return Vec3(
        jnp.where(first, new.x, old.x),
        jnp.where(first, new.y, old.y),
        jnp.where(first, new.z, old.z),
    )


def _accumulate(image: Vec3, albedo_acc: Vec3, normal_acc: Vec3, dir_acc, out, iteration):
    image = Vec3(image.x + out.color.x, image.y + out.color.y, image.z + out.color.z)
    first = iteration == 1
    albedo_acc = _first_select(first, out.albedo, albedo_acc)
    normal_acc = _first_select(first, out.normal, normal_acc)
    if out.dirmap is not None:
        dm, dl = dir_acc
        dir_acc = (
            Vec3(dm.x + out.dirmap.x, dm.y + out.dirmap.y, dm.z + out.dirmap.z),
            dl + out.dirlum,
        )
    return image, albedo_acc, normal_acc, dir_acc


@functools.partial(
    jax.jit,
    static_argnames=("meta", "options"),
    donate_argnames=("image", "albedo_acc", "normal_acc", "dir_acc", "cache"),
)
def _iteration_step(
    dev, meta, options, image, albedo_acc, normal_acc, dir_acc, cache,
    iteration, base_key,
):
    out = render_sample(dev, meta, options, iteration, base_key, cache)
    image, albedo_acc, normal_acc, dir_acc = _accumulate(
        image, albedo_acc, normal_acc, dir_acc, out, iteration
    )
    return image, albedo_acc, normal_acc, dir_acc, out.cache


@functools.partial(
    jax.jit,
    static_argnames=("meta", "options"),
    donate_argnames=("image", "albedo_acc", "normal_acc", "dir_acc", "cache"),
)
def _multi_step(
    dev, meta, options, image, albedo_acc, normal_acc, dir_acc, cache,
    start_iteration, num_iters, base_key,
):
    if options.megakernel and not options.dir_aov:
        from .megakernel import (
            _uses_bvh,
            bvh_bounce_accumulate,
            megakernel_accumulate,
            supports_megakernel,
        )

        if supports_megakernel(meta, options):
            if _uses_bvh(meta):
                # Large-mesh scenes: the bounce megakernel (in-kernel
                # near-to-far cluster walk + shade fused; raygen/iteration
                # loop in XLA — the fully fused form trips a Mosaic CHECK,
                # docs/MESH_TIERS.md). The walk streams the sublane-shifted
                # face buffer; the conds debug escape streams plane form.
                from .megakernel import bounce_face_buffer

                fb = bounce_face_buffer(dev)
                image, albedo_acc, normal_acc = bvh_bounce_accumulate(
                    meta, options, dev.camera, fb,
                    image, albedo_acc, normal_acc,
                    start_iteration, num_iters, base_key,
                )
            else:
                # The whole batch accumulates inside ONE kernel.
                image, albedo_acc, normal_acc = megakernel_accumulate(
                    meta, options, dev.camera, dev.face_plane,
                    image, albedo_acc, normal_acc,
                    start_iteration, num_iters, base_key,
                )
            return image, albedo_acc, normal_acc, dir_acc, cache

    def body(i, carry):
        image, albedo_acc, normal_acc, dir_acc, cache = carry
        iteration = start_iteration + i
        out = render_sample(dev, meta, options, iteration, base_key, cache)
        image, albedo_acc, normal_acc, dir_acc = _accumulate(
            image, albedo_acc, normal_acc, dir_acc, out, iteration
        )
        return (image, albedo_acc, normal_acc, dir_acc, out.cache)

    return jax.lax.fori_loop(
        0, num_iters, body, (image, albedo_acc, normal_acc, dir_acc, cache)
    )


class Renderer:
    """One scene bound to device buffers; call step()/step_many()/render()."""

    def __init__(self, scene: Scene, options: RenderOptions | None = None, seed: int = 0):
        self.scene = scene
        self.options = options or RenderOptions()
        self.dev, self.meta = build_device_scene(scene, self.options.face_chunk)
        self.options = _resolve_auto_options(self.options, scene, self.meta)
        self.options = _resolve_winner_table(self.options)
        self.base_key = jax.random.key(seed)
        self.timer = PerformanceTimer()
        self.reset()

    # -- lifecycle (pathtraceInit/Free analog) --------------------------------
    def reset(self) -> None:
        """Zero accumulators and iteration counter (camera-move semantics)."""
        w, h = self.meta.resolution
        n = w * h
        # Distinct buffers per field: donated args must not alias.
        zeros = lambda: jnp.zeros((n,), jnp.float32)
        self.image = Vec3(zeros(), zeros(), zeros())
        self.albedo = Vec3(zeros(), zeros(), zeros())
        self.normal = Vec3(zeros(), zeros(), zeros())
        self.dir_acc = (Vec3(zeros(), zeros(), zeros()), zeros())
        self.cache = make_empty_cache(n)
        self.iteration = 0

    def move_camera(self, position=None, look_at=None) -> None:
        """Update the camera and reset accumulation (main.cpp:222-248)."""
        cam = self.scene.state.camera
        if position is not None:
            cam.position = np.asarray(position, np.float32)
        if look_at is not None:
            cam.look_at = np.asarray(look_at, np.float32)
        cam.rebuild()
        self.dev = self.dev._replace(camera=camera_params(cam))
        self.reset()

    # -- iteration ------------------------------------------------------------
    def step(self) -> int:
        """Run one MC iteration; returns the new iteration count."""
        self.iteration += 1
        self.image, self.albedo, self.normal, self.dir_acc, self.cache = _iteration_step(
            self.dev,
            self.meta,
            self.options,
            self.image,
            self.albedo,
            self.normal,
            self.dir_acc,
            self.cache,
            jnp.int32(self.iteration),
            self.base_key,
        )
        return self.iteration

    def step_many(self, num_iters: int) -> int:
        """Run ``num_iters`` MC iterations in one device dispatch."""
        self.image, self.albedo, self.normal, self.dir_acc, self.cache = _multi_step(
            self.dev,
            self.meta,
            self.options,
            self.image,
            self.albedo,
            self.normal,
            self.dir_acc,
            self.cache,
            jnp.int32(self.iteration + 1),
            jnp.int32(num_iters),
            self.base_key,
        )
        self.iteration += num_iters
        return self.iteration

    def render(
        self, iterations: int | None = None, progress=None, batch: int = 16
    ) -> np.ndarray:
        """Run ``iterations`` samples (default: the scene's ITERATIONS) and
        return the normalized beauty image HxWx3.

        Iterations are dispatched in device-side batches; ``progress`` (the
        cooperative-cancel callback, cf. oidnDenoise progress monitor) is
        polled between batches.
        """
        total = iterations if iterations is not None else self.meta.iterations
        self.timer.start()
        done = 0
        while done < total:
            n = min(batch, total - done)
            self.step_many(n)
            done += n
            if progress is not None and not progress(done / total):
                break
        self.timer.end(sync=self.image.x)
        return self.beauty()

    def render_denoised(
        self, iterations: int | None = None, batch: int = 16,
        slot: str = "rt_ldr_alb",
    ) -> tuple[np.ndarray, np.ndarray]:
        """Render then denoise fully on-device (no host round trip).

        Returns (denoised HxWx3, beauty HxWx3). Equivalent of the app loop's
        pathtrace + CPUdenoise, minus the reference's per-frame
        GPU->CPU->GPU copies. ``slot`` selects the filter weights; a
        ``*_nrm`` slot feeds the first-hit normal AOV as the third feature
        and an ``rt_hdr*`` slot switches the packing to the HDR pipeline
        (autoexposure + PU transfer, unclamped radiance out).
        """
        from .denoise_fused import denoise_accumulator, load_denoiser_params

        self.render(iterations=iterations, batch=batch)
        params, self.denoiser_random_weights = load_denoiser_params(slot)
        out = denoise_accumulator(
            self.image,
            self.albedo,
            jnp.int32(self.iteration),
            params,
            self.meta.resolution,
            normal=self.normal if slot.endswith("_nrm") else None,
            hdr=slot.startswith("rt_hdr"),
        )
        return np.asarray(out), self.beauty()

    # -- outputs ----------------------------------------------------------------
    def _to_hw3(self, flat: Vec3) -> np.ndarray:
        w, h = self.meta.resolution
        arr = np.stack(
            [np.asarray(flat.x), np.asarray(flat.y), np.asarray(flat.z)], axis=-1
        )
        return arr.reshape(h, w, 3)

    def beauty(self) -> np.ndarray:
        """Accumulated image / iteration count (sendImageToPBO semantics)."""
        it = max(self.iteration, 1)
        img = self._to_hw3(self.image)
        return img / it

    def albedo_image(self) -> np.ndarray:
        return self._to_hw3(self.albedo)

    def normal_image(self) -> np.ndarray:
        """First-hit shading normals in [-1,1] (AOV the reference lacks;
        feeds OIDN's alb+nrm quality tier)."""
        return self._to_hw3(self.normal)

    def dir_image(self) -> np.ndarray:
        """Normalized SH-L1 directional lightmap in [-1,1] (options.dir_aov):
        luminance-weighted mean first-bounce incident direction per pixel —
        the RTLightmap directional filter's input (core/unet.cpp:744-763)."""
        dm, dl = self.dir_acc
        w = np.maximum(np.asarray(dl), 1e-8)[:, None]
        arr = np.stack([np.asarray(dm.x), np.asarray(dm.y), np.asarray(dm.z)], -1) / w
        wdt, h = self.meta.resolution
        return np.clip(arr.reshape(h, wdt, 3), -1.0, 1.0)

    def raw_accumulator(self) -> np.ndarray:
        return self._to_hw3(self.image)
