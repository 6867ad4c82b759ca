"""Headless render CLI — the oidnRayTracer app (apps/src/main.cpp) minus the
Win32/OpenGL interactive preview (headless every-N-iteration PNG dumps stand
in for the GL window; camera-reset semantics live on Renderer.move_camera).

Usage:
    python -m mygpuraytracer_tpu.apps.raytrace SCENEFILE.txt [options]

Produces the same four outputs as saveImage (main.cpp:115-165):
    <name>.<timestamp>.<N>samp.png    accumulated beauty / N
    <name>.<timestamp>.<N>albedo.png  first-hit albedo AOV
    <name>.<timestamp>.<N>output.png  denoised beauty
    <name>.<timestamp>.<N>input.png   denoiser input (normalized beauty)
with the reference's horizontal mirror (img.setPixel(width-1-x, ...)).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="TPU path tracer")
    p.add_argument("scene", help="scene .txt file or builtin name (cornell, sphere, ...)")
    p.add_argument("--iterations", type=int, default=None, help="override scene ITERATIONS")
    p.add_argument("--depth", type=int, default=None, help="override trace depth")
    p.add_argument("--resolution", type=int, nargs=2, default=None, metavar=("W", "H"))
    p.add_argument("--out-dir", default=".", help="output directory")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--batch", type=int, default=16, help="iterations per device dispatch")
    p.add_argument("--no-denoise", action="store_true", help="disable the AI denoiser")
    p.add_argument("--no-antialias", action="store_true")
    p.add_argument("--depth-of-field", action="store_true")
    p.add_argument("--preview-every", type=int, default=0,
                   help="dump a preview PNG every N iterations (headless 'window')")
    p.add_argument("--save-normal", action="store_true",
                   help="also save the first-hit normal AOV ([-1,1] -> [0,1])")
    p.add_argument("--quiet", action="store_true")
    p.add_argument("--multichip", choices=("off", "sample", "pixels"),
                   default="off",
                   help="render over all visible devices: 'sample' splits "
                        "MC iterations across the mesh (one psum merge), "
                        "'pixels' shards the wavefront+accumulators "
                        "(per-chip memory = N/devices); both match the "
                        "single-device image (tests/test_parallel.py)")
    p.add_argument("--mesh-tier",
                   choices=("lists", "rows", "rows_dma", "conds"),
                   default="rows",
                   help="Pallas mesh kernel variant (docs/MESH_TIERS.md)")
    p.add_argument("--mesh-sort", choices=("auto", "off", "need", "coherence"),
                   default="auto",
                   help="mesh-query reorder before the Pallas tier "
                        "(auto: enabled where measured a win)")
    p.add_argument("--winner-table", choices=("auto", "f32", "f16", "oct"),
                   default="auto",
                   help="deferred winner uv/TBN gather table precision "
                        "(auto: oct on TPU, f32 on CPU): f16 halves the "
                        "per-bounce gather rows vs f32 (measured 1.34x on "
                        "the textured ship, image mean identical to 5 "
                        "digits; uv quantizes ~5e-4 relative); oct further "
                        "packs TBN as 8-bit octahedral pairs (16-byte "
                        "rows, fastest measured: 2.213 vs f16's 2.137 "
                        "Msam/s)")
    p.add_argument("--sort-by-material", action="store_true",
                   help="material-sorted wavefront execution (the "
                        "reference's SORT_BY_MATERIAL compile flag, "
                        "pathtrace.cu:36); image is bit-identical to "
                        "unsorted — BASELINE config #3 measures this path")
    p.add_argument("--sort-impl", choices=("fused", "perm", "argsort"),
                   default="fused",
                   help="sorted-bounce implementation (render/pathtrace.py "
                        "_sort_wavefront): 'fused' = one lean variadic "
                        "lax.sort (6.47 Msam/s measured on config #3); "
                        "'perm'/'argsort' kept for measurement")
    p.add_argument("--megakernel", choices=("auto", "on", "off"),
                   default="auto",
                   help="whole-iteration Pallas megakernel for supported "
                        "scenes (auto: on for the TPU backend); >256-face "
                        "mesh scenes stay on the faster wavefront rows "
                        "tier (the bounce megakernel measured slower and "
                        "is a RenderOptions.bounce_megakernel opt-in)")
    from ..utils.platform import add_platform_flag

    add_platform_flag(p)
    return p.parse_args(argv)


def load_any_scene(name: str):
    from ..scene import load_scene
    from ..scene.builtin import BUILTIN_SCENES

    if os.path.exists(name):
        return load_scene(name)
    if name in BUILTIN_SCENES:
        return BUILTIN_SCENES[name]()
    raise FileNotFoundError(f"scene '{name}' not found (file or builtin)")


def mirror_x(img: np.ndarray) -> np.ndarray:
    """saveImage writes pixel (width-1-x, y) (main.cpp:126)."""
    return np.ascontiguousarray(img[:, ::-1])


def denoise_beauty(beauty: np.ndarray, albedo: np.ndarray, verbose=True):
    """CPUdenoise equivalent (main.cpp:167-218): RT filter, LDR,
    color+albedo; returns (output, timings dict)."""
    from ..denoise import Device

    timings = {}
    t0 = time.perf_counter()
    device = Device()
    device.commit()
    timings["device_init_ms"] = (time.perf_counter() - t0) * 1000

    t0 = time.perf_counter()
    f = device.new_filter("RT")
    f.set_image("color", beauty.astype(np.float32))
    f.set_image("albedo", albedo.astype(np.float32))
    output = np.zeros_like(beauty, np.float32)
    f.set_image("output", output)
    f.commit()
    timings["filter_init_ms"] = (time.perf_counter() - t0) * 1000

    t0 = time.perf_counter()
    f.execute()
    timings["denoise_ms"] = (time.perf_counter() - t0) * 1000
    timings["random_weights"] = f.using_random_weights
    return output, timings


def _render_multichip(r, options, iterations, mode, log) -> int:
    """Render on a mesh over all visible devices into ``r``'s accumulators.

    Returns the number of iterations completed (a remainder that does not
    divide the mesh falls through to the sequential loop). The reference is
    single-GPU (SURVEY.md §2d) — scaling modes are TPU-native additions.
    """
    import jax
    import jax.numpy as jnp

    from ..parallel.mesh import make_mesh
    from ..parallel.sharded import render_multichip_sample, sharded_render_step

    n_dev = len(jax.devices())
    if n_dev < 2:
        log("multichip: single device visible; using the sequential path")
        return 0
    mesh = make_mesh(n_dev)
    if mode == "sample":
        spp = (iterations // n_dev) * n_dev
        if spp == 0:
            return 0
        img, alb, nrm = render_multichip_sample(
            r.dev, r.meta, options, r.base_key, spp, mesh)
        r.image, r.albedo, r.normal = img, alb, nrm
        r.iteration = spp
        log(f"multichip sample-parallel: {spp} iterations over {n_dev} devices")
        return spp
    # pixels: shard the wavefront + accumulators; run ALL iterations here
    w, h = r.meta.resolution
    if (w * h) % n_dev:
        log(f"multichip pixels: {w}x{h} does not divide {n_dev} devices; "
            "using the sequential path")
        return 0
    from jax.sharding import NamedSharding, PartitionSpec as P

    step_fn, make_state = sharded_render_step(r.meta, options, mesh)
    image, albedo, cache = make_state()
    dev_r = jax.device_put(r.dev, NamedSharding(mesh, P()))
    for it in range(1, iterations + 1):
        image, albedo, cache = step_fn(
            dev_r, image, albedo, cache, jnp.int32(it), r.base_key)
    r.image, r.albedo = image, albedo
    r.iteration = iterations
    log(f"multichip pixel-sharded: {iterations} iterations, "
        f"{w * h // n_dev} lanes/device over {n_dev} devices")
    return iterations


def main(argv=None) -> int:
    args = parse_args(argv)
    from ..utils.platform import force_platform

    force_platform(args.platform)
    from ..config import RenderOptions
    from ..render import Renderer
    from ..utils.png import write_png

    scene = load_any_scene(args.scene)
    if args.resolution:
        scene.set_resolution(*args.resolution)
    if args.depth:
        scene.state.trace_depth = args.depth
    iterations = args.iterations if args.iterations is not None else scene.state.iterations

    import jax

    mega = (jax.default_backend() != "cpu" if args.megakernel == "auto"
            else args.megakernel == "on")
    if args.sort_by_material and args.megakernel == "auto":
        # Sorting exists only on the wavefront (the megakernel has no
        # material-order concept); route there so the flag measures what it
        # names rather than silently taking the megakernel.
        mega = False
    elif args.sort_by_material and mega:
        print("warning: --sort-by-material has no effect with "
              "--megakernel on (sorting exists only on the wavefront); "
              "timings will measure the unsorted megakernel", file=sys.stderr)
    options = RenderOptions(
        antialiasing=not args.no_antialias,
        depth_of_field=args.depth_of_field,
        ai_denoise=not args.no_denoise,
        mesh_tier=args.mesh_tier,
        mesh_sort={"auto": None, "off": False}.get(args.mesh_sort,
                                                   args.mesh_sort),
        winner_table=args.winner_table,
        sort_by_material=args.sort_by_material,
        sort_impl=args.sort_impl,
        megakernel=mega,
    )
    log = (lambda *a: None) if args.quiet else print

    log(f"Loaded scene: {scene.state.image_name} "
        f"{scene.state.camera.resolution[0]}x{scene.state.camera.resolution[1]}, "
        f"{len(scene.geoms)} geoms, {len(scene.materials)} materials")
    r = Renderer(scene, options, seed=args.seed)

    start_str = time.strftime("%Y-%m-%d_%H-%M-%S")
    os.makedirs(args.out_dir, exist_ok=True)

    t0 = time.perf_counter()
    done = 0
    if args.multichip != "off":
        # r.options, not the local options: the Renderer resolved the "auto"
        # knobs (winner_table, mesh tier) and the sharded render path
        # requires resolved values (ops/trace._winner_ex rejects "auto").
        done = _render_multichip(r, r.options, iterations, args.multichip, log)
    while done < iterations:
        n = min(args.batch, iterations - done)
        r.step_many(n)
        done += n
        if args.preview_every and done % args.preview_every < n:
            write_png(
                os.path.join(args.out_dir, f"{scene.state.image_name}.preview.png"),
                mirror_x(r.beauty()),
            )
        if not args.quiet:
            print(f"\rIteration {done}/{iterations}", end="", flush=True)
    beauty = r.beauty()  # forces sync
    render_s = time.perf_counter() - t0
    log(f"\ntime: {render_s:.3f}s "
        f"({done / render_s:.1f} iters/s, "
        f"{np.prod(beauty.shape[:2]) * done / render_s / 1e6:.1f} Msamples/s)")

    albedo = r.albedo_image()
    prefix = os.path.join(args.out_dir, f"{scene.state.image_name}.{start_str}.{done}")
    write_png(f"{prefix}samp.png", mirror_x(beauty))
    write_png(f"{prefix}albedo.png", mirror_x(albedo))
    write_png(f"{prefix}input.png", mirror_x(beauty))
    if args.save_normal:
        write_png(f"{prefix}normal.png", mirror_x(r.normal_image() * 0.5 + 0.5))

    if options.ai_denoise:
        output, tm = denoise_beauty(beauty, albedo, verbose=not args.quiet)
        log(f"Denoise: device={tm['device_init_ms']:.1f}ms "
            f"filter={tm['filter_init_ms']:.1f}ms exec={tm['denoise_ms']:.1f}ms"
            + (" [RANDOM WEIGHTS — provide real .tza for quality]" if tm["random_weights"] else ""))
        write_png(f"{prefix}output.png", mirror_x(output))
    log(f"Saved outputs: {prefix}*.png")
    return 0


if __name__ == "__main__":
    sys.exit(main())
