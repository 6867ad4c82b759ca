"""Benchmark suite — oidnBenchmark parity plus renderer benchmarks.

Denoise matrix (apps/oidnBenchmark.cpp:97-210): RT hdr/ldr + alb + nrm at
1920x1080, 3840x2160, 1280x720; RTLightmap hdr at 2048^2, 4096^2, 1024^2 —
random-filled images, 1 warmup + timed runs, msec/image.

Renderer matrix: the five BASELINE.md configs (cornell 16spp, glass+sphere,
DoF/cache/sort wavefront, OBJ mesh, full pipeline + denoise).
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


DENOISE_MATRIX = [
    ("RT.hdr_alb_nrm", "RT", dict(hdr=True), (1920, 1080)),
    ("RT.ldr_alb_nrm", "RT", dict(hdr=False), (1920, 1080)),
    ("RT.hdr_alb_nrm", "RT", dict(hdr=True), (3840, 2160)),
    ("RT.ldr_alb_nrm", "RT", dict(hdr=False), (3840, 2160)),
    ("RT.hdr_alb_nrm", "RT", dict(hdr=True), (1280, 720)),
    ("RT.ldr_alb_nrm", "RT", dict(hdr=False), (1280, 720)),
    ("RTLightmap.hdr", "RTLightmap", dict(), (2048, 2048)),
    ("RTLightmap.hdr", "RTLightmap", dict(), (4096, 4096)),
    ("RTLightmap.hdr", "RTLightmap", dict(), (1024, 1024)),
]


def bench_denoise(runs: int = 4, sizes=None, json_out=False):
    from ..denoise import Device

    device = Device()
    device.commit()
    rng = np.random.default_rng(0)
    results = []
    for name, kind, params, (w, h) in DENOISE_MATRIX:
        if sizes and (w, h) not in sizes:
            continue
        f = device.new_filter(kind)
        color = rng.random((h, w, 3), np.float32)
        f.set_image("color", color)
        if kind == "RT":
            f.set_image("albedo", rng.random((h, w, 3), np.float32))
            f.set_image("normal", rng.random((h, w, 3), np.float32) * 2 - 1)
            for k, v in params.items():
                f.set(k, v)
        out = np.zeros((h, w, 3), np.float32)
        f.set_image("output", out)
        f.set("inputScale", 1.0)
        f.commit()
        f.execute()  # warmup (compile)
        t0 = time.perf_counter()
        for _ in range(runs):
            f.execute()
        ms = 1000 * (time.perf_counter() - t0) / runs
        results.append({"bench": f"{name}.{w}x{h}", "msec_per_image": round(ms, 2)})
        if not json_out:
            print(f"{name:>22s} {w:>4d}x{h:<4d}: {ms:8.2f} msec/image", flush=True)
    return results


RENDER_CONFIGS = [
    # (name, scene, spp, options overrides)
    ("cornell_16spp", "cornell.txt", 16, {}),
    ("cornellGlass_16spp", "cornellGlass.txt", 16, {}),
    ("sphere_16spp", "sphere.txt", 16, {}),
    # Forces the wavefront path (megakernel=False): material-sorted execution
    # only exists there — the megakernel's register-resident lanes have no
    # memory order to sort.
    ("cornell_dof_cache_sort", "cornell.txt", 16,
     dict(depth_of_field=True, cache_first_bounce=True, sort_by_material=True,
          antialiasing=False, megakernel=False)),
    ("cornellObj_16spp", "cornellObj.txt", 16, {}),
]


def bench_render(scene_dir: str, spp_scale: int = 1, json_out=False):
    import os

    import jax

    from ..config import RenderOptions
    from ..render import Renderer
    from ..scene import load_scene
    from ..scene.builtin import BUILTIN_SCENES

    on_tpu = jax.default_backend() != "cpu"
    results = []
    for name, scene_file, spp, opts in RENDER_CONFIGS:
        path = os.path.join(scene_dir, scene_file)
        if os.path.exists(path):
            scene = load_scene(path)
        else:
            base = scene_file.replace(".txt", "")
            if base not in BUILTIN_SCENES:
                continue
            scene = BUILTIN_SCENES[base]()
        spp *= spp_scale
        r = Renderer(scene, RenderOptions(**{"megakernel": on_tpu, **opts}), seed=0)
        r.step_many(2)
        np.asarray(r.image.x[:4])  # compile+warmup sync
        r.reset()
        # Accumulate batches until >= 1.5s so per-dispatch sync latency
        # doesn't dominate fast configs.
        total_iters, total_time = 0, 0.0
        while total_time < 1.5 and total_iters < 16 * spp:
            t0 = time.perf_counter()
            r.step_many(spp)
            np.asarray(r.image.x[:4])
            total_time += time.perf_counter() - t0
            total_iters += spp
        w, h = r.meta.resolution
        ms = w * h * total_iters / total_time / 1e6
        results.append(
            {
                "bench": name,
                "msamples_per_sec": round(ms, 2),
                "iters_per_sec": round(total_iters / total_time, 2),
            }
        )
        if not json_out:
            print(
                f"{name:>24s}: {ms:8.2f} Msamples/s "
                f"({total_iters / total_time:6.1f} iters/s)",
                flush=True,
            )
    return results


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description="benchmark suite")
    p.add_argument("--mode", choices=["render", "denoise", "all"], default="all")
    p.add_argument("--runs", type=int, default=4)
    p.add_argument("--scene-dir", default="/root/reference/scenes")
    p.add_argument("--json", action="store_true")
    from ..utils.platform import add_platform_flag, force_platform

    add_platform_flag(p)
    args = p.parse_args(argv)
    force_platform(args.platform)
    results = []
    if args.mode in ("render", "all"):
        results += bench_render(args.scene_dir, json_out=args.json)
    if args.mode in ("denoise", "all"):
        results += bench_denoise(args.runs, json_out=args.json)
    if args.json:
        print(json.dumps(results))
    return 0


if __name__ == "__main__":
    sys.exit(main())
