"""Framework benchmark — prints ONE JSON line for the driver.

Covers all five BASELINE.md configs plus the denoiser metrics:
  - value/unit: Msamples/sec path-tracing scenes/cornellObj.txt at the
    canonical 800x800 depth-8 workload (the north-star scene; >= 50 target);
  - cornell / cornellGlass / cornell_dof_cache_sort / ship23k
    Msamples/sec: the other four BASELINE configs (#1-#4);
  - denoise_ms_per_frame: fused on-device render->denoise (rt_ldr_alb,
    albedo-guided) U-Net execute time at 800x800;
  - rmse_{ldr,raw}_denoised_16spp_vs_own_16kspp: RMSE of the denoised
    16 spp cornell render against the framework's own 16384 spp converged
    render (the 1e-2 bar; no CUDA machine exists here, so the own converged
    render stands in for the CUDA reference — the key name says so);
  - denoise9_ms_per_frame / rmse_ldr_denoised9_...: same measurements for
    the 9-channel normal-guided slot (rt_ldr_alb_nrm, the stronger slot
    since round 3) under separate keys so the 6-channel trend stays
    comparable across rounds.

Timing excludes compilation and uses explicit device->host syncs; samples
are dispatched as one device program per batch.
"""

import json
import os
import sys
import time

import numpy as np


REPO_DIR = os.path.dirname(os.path.abspath(__file__))


def _bench_scene(scene, megakernel, min_time=2.0, max_iters=1024, batch=128,
                 **opts):
    from mygpuraytracer_tpu.config import RenderOptions
    from mygpuraytracer_tpu.render import Renderer

    r = Renderer(scene, RenderOptions(megakernel=megakernel, **opts), seed=0)

    def sync():
        np.asarray(r.image.x[:8])

    r.step_many(4)
    sync()
    width, height = r.meta.resolution
    # Calibrate with one synced batch, then time K batches dispatched
    # back-to-back with ONE final sync: every host<->device sync through
    # the axon tunnel costs ~34 ms of latency, so per-batch syncs inflate
    # fast configs by 10-20%. Each program stays bounded (<= batch iters)
    # under the TPU worker's ~60 s watchdog.
    t0 = time.perf_counter()
    r.step_many(batch)
    sync()
    dt1 = time.perf_counter() - t0
    k = max(1, min(int(min_time / max(dt1, 1e-9)) + 1, max_iters // batch))
    t0 = time.perf_counter()
    for _ in range(k):
        r.step_many(batch)
    sync()
    total_time = time.perf_counter() - t0
    ms = width * height * k * batch / total_time / 1e6
    return r, ms


def main() -> None:
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

    from mygpuraytracer_tpu.render import Renderer
    from mygpuraytracer_tpu.config import RenderOptions
    from mygpuraytracer_tpu.scene import load_scene
    from mygpuraytracer_tpu.scene.builtin import cornell_box

    import jax

    on_tpu = jax.default_backend() != "cpu"
    ref_scenes = "/root/reference/scenes"

    def get_scene(name):
        path = os.path.join(ref_scenes, name)
        if os.path.exists(path):
            return load_scene(path)
        return cornell_box()

    # ---- 1. cornellObj (north-star scene) + cornell Msamples/s -------------
    robj, ms_obj = _bench_scene(get_scene("cornellObj.txt"), on_tpu)
    img_obj = robj.beauty()
    rc, ms_cornell = _bench_scene(get_scene("cornell.txt"), on_tpu)

    # ---- 1a. remaining BASELINE configs: glass/Fresnel (#2) and the
    # DoF + first-bounce-cache + sort-by-material wavefront path (#3) --------
    glass_ms = dof_ms = None
    try:
        from mygpuraytracer_tpu.scene.builtin import cornell_glass

        glass_path = os.path.join(ref_scenes, "cornellGlass.txt")
        glass = (load_scene(glass_path) if os.path.exists(glass_path)
                 else cornell_glass())
        _, glass_ms = _bench_scene(glass, on_tpu)
    except Exception as e:
        print(f"glass bench failed: {e}", file=sys.stderr)
    try:
        # batch=4: the sorted wavefront costs ~1 s/iter at 800^2 (the
        # per-bounce argsort+gathers dominate) — a 128-iteration program
        # blows the TPU worker's ~60 s runtime watchdog and CRASHES the
        # worker, nulling every later metric (reproduced twice 2026-08-18).
        _, dof_ms = _bench_scene(
            get_scene("cornell.txt"), megakernel=False,
            depth_of_field=True, cache_first_bounce=True,
            sort_by_material=True, antialiasing=False,
            min_time=4.0, max_iters=32, batch=4,
        )
    except Exception as e:
        print(f"dof bench failed: {e}", file=sys.stderr)

    # ---- 1b. 23k-face mesh via the wavefront cluster-BVH Pallas tier --------
    # (honest number: far below the primitive-scene tiers; docs/MESH_TIERS.md.
    # batch 8 keeps each program under the TPU worker's runtime watchdog.)
    ship_ms = None
    try:
        ship_path = os.path.join(REPO_DIR, "scenes/shipOnly.txt")
        if os.path.exists(ship_path):
            ship = load_scene(ship_path)  # canonical 800x800 workload
            _, ship_ms = _bench_scene(
                ship, megakernel=False, min_time=4.0, max_iters=32, batch=4
            )
        else:
            print(f"ship bench skipped: {ship_path} not found", file=sys.stderr)
    except Exception as e:
        print(f"ship bench failed: {e}", file=sys.stderr)

    # textured+bumped 23k-face ship — BASELINE config #4's actual workload
    # ("mesh + kd/ks/emi/bump textures over BVH")
    shiptex_ms = shiptex_f16_ms = None
    try:
        stx_path = os.path.join(REPO_DIR, "scenes/shipTexOnly.txt")
        if os.path.exists(stx_path):
            # default (winner_table="auto" -> f16 on TPU since round 4):
            # 24-byte winner uv/TBN gather rows, measured 1.34x on hardware
            # with image mean identical to 5 digits (probe_winner_f16.py).
            _, shiptex_f16_ms = _bench_scene(
                load_scene(stx_path), megakernel=False, min_time=4.0,
                max_iters=32, batch=4,
            )
            # exact-f32 table under its own key so the round 2-3 trend
            # line stays comparable across rounds.
            _, shiptex_ms = _bench_scene(
                load_scene(stx_path), megakernel=False, min_time=4.0,
                max_iters=32, batch=4, winner_table="f32",
            )
        else:
            print(f"shipTex bench skipped: {stx_path} not found", file=sys.stderr)
    except Exception as e:
        print(f"shipTex bench failed: {e}", file=sys.stderr)

    # ---- 2. fused denoise ms/frame ------------------------------------------
    denoise_ms = None
    denoised_16 = None
    try:
        import jax.numpy as jnp

        from mygpuraytracer_tpu.render.denoise_fused import (
            denoise_accumulator, load_denoiser_params,
        )

        scene = get_scene("cornell.txt")
        r = Renderer(scene, RenderOptions(megakernel=on_tpu), seed=1)
        r.step_many(16)
        np.asarray(r.image.x[:8])
        params, _ = load_denoiser_params("rt_ldr_alb")

        def denoise_once():
            return denoise_accumulator(
                r.image, r.albedo, jnp.int32(r.iteration), params,
                r.meta.resolution,
            )

        out = denoise_once()  # compile
        np.asarray(out[:2, :2])
        # Batch the timed dispatches with ONE final sync: each host<->device
        # sync through the axon tunnel costs ~34 ms of pure latency, which
        # at ~per-frame granularity would dominate the measurement (the
        # round-2 41.3 ms/frame was ~80% tunnel latency).
        t0 = time.perf_counter()
        runs = 16
        for _ in range(runs):
            out = denoise_once()
        np.asarray(out[:2, :2])  # sync without the full-image transfer
        denoise_ms = 1000 * (time.perf_counter() - t0) / runs
        denoised_16 = np.asarray(out)
    except Exception as e:  # keep the headline metric alive no matter what
        print(f"denoise bench failed: {e}", file=sys.stderr)

    # 9-channel variant (rt_ldr_alb_nrm, normal-guided): the stronger slot
    # since round 3 — reported under its OWN keys so the 6-channel trend
    # line above stays comparable across rounds.
    denoise9_ms = None
    denoised9_16 = None
    try:
        if denoise_ms is not None:
            params9, _ = load_denoiser_params("rt_ldr_alb_nrm")

            def denoise9_once():
                return denoise_accumulator(
                    r.image, r.albedo, jnp.int32(r.iteration), params9,
                    r.meta.resolution, normal=r.normal,
                )

            out9 = denoise9_once()  # compile
            np.asarray(out9[:2, :2])
            t0 = time.perf_counter()
            runs = 16
            for _ in range(runs):
                out9 = denoise9_once()
            np.asarray(out9[:2, :2])
            denoise9_ms = 1000 * (time.perf_counter() - t0) / runs
            denoised9_16 = np.asarray(out9)
    except Exception as e:
        print(f"denoise9 bench failed: {e}", file=sys.stderr)

    # ---- 3. RMSE of denoised 16 spp vs 16384 spp ground truth ---------------
    # Ground truth is the framework's OWN converged render (no CUDA machine
    # exists here) — the key names say so. Both the display-domain ([0,1]
    # clamped, the LDR filter's native domain) and the raw unclamped RMSE are
    # reported so trends across rounds stay comparable.
    rmse = rmse_raw = rmse9 = None
    try:
        if denoised_16 is not None:
            gt = Renderer(get_scene("cornell.txt"),
                          RenderOptions(megakernel=on_tpu), seed=2)
            # 16384 spp: a 1024-spp GT carries ~0.042 display-RMSE of its own
            # MC noise (sigma_16 = 0.333 measured from paired realizations) —
            # a floor 4x the 1e-2 quality bar that the metric would report as
            # denoiser error. 16384 drops the floor to ~0.010. Chunked
            # dispatches with host syncs keep each device program well under
            # the TPU worker's ~60 s runtime watchdog.
            for _ in range(8):
                gt.step_many(2048)
                np.asarray(gt.image.x[:4])
            gt_img = gt.beauty()
            # rt_ldr_alb is the LDR filter: it denoises the clamped [0,1]
            # display image (emitter pixels carry radiance ~5*pi in the raw
            # accumulator). Score in the same domain, like oidnDenoise's
            # LDR reference compare.
            gt_disp = np.clip(gt_img, 0.0, 1.0).astype(np.float64)
            diff = np.clip(denoised_16, 0.0, 1.0).astype(np.float64) - gt_disp
            rmse = float(np.sqrt(np.mean(diff * diff)))
            diff_raw = denoised_16.astype(np.float64) - gt_img.astype(np.float64)
            rmse_raw = float(np.sqrt(np.mean(diff_raw * diff_raw)))
            if denoised9_16 is not None:
                d9 = np.clip(denoised9_16, 0.0, 1.0).astype(np.float64) - gt_disp
                rmse9 = float(np.sqrt(np.mean(d9 * d9)))
    except Exception as e:
        print(f"rmse bench failed: {e}", file=sys.stderr)

    rnd = lambda v, k=2: None if v is None else round(v, k)
    result = {
        "metric": "cornellObj_800x800_depth8_path_trace",
        "value": round(ms_obj, 2),
        "unit": "Msamples/s",
        "vs_baseline": round(ms_obj / 50.0, 3),
        "cornell_msamples_per_sec": round(ms_cornell, 2),
        "cornellGlass_msamples_per_sec": rnd(glass_ms),
        "cornell_dof_cache_sort_msamples_per_sec": rnd(dof_ms),
        "ship23k_msamples_per_sec": rnd(ship_ms),
        "shipTex23k_msamples_per_sec": rnd(shiptex_ms),
        "shipTex23k_f16winner_msamples_per_sec": rnd(shiptex_f16_ms),
        "denoise_ms_per_frame": rnd(denoise_ms),
        "denoise9_ms_per_frame": rnd(denoise9_ms),
        "rmse_ldr_denoised_16spp_vs_own_16kspp": rnd(rmse, 5),
        "rmse_raw_denoised_16spp_vs_own_16kspp": rnd(rmse_raw, 5),
        "rmse_ldr_denoised9_16spp_vs_own_16kspp": rnd(rmse9, 5),
        "sanity": {
            "finite": bool(np.isfinite(img_obj).all()),
            "nonzero": bool(img_obj.mean() > 0.01),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
