"""Framework benchmark — prints ONE JSON line for the driver.

Structure (round 5): the result dict is emitted (one flushed JSON line)
after EVERY completed phase, so a timeout or crash anywhere still leaves
the latest complete line in the tail for the driver to parse — round 4's
print-only-at-the-end form lost every number to a driver timeout during
the final risky config (BENCH_r04.json: rc=124, parsed=null). The driver
takes the last parseable line; later emissions strictly add keys.

Covers all five BASELINE.md configs plus the denoiser metrics:
  - value/unit: Msamples/sec path-tracing scenes/cornellObj.txt at the
    canonical 800x800 depth-8 workload (the north-star scene; >= 50 target);
  - cornell / cornellGlass / cornell_dof_cache_sort / ship23k
    Msamples/sec: the other four BASELINE configs (#1-#4);
  - denoise_ms_per_frame: fused on-device render->denoise (rt_ldr_alb,
    albedo-guided) U-Net execute time at 800x800;
  - denoise_standalone_1080p_ms: the oidnBenchmark headline cell
    (RT hdr+alb+nrm at 1920x1080, apps/oidnBenchmark.cpp:182-209) through
    the standalone Filter API's device-resident execute — tracks the
    round-4 filter work across rounds;
  - rmse_{ldr,raw}_denoised_16spp_vs_own_16kspp: RMSE of the denoised
    16 spp cornell render against the framework's own 16384 spp converged
    render (the 1e-2 bar; no CUDA machine exists here, so the own converged
    render stands in for the CUDA reference — the key name says so);
  - denoise9_ms_per_frame / rmse_ldr_denoised9_...: same measurements for
    the 9-channel normal-guided slot (rt_ldr_alb_nrm, the stronger slot
    since round 3) under separate keys so the 6-channel trend stays
    comparable across rounds;
  - denoise_hdr_ms_per_frame / rmse_ldr_denoised_hdr_...: the HDR pipeline
    (rt_hdr_alb — the slot BASELINE config #5 names: autoexposure + PU
    transfer, unclamped out), scored in the display domain like the others.

Timing excludes compilation and uses explicit device->host syncs; samples
are dispatched as one device program per batch.
"""

import json
import os
import subprocess
import sys
import time

import numpy as np


REPO_DIR = os.path.dirname(os.path.abspath(__file__))
START_TIME = time.time()
# Worst-case wall budget the whole bench must fit under (round 3's
# successful envelope was ~75 min; round 4 died past it). The risky
# final config's subprocess timeout shrinks to whatever remains.
WALL_BUDGET_S = 70 * 60


def _elapsed():
    return time.time() - START_TIME


def _sub_env():
    env = dict(os.environ)
    need = f"{REPO_DIR}:/root/.axon_site"
    pp = env.get("PYTHONPATH", "")
    if need not in pp:
        env["PYTHONPATH"] = need + (":" + pp if pp else "")
    return env


def _run_isolated(which, timeout):
    """Re-invoke bench.py for ONE risky config in a SUBPROCESS.

    A config whose device program trips the TPU worker's ~60 s runtime
    watchdog crashes the worker and takes its client process down with it
    (reproduced 2026-08-18/19). Isolated, a crash costs only this config's
    key — and since round 5 the parent has already emitted every other
    metric before this runs."""
    try:
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--sub", which],
            capture_output=True, text=True, timeout=timeout, env=_sub_env(),
        )
        for line in reversed(out.stdout.strip().splitlines()):
            try:
                return json.loads(line)
            except (json.JSONDecodeError, ValueError):
                continue
        print(f"sub bench {which} gave no JSON; stderr tail: "
              f"{out.stderr.strip().splitlines()[-3:]}", file=sys.stderr)
    except subprocess.TimeoutExpired:
        print(f"sub bench {which} timed out after {timeout}s", file=sys.stderr)
    except Exception as e:
        print(f"sub bench {which} failed: {e}", file=sys.stderr)
    return {}


def _wait_tunnel(max_wait=240):
    """Health-gate after a possibly-crashed subprocess: a wedged axon worker
    recovers in ~4 min. Probe with a trivial jit in a SUBPROCESS so a hang
    can't wedge this process; give up (and let callers proceed) after
    max_wait."""
    probe = ("import jax, jax.numpy as jnp, numpy as np; "
             "y = jax.jit(lambda a: a + 1)(jnp.arange(8.0)); "
             "assert float(np.asarray(y[1])) == 2.0; print('TUNNEL_OK')")
    t0 = time.time()
    while time.time() - t0 < max_wait:
        try:
            out = subprocess.run([sys.executable, "-c", probe], timeout=170,
                                 capture_output=True, text=True, env=_sub_env())
            if "TUNNEL_OK" in out.stdout:
                return True
        except subprocess.TimeoutExpired:
            pass
        time.sleep(20)
    print("tunnel still unhealthy after subprocess bench", file=sys.stderr)
    return False


def _sub_main(which):
    """Measure one isolated config; print a one-line JSON dict of keys."""
    from mygpuraytracer_tpu.scene import load_scene
    from mygpuraytracer_tpu.scene.builtin import cornell_box

    ref = os.path.join("/root/reference/scenes", "cornell.txt")
    scene = load_scene(ref) if os.path.exists(ref) else cornell_box()
    # batch=4: keeps each device program far under the TPU worker's ~60 s
    # runtime watchdog (the lean fused sort runs ~99 ms/iter at 800^2 —
    # 6.47 Msam/s measured 2026-08-19; the round-3 argsort form cost up
    # to ~1 s/iter).
    kw = dict(megakernel=False, depth_of_field=True, cache_first_bounce=True,
              sort_by_material=True, antialiasing=False,
              min_time=4.0, max_iters=32, batch=4)
    if which == "dof":
        _, ms = _bench_scene(scene, **kw)  # sort_impl default ("fused")
        print(json.dumps({"cornell_dof_cache_sort_msamples_per_sec": ms}))
    elif which == "dof_argsort":
        # fallback: the round-3-measured legacy path, under the same key
        _, ms = _bench_scene(scene, sort_impl="argsort", **kw)
        print(json.dumps({"cornell_dof_cache_sort_msamples_per_sec": ms,
                          "cornell_dof_cache_sort_impl": "argsort"}))
    else:
        raise SystemExit(f"unknown --sub {which}")


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

    rnd = lambda v, k=2: None if v is None else round(v, k)
    result = {
        "metric": "cornellObj_800x800_depth8_path_trace",
        "value": None,
        "unit": "Msamples/s",
        "vs_baseline": None,
        "cornell_msamples_per_sec": None,
        "cornellGlass_msamples_per_sec": None,
        "cornell_dof_cache_sort_msamples_per_sec": None,
        "cornell_dof_cache_sort_impl": None,
        "ship23k_msamples_per_sec": None,
        "shipTex23k_msamples_per_sec": None,
        "shipTex23k_winner_msamples_per_sec": None,
        "shipTex23k_winner_table": "oct" if on_tpu else "f32",
        "denoise_ms_per_frame": None,
        "denoise9_ms_per_frame": None,
        "denoise_hdr_ms_per_frame": None,
        "denoise_standalone_1080p_ms": None,
        "denoise_standalone_1080p_hostio_ms": None,
        "rmse_ldr_denoised_16spp_vs_own_16kspp": None,
        "rmse_raw_denoised_16spp_vs_own_16kspp": None,
        "rmse_ldr_denoised9_16spp_vs_own_16kspp": None,
        "rmse_ldr_denoised_hdr_16spp_vs_own_16kspp": None,
        "sanity": None,
    }

    def emit():
        # One self-contained JSON line per completed phase, flushed so a
        # SIGKILL can't strand it in a stdio buffer. The driver keeps the
        # last parseable line; each emission is a superset of the previous.
        print(json.dumps(result), flush=True)

    # ---- 1. cornellObj (north-star scene) + cornell Msamples/s -------------
    robj, ms_obj = _bench_scene(get_scene("cornellObj.txt"), on_tpu)
    img_obj = robj.beauty()
    result["value"] = round(ms_obj, 2)
    result["vs_baseline"] = round(ms_obj / 50.0, 3)
    result["sanity"] = {
        "finite": bool(np.isfinite(img_obj).all()),
        "nonzero": bool(img_obj.mean() > 0.01),
    }
    rc, ms_cornell = _bench_scene(get_scene("cornell.txt"), on_tpu)
    result["cornell_msamples_per_sec"] = round(ms_cornell, 2)
    emit()

    # ---- 1a. BASELINE config #2: glass/Fresnel ------------------------------
    # (config #3 — DoF + cache + sort — runs LAST, subprocess-isolated: its
    # sorted wavefront is the one program class that has crashed the TPU
    # worker, and a worker crash takes the whole client down.)
    try:
        from mygpuraytracer_tpu.scene.builtin import cornell_glass

        glass_path = os.path.join(ref_scenes, "cornellGlass.txt")
        glass = (load_scene(glass_path) if os.path.exists(glass_path)
                 else cornell_glass())
        _, glass_ms = _bench_scene(glass, on_tpu)
        result["cornellGlass_msamples_per_sec"] = rnd(glass_ms)
    except Exception as e:
        print(f"glass bench failed: {e}", file=sys.stderr)
    emit()

    # ---- 1b. 23k-face mesh via the wavefront cluster-BVH Pallas tier --------
    # (honest number: far below the primitive-scene tiers; docs/MESH_TIERS.md.
    # batch 4 keeps each program under the TPU worker's runtime watchdog.)
    try:
        ship_path = os.path.join(REPO_DIR, "scenes/shipOnly.txt")
        if os.path.exists(ship_path):
            ship = load_scene(ship_path)  # canonical 800x800 workload
            _, ship_ms = _bench_scene(
                ship, megakernel=False, min_time=4.0, max_iters=32, batch=4
            )
            result["ship23k_msamples_per_sec"] = rnd(ship_ms)
        else:
            print(f"ship bench skipped: {ship_path} not found", file=sys.stderr)
    except Exception as e:
        print(f"ship bench failed: {e}", file=sys.stderr)
    emit()

    # textured+bumped 23k-face ship — BASELINE config #4's actual workload
    # ("mesh + kd/ks/emi/bump textures over BVH")
    try:
        stx_path = os.path.join(REPO_DIR, "scenes/shipTexOnly.txt")
        if os.path.exists(stx_path):
            # default (winner_table="auto" -> oct on TPU since round 4,
            # f16 before): 16-byte winner uv/TBN gather rows, measured
            # 2.213 Msam/s vs f16's 2.137 same-session with 6e-6 image-mean
            # drift (probe_winner_oct.py). Key was
            # shipTex23k_f16winner_msamples_per_sec through BENCH_r03; now
            # shipTex23k_winner_* with the table named in its own field.
            _, shiptex_winner_ms = _bench_scene(
                load_scene(stx_path), megakernel=False, min_time=4.0,
                max_iters=32, batch=4,
            )
            result["shipTex23k_winner_msamples_per_sec"] = rnd(shiptex_winner_ms)
            emit()
            # exact-f32 table under its own key so the round 2-3 trend
            # line stays comparable across rounds. On CPU "auto" already
            # resolved to f32 above — don't measure the same config twice.
            if on_tpu:
                _, shiptex_f32_ms = _bench_scene(
                    load_scene(stx_path), megakernel=False, min_time=4.0,
                    max_iters=32, batch=4, winner_table="f32",
                )
                result["shipTex23k_msamples_per_sec"] = rnd(shiptex_f32_ms)
            else:
                result["shipTex23k_msamples_per_sec"] = (
                    result["shipTex23k_winner_msamples_per_sec"])
        else:
            print(f"shipTex bench skipped: {stx_path} not found", file=sys.stderr)
    except Exception as e:
        print(f"shipTex bench failed: {e}", file=sys.stderr)
    emit()

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
        result["denoise_ms_per_frame"] = rnd(denoise_ms)
    except Exception as e:  # keep the headline metric alive no matter what
        print(f"denoise bench failed: {e}", file=sys.stderr)

    # 9-channel variant (rt_ldr_alb_nrm, normal-guided): the stronger slot
    # since round 3 — reported under its OWN keys so the 6-channel trend
    # line above stays comparable across rounds.
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
            result["denoise9_ms_per_frame"] = rnd(
                1000 * (time.perf_counter() - t0) / runs)
            denoised9_16 = np.asarray(out9)
    except Exception as e:
        print(f"denoise9 bench failed: {e}", file=sys.stderr)

    # HDR variant (rt_hdr_alb — the slot BASELINE config #5 names):
    # autoexposure + PU transfer, unclamped radiance out. Scored below in
    # the display domain like the LDR keys so the bars are comparable.
    denoised_hdr_16 = None
    try:
        if denoise_ms is not None:
            params_h, _ = load_denoiser_params("rt_hdr_alb")

            def denoise_hdr_once():
                return denoise_accumulator(
                    r.image, r.albedo, jnp.int32(r.iteration), params_h,
                    r.meta.resolution, hdr=True,
                )

            outh = denoise_hdr_once()  # compile
            np.asarray(outh[:2, :2])
            t0 = time.perf_counter()
            runs = 16
            for _ in range(runs):
                outh = denoise_hdr_once()
            np.asarray(outh[:2, :2])
            result["denoise_hdr_ms_per_frame"] = rnd(
                1000 * (time.perf_counter() - t0) / runs)
            denoised_hdr_16 = np.asarray(outh)
    except Exception as e:
        print(f"denoise hdr bench failed: {e}", file=sys.stderr)
    emit()

    # ---- 3. RMSE of denoised 16 spp vs 16384 spp ground truth ---------------
    # Ground truth is the framework's OWN converged render (no CUDA machine
    # exists here) — the key names say so. Both the display-domain ([0,1]
    # clamped, the LDR filter's native domain) and the raw unclamped RMSE are
    # reported so trends across rounds stay comparable.
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
            result["rmse_ldr_denoised_16spp_vs_own_16kspp"] = rnd(
                float(np.sqrt(np.mean(diff * diff))), 5)
            diff_raw = (denoised_16.astype(np.float64)
                        - gt_img.astype(np.float64))
            result["rmse_raw_denoised_16spp_vs_own_16kspp"] = rnd(
                float(np.sqrt(np.mean(diff_raw * diff_raw))), 5)
            if denoised9_16 is not None:
                d9 = np.clip(denoised9_16, 0.0, 1.0).astype(np.float64) - gt_disp
                result["rmse_ldr_denoised9_16spp_vs_own_16kspp"] = rnd(
                    float(np.sqrt(np.mean(d9 * d9))), 5)
            if denoised_hdr_16 is not None:
                dh = (np.clip(denoised_hdr_16, 0.0, 1.0).astype(np.float64)
                      - gt_disp)
                result["rmse_ldr_denoised_hdr_16spp_vs_own_16kspp"] = rnd(
                    float(np.sqrt(np.mean(dh * dh))), 5)
    except Exception as e:
        print(f"rmse bench failed: {e}", file=sys.stderr)
    emit()

    # ---- 3b. standalone-filter wall time: the oidnBenchmark headline cell ---
    # RT hdr + alb + nrm at 1920x1080 (apps/oidnBenchmark.cpp:182-209),
    # unmonitored Filter.execute. The PRIMARY key matches the reference
    # benchmark's semantics exactly: images live in buffers allocated where
    # the device computes (ImageBuffer(device,...) -> oidnNewBuffer;
    # here DeviceBuffer) and the timed loop is execute() only — no host
    # traffic. The *_hostio_ms key keeps the numpy-in/numpy-out number,
    # which through this environment's tunnel is dominated by the ~100 MB
    # per-execute host<->device traffic (measured r5: ~7.6 s vs the 1 GB/s
    # dispatch path elsewhere — tunnel array transfers run far slower).
    # Runs AFTER the RMSE phase: its ~minutes 1080p compile must not stand
    # between the driver and the quality keys.
    try:
        from mygpuraytracer_tpu.denoise import Device, DeviceBuffer

        dev = Device()
        dev.commit()
        rng_np = np.random.default_rng(0)
        h1080, w1080 = 1080, 1920
        color1080 = rng_np.random((h1080, w1080, 3), np.float32) * 4
        alb1080 = rng_np.random((h1080, w1080, 3), np.float32)
        nrm1080 = (rng_np.random((h1080, w1080, 3), np.float32) * 2 - 1)

        f = dev.new_filter("RT")
        f.set_image("color", DeviceBuffer(color1080))
        f.set_image("albedo", DeviceBuffer(alb1080))
        f.set_image("normal", DeviceBuffer(nrm1080))
        obuf = DeviceBuffer(np.zeros((h1080, w1080, 3), np.float32))
        f.set_image("output", obuf)
        f.set("hdr", True)
        f.set("inputScale", 1.0)
        f.commit()
        f.execute()  # warmup/compile
        np.asarray(obuf.array[:2, :2])
        t0 = time.perf_counter()
        runs = 8
        for _ in range(runs):
            f.execute()
        np.asarray(obuf.array[:2, :2])  # sync without a full readback
        result["denoise_standalone_1080p_ms"] = rnd(
            1000 * (time.perf_counter() - t0) / runs)
        emit()

        fh = dev.new_filter("RT")
        fh.set_image("color", color1080)
        fh.set_image("albedo", alb1080)
        fh.set_image("normal", nrm1080)
        out1080 = np.zeros((h1080, w1080, 3), np.float32)
        fh.set_image("output", out1080)
        fh.set("hdr", True)
        fh.set("inputScale", 1.0)
        fh.commit()
        fh.execute()  # warmup (program already compiled above)
        t0 = time.perf_counter()
        runs = 2
        for _ in range(runs):
            fh.execute()
        result["denoise_standalone_1080p_hostio_ms"] = rnd(
            1000 * (time.perf_counter() - t0) / runs)
    except Exception as e:
        print(f"standalone filter bench failed: {e}", file=sys.stderr)
    emit()

    # ---- 4. BASELINE config #3 (DoF + cache + sort), LAST + isolated --------
    # Every other metric is already emitted, so even a worker crash or a
    # driver kill here cannot poison them. The default sort_impl ("fused"
    # variadic lax.sort) runs first; the argsort fallback only runs if the
    # fused sub failed AND enough wall budget remains (round 4's
    # fallback chain pushed the total past the driver's clock).
    dof_ms = None
    if on_tpu:
        # Health-gate first: if an earlier config crashed the worker, the
        # sub would otherwise burn its whole budget waiting on a dead
        # tunnel (the likely round-4 failure mode).
        _wait_tunnel()
        budget = WALL_BUDGET_S - _elapsed()
        sub = _run_isolated("dof", timeout=max(300, min(1200, budget)))
        dof_ms = sub.get("cornell_dof_cache_sort_msamples_per_sec")
        if dof_ms is not None:
            result["cornell_dof_cache_sort_impl"] = "fused"
        elif WALL_BUDGET_S - _elapsed() > 900:
            _wait_tunnel()
            sub = _run_isolated("dof_argsort", timeout=900)
            dof_ms = sub.get("cornell_dof_cache_sort_msamples_per_sec")
            result["cornell_dof_cache_sort_impl"] = sub.get(
                "cornell_dof_cache_sort_impl")
        else:
            print("skipping argsort fallback: wall budget exhausted",
                  file=sys.stderr)
    else:
        try:
            _, dof_ms = _bench_scene(
                get_scene("cornell.txt"), megakernel=False,
                depth_of_field=True, cache_first_bounce=True,
                sort_by_material=True, antialiasing=False,
                min_time=4.0, max_iters=32, batch=4,
            )
            result["cornell_dof_cache_sort_impl"] = "fused"
        except Exception as e:
            print(f"dof bench failed: {e}", file=sys.stderr)
    result["cornell_dof_cache_sort_msamples_per_sec"] = rnd(dof_ms)
    emit()


if __name__ == "__main__":
    if len(sys.argv) >= 3 and sys.argv[1] == "--sub":
        sys.path.insert(0, REPO_DIR)
        _sub_main(sys.argv[2])
    else:
        main()
