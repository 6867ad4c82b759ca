"""Test harness configuration.

Runs the whole suite on a virtual 8-device CPU mesh so sharding paths are
exercised without TPU hardware (the reference's analog: replaying OIDN tests
across ISAs via Intel SDE, scripts/test.py --arch).
"""

import os

# The harness environment pins JAX_PLATFORMS=axon (remote TPU tunnel) via
# sitecustomize; tests must run on the local virtual-CPU mesh, so override
# both the env var and the already-initialized jax config.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

import pathlib

import pytest

REPO = pathlib.Path(__file__).resolve().parent.parent
REFERENCE = pathlib.Path("/root/reference")


@pytest.fixture(scope="session")
def reference_scenes():
    scenes = REFERENCE / "scenes"
    if not scenes.is_dir():
        pytest.skip("reference scenes not available")
    return scenes


@pytest.fixture(scope="session")
def cornell_scene(reference_scenes):
    from mygpuraytracer_tpu.scene import load_scene

    return load_scene(str(reference_scenes / "cornell.txt"))


# ---------------------------------------------------------------------------
# Fast/slow split: `pytest tests/ -q` runs the fast tier (<5 min on the CI
# box); the full suite (~22 min) runs with `pytest tests/ -m "slow or not
# slow"`. The slow set is centralized here (measured >8 s per test on the
# 1-core/8-virtual-device CI box, round-4 durations log) rather than
# scattered as decorators; core production-tier parity tests are kept fast
# deliberately (rows-tier mesh parity, cornell/cornellObj goldens, the
# raytrace CLI end-to-end).

SLOW_TESTS = {
    "test_wavefront_pallas_mesh_tier_matches_chunked[conds]",
    "test_wavefront_pallas_mesh_tier_matches_chunked[rows_dma]",
    "test_intersect_active_mask_contract",
    "test_bvh_tier_matches_oracle",
    "test_fastpath_mesh_uv",
    "test_fastpath_matches_reference_path[cornell.txt]",
    "test_fastpath_matches_reference_path[sphere.txt]",
    "test_keep_best_campaign_smoke",
    "test_sort_by_material_identical_image",
    "test_sort_by_material_identical_image_textured",
    "test_bounding_box_identical_image",
    "test_bounding_box_culls_misses",
    "test_obj_scene_renders",
    "test_glass_scene_finite",
    "test_first_bounce_cache_consistency",
    "test_emissive_light_visible",
    "test_inplace_tiled_outputcopy",
    "test_progress_monitor_and_cancel",
    "test_train_device_ema",
    "test_train_device_smoke",
    "test_train_smoke_and_resume",
    "test_validation_loop",
    "test_infer_aux_prefilter_chain",
    "test_warm_start_from_tza",
    "test_sample_parallel_matches_sequential",
    "test_pixel_sharded_800x800_invariance",
    "test_pixel_sharded_matches_single",
    "test_golden_render[shipTexOnly_32_4spp]",
    "test_golden_render[cornellCottage_32_4spp]",
    "test_golden_render[cornellGlass_64_32spp]",
    "test_golden_render[shipOnly_32_4spp]",
    "test_golden_render[cornellDof_64_16spp]",
    "test_raytrace_cli_multichip[sample]",
    "test_raytrace_cli_multichip[pixels]",
    "test_winner_table_f16_matches_f32[False]",
    "test_winner_table_f16_matches_f32[True]",
    "test_winner_table_oct_matches_f32[False]",
    "test_winner_table_oct_matches_f32[True]",
    "test_nearfar_walk_matches_oracle_open_sky",
    "test_textured_pallas_tier_matches_chunked[False-rows]",
    "test_textured_pallas_tier_matches_chunked[True-rows]",
    "test_textured_tier_sort_modes_identical",
    "test_dir_aov_accumulates_across_batches",
    "test_dir_aov_cornell_nonzero_and_bounded",
    "test_bump_parity",
}


def pytest_collection_modifyitems(config, items):
    seen = set()
    for item in items:
        if item.name in SLOW_TESTS:
            item.add_marker(pytest.mark.slow)
            seen.add(item.name)
    # A renamed test (or changed parametrize id) silently drops out of the
    # slow tier and regrows the default fast run past its <5 min budget.
    # Only enforceable on a full-suite collection: partial runs (a single
    # file, -k filters) legitimately collect few SLOW_TESTS entries.
    missing = SLOW_TESTS - seen
    if missing and len(items) > 150:
        raise pytest.UsageError(
            "SLOW_TESTS entries matched no collected test (renamed? "
            f"parametrize id changed?): {sorted(missing)}"
        )
