"""mesh_sort=None auto-resolution (VERDICT r2 item 2: promote 'need' to
automatic on embedded-mesh scenes; docs/MESH_TIERS.md measurements)."""

from pathlib import Path

from mygpuraytracer_tpu.config import RenderOptions
from mygpuraytracer_tpu.render.renderer import (
    _resolve_auto_options,
    mesh_reach_fraction,
)
from mygpuraytracer_tpu.scene import load_scene
from mygpuraytracer_tpu.scene.device_scene import build_device_scene

REPO = Path(__file__).resolve().parent.parent


def _meta(path):
    scene = load_scene(str(REPO / path))
    _, meta = build_device_scene(scene, 64)
    return scene, meta


def test_embedded_mesh_enables_need():
    # Ship inside the cornell walls: low bounce-0 reach + enclosing
    # primitives -> the measured-1.5x 'need' partition turns on.
    scene, meta = _meta("scenes/cornellShipTex.txt")
    assert mesh_reach_fraction(scene, meta) < 0.30
    opts = _resolve_auto_options(RenderOptions(mesh_pallas=True), scene, meta)
    assert opts.mesh_sort == "need"


def test_mesh_only_scene_stays_unsorted():
    # shipOnly: misses die at bounce 0, so the alive wavefront is all mesh
    # rays — partition measured a loss there (docs/MESH_TIERS.md).
    scene, meta = _meta("scenes/shipOnly.txt")
    opts = _resolve_auto_options(RenderOptions(mesh_pallas=True), scene, meta)
    assert opts.mesh_sort is False


def test_no_mesh_and_explicit_values_passthrough():
    scene, meta = _meta("scenes/cornell.txt") if (
        REPO / "scenes/cornell.txt").exists() else _meta("scenes/cornellShipTex.txt")
    # Explicit settings are never overridden by auto.
    for v in (False, True, "need", "coherence"):
        opts = _resolve_auto_options(
            RenderOptions(mesh_pallas=True, mesh_sort=v), scene, meta)
        assert opts.mesh_sort == v


def test_cpu_backend_resolves_false():
    # Tests run on CPU: mesh_pallas=None resolves to the chunked stream,
    # where the partition has no block structure to exploit.
    scene, meta = _meta("scenes/cornellShipTex.txt")
    opts = _resolve_auto_options(RenderOptions(), scene, meta)
    assert opts.mesh_sort is False
