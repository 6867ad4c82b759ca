"""Golden-image regression tests.

The reference's analog is scripts/test.py baseline/run (render with a pinned
model, compare with compare_image.py). Goldens are CPU renders committed in
tests/golden/; threefry RNG streams are platform-independent, so any drift
means a semantic change in the trace core.
"""

import os
import pathlib

import numpy as np
import pytest

from mygpuraytracer_tpu.config import RenderOptions
from mygpuraytracer_tpu.render import Renderer
from mygpuraytracer_tpu.scene.builtin import cornell_box, cornell_glass
from mygpuraytracer_tpu.train.infer import rmse

GOLDEN = pathlib.Path(__file__).parent / "golden"


def _load(path):
    from mygpuraytracer_tpu.scene import load_scene

    if not os.path.exists(path):
        pytest.skip(f"scene missing: {path}")
    return load_scene(path)


REPO = pathlib.Path(__file__).parent.parent

# (golden name, scene factory, resolution, spp, options) — the last three
# cover the paths most at risk under BVH/megakernel work: the small-mesh
# tier (cornellObj's cube), depth of field, and the cluster-mesh tier
# (shipOnly). The textured+bump path is oracle-tested in test_bump.py.
CASES = [
    ("cornell_64_32spp", lambda: cornell_box(resolution=(64, 64)), 32,
     RenderOptions()),
    ("cornellGlass_64_32spp", lambda: cornell_glass(resolution=(64, 64)), 32,
     RenderOptions()),
    ("cornellObj_64_16spp",
     lambda: _load("/root/reference/scenes/cornellObj.txt"), 16,
     RenderOptions()),
    ("cornellDof_64_16spp", lambda: cornell_box(resolution=(64, 64)), 16,
     RenderOptions(depth_of_field=True, focal_distance=11.0)),
    ("shipOnly_32_4spp", lambda: _load(str(REPO / "scenes/shipOnly.txt")), 4,
     RenderOptions()),
    # round 3: textured+bumped cluster-tier mesh, and the reference's real
    # cottage asset end-to-end (parse -> atlas -> render)
    ("shipTexOnly_32_4spp", lambda: _load(str(REPO / "scenes/shipTexOnly.txt")),
     4, RenderOptions()),
    ("cornellCottage_32_4spp",
     lambda: _load(str(REPO / "scenes/cornellCottage.txt")), 4,
     RenderOptions()),
]


@pytest.mark.parametrize("name,maker,spp,opts", CASES, ids=[c[0] for c in CASES])
def test_golden_render(name, maker, spp, opts):
    path = GOLDEN / f"{name}.npy"
    if not path.exists():
        pytest.skip("golden missing")
    golden = np.load(path)
    scene = maker()
    res = int(name.split("_")[-2])
    scene.set_resolution(res, res)
    r = Renderer(scene, opts, seed=0)
    r.render(iterations=spp, batch=min(spp, 8))
    img = r.beauty()
    err = rmse(img, golden)
    # identical RNG streams: only float reassociation differs across builds
    assert err < 1e-3, f"golden drift: rmse={err}"


def test_scene_writer_roundtrip(tmp_path):
    from mygpuraytracer_tpu.scene import load_scene
    from mygpuraytracer_tpu.scene.writer import save_scene

    s = cornell_box()
    path = str(tmp_path / "cornell.txt")
    save_scene(s, path)
    back = load_scene(path)
    assert len(back.geoms) == len(s.geoms)
    assert len(back.materials) == len(s.materials)
    np.testing.assert_allclose(
        back.geoms[0].transform, s.geoms[0].transform, atol=1e-5
    )
    np.testing.assert_allclose(
        back.state.camera.pixel_length, s.state.camera.pixel_length, rtol=1e-6
    )


def test_bundled_scenes_parse():
    from mygpuraytracer_tpu.scene import load_scene

    scenes_dir = pathlib.Path(__file__).parent.parent / "scenes"
    found = list(scenes_dir.glob("*.txt"))
    assert found, "bundled scenes missing"
    for f in found:
        s = load_scene(str(f))
        assert s.geoms and s.materials
