"""SH-L1 directional lightmap AOV (options.dir_aov) — the training-data
source for the RTLightmap directional filter (core/unet.cpp:744-763,
weights/rtlightmap_dir.tza)."""

import numpy as np

from mygpuraytracer_tpu.config import RenderOptions
from mygpuraytracer_tpu.render import Renderer
from mygpuraytracer_tpu.scene.builtin import cornell_box, emissive_sphere


def test_dir_aov_cornell_nonzero_and_bounded():
    r = Renderer(cornell_box(resolution=(24, 24)), RenderOptions(dir_aov=True),
                 seed=3)
    r.step_many(16)
    img = r.dir_image()
    assert img.shape == (24, 24, 3)
    assert np.isfinite(img).all()
    # normalized mean directions live in [-1, 1]
    assert img.min() >= -1.0 and img.max() <= 1.0
    # the weight is FINAL path luminance (zero-radiance paths carry no
    # direction), so coverage grows with spp; at 16 spp a healthy fraction
    # of the cornell box has a direction signal
    assert (np.abs(img).sum(-1) > 1e-6).mean() > 0.3
    # directions are luminance-weighted means of unit vectors: norms <= 1
    # and meaningfully > 0 where lit
    norms = np.linalg.norm(img, axis=-1)
    assert norms.max() <= 1.0 + 1e-5
    assert norms.max() > 0.1


def test_dir_aov_accumulates_across_batches():
    """dir accumulation follows the same batching-independence contract as
    the beauty accumulator."""
    a = Renderer(cornell_box(resolution=(16, 16)), RenderOptions(dir_aov=True),
                 seed=5)
    b = Renderer(cornell_box(resolution=(16, 16)), RenderOptions(dir_aov=True),
                 seed=5)
    a.step_many(4)
    for _ in range(4):
        b.step()
    np.testing.assert_allclose(a.dir_image(), b.dir_image(), atol=1e-5)


def test_dir_aov_zero_for_pure_emitter_scene():
    """A lone emissive object never scatters a first bounce, so its
    directional AOV is identically zero (why sphere.txt is excluded from the
    rtlightmap_dir dataset, scripts/gen_dataset_r2.py)."""
    r = Renderer(emissive_sphere(resolution=(16, 16)),
                 RenderOptions(dir_aov=True), seed=1)
    r.step_many(2)
    assert np.abs(r.dir_image()).sum() == 0.0
