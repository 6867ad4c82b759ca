"""Fused on-device denoise vs the host Infer pipeline.

denoise_accumulator packs straight off the flat Vec3 accumulators
(render/denoise_fused.py); Infer packs from HxWxC numpy (train/infer.py).
Same transfer/sanitize semantics (core/input_reorder.ispc:28-151,
output_reorder.ispc:26-61) => identical outputs on CPU (both f32).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from mygpuraytracer_tpu.config import RenderOptions
from mygpuraytracer_tpu.denoise.unet import init_unet_params
from mygpuraytracer_tpu.render import Renderer
from mygpuraytracer_tpu.render.denoise_fused import denoise_accumulator
from mygpuraytracer_tpu.scene.builtin import cornell_box
from mygpuraytracer_tpu.train.infer import Infer


@pytest.fixture(scope="module")
def small_render():
    scene = cornell_box()
    scene.set_resolution(48, 32)
    r = Renderer(scene, RenderOptions(megakernel=False), seed=7)
    r.step_many(4)
    return r


@pytest.mark.parametrize("channels", [6, 9])
def test_fused_matches_infer(small_render, channels):
    r = small_render
    params = init_unet_params(channels, seed=3)
    it = max(r.iteration, 1)
    planes = [r.beauty(), r.albedo_image()]
    normal = None
    if channels == 9:
        planes.append(r.normal_image())
        normal = r.normal
    x = np.concatenate(planes, axis=-1).astype(np.float32)

    host = Infer(params, transfer="srgb", hdr=False)(x)
    host = np.minimum(host, 1.0)  # fused output applies the LDR clamp

    fused = np.asarray(denoise_accumulator(
        r.image, r.albedo, jnp.int32(it), params, r.meta.resolution,
        normal=normal,
    ))
    assert fused.shape == host.shape
    np.testing.assert_allclose(fused, host, atol=2e-5)


@pytest.mark.parametrize("channels", [6, 9])
def test_fused_hdr_matches_infer(small_render, channels):
    """hdr=True = the rt_hdr_* pipeline: autoexposure input scale on the
    normalized color (core/color.cpp:33-84, unet.cpp:134-144), PU transfer,
    unclamped radiance out scaled back by 1/input_scale."""
    from mygpuraytracer_tpu.denoise import color as color_mod

    r = small_render
    params = init_unet_params(channels, seed=4)
    it = max(r.iteration, 1)
    beauty = r.beauty()  # raw HDR radiance mean (no clamp)
    planes = [beauty, r.albedo_image()]
    normal = None
    if channels == 9:
        planes.append(r.normal_image())
        normal = r.normal
    x = np.concatenate(planes, axis=-1).astype(np.float32)

    scale = float(color_mod.autoexposure(jnp.asarray(beauty)))
    host_inf = Infer(params, transfer="pu", hdr=True)
    host_inf.transfer.input_scale = scale
    host = host_inf(x)

    fused = np.asarray(denoise_accumulator(
        r.image, r.albedo, jnp.int32(it), params, r.meta.resolution,
        normal=normal, hdr=True,
    ))
    assert fused.shape == host.shape
    assert np.isfinite(fused).all()
    # rtol, not just atol: HDR output is unbounded and the PU inverse's
    # exponential branch amplifies f32 rounding on emitter-bright pixels.
    np.testing.assert_allclose(fused, host, rtol=5e-5, atol=2e-5)


def test_render_denoised_routes_hdr_slot(monkeypatch):
    """render_denoised(slot='rt_hdr_alb') must switch the fused packing to
    the HDR pipeline (the LDR packing would clamp+sRGB the radiance the
    rt_hdr weights were never trained on)."""
    import mygpuraytracer_tpu.render.renderer as renderer_mod
    from mygpuraytracer_tpu.render import denoise_fused

    seen = {}
    real = denoise_fused.denoise_accumulator

    def spy(*args, **kw):
        seen["hdr"] = kw.get("hdr", False)
        return real(*args, **kw)

    monkeypatch.setattr(denoise_fused, "denoise_accumulator", spy)
    scene = cornell_box()
    scene.set_resolution(32, 32)
    r = Renderer(scene, RenderOptions(megakernel=False), seed=2)
    out, beauty = r.render_denoised(iterations=2, batch=2, slot="rt_hdr_alb")
    assert seen["hdr"] is True
    assert np.isfinite(out).all() and out.shape == beauty.shape
