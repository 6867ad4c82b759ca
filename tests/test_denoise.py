"""Denoiser API tests mirroring the reference's oidnTest.cpp surface
(apps/oidnTest.cpp): filter lifecycle, dirty-state semantics, degenerate
sizes, input sanitization, progress/cancellation — on constant synthetic
images, no dataset needed."""

import math

import numpy as np
import pytest

from mygpuraytracer_tpu.denoise import (
    Device,
    OidnError,
    read_tza,
    write_tza,
    init_unet_params,
    unet_apply,
)
from mygpuraytracer_tpu.denoise.unet import conv_specs, params_from_tza
from mygpuraytracer_tpu.denoise import color as color_mod

import jax.numpy as jnp


def make_const_image(h, w, value=0.5):
    return np.full((h, w, 3), value, np.float32)


def make_device():
    dev = Device()
    dev.commit()
    return dev


def run_filter(dev, h, w, albedo=True, **params):
    f = dev.new_filter("RT")
    f.set_image("color", make_const_image(h, w))
    if albedo:
        f.set_image("albedo", make_const_image(h, w))
    out = np.zeros((h, w, 3), np.float32)
    f.set_image("output", out)
    for k, v in params.items():
        f.set(k, v)
    f.commit()
    f.execute()
    return out, f


# ----------------------------------------------------------------------------
# TZA


def test_tza_roundtrip(tmp_path):
    tensors = {
        "enc_conv0.weight": (np.random.rand(32, 9, 3, 3).astype(np.float32), "oihw"),
        "enc_conv0.bias": (np.random.rand(32).astype(np.float32), "x"),
    }
    path = str(tmp_path / "w.tza")
    write_tza(path, tensors)
    back = read_tza(path)
    assert set(back) == set(tensors)
    for k in tensors:
        np.testing.assert_array_equal(back[k][0], tensors[k][0])
        assert back[k][1] == tensors[k][1]


def test_tza_rejects_lfs_stub(tmp_path):
    p = tmp_path / "stub.tza"
    p.write_bytes(b"version https://git-lfs.github.com/spec/v1\noid sha256:abc\nsize 3670280\n")
    with pytest.raises(ValueError, match="git-LFS"):
        read_tza(str(p))


def test_reference_weights_are_stubs():
    """Documents the asset gotcha: the checkout's weights are LFS pointers."""
    import os

    path = "/root/reference/weights/rt_hdr_alb.tza"
    if not os.path.exists(path):
        pytest.skip("reference weights absent")
    with pytest.raises(ValueError):
        read_tza(path)


# ----------------------------------------------------------------------------
# U-Net


def test_unet_shapes():
    params = init_unet_params(6)
    x = jnp.zeros((1, 64, 80, 6))
    y = unet_apply(params, x)
    assert y.shape == (1, 64, 80, 3)


def test_unet_channel_chain():
    specs = conv_specs(9)
    # consecutive convs must be channel-compatible through the topology
    assert specs[0][1] == 9 and specs[-1][2] == 3
    assert specs[7][1] == 96 + 64  # dec_conv4a: ec5 + ec3
    assert specs[13][1] == 64 + 9  # dec_conv1a: dc2 + input


def test_params_from_tza_layout():
    w = np.arange(32 * 9 * 3 * 3, dtype=np.float32).reshape(32, 9, 3, 3)
    params = params_from_tza({"enc_conv0.weight": (w, "oihw"), "enc_conv0.bias": (np.zeros(32, np.float32), "x")})
    assert params["enc_conv0"]["w"].shape == (3, 3, 9, 32)
    # spot-check transpose: oihw [o,i,h,w] -> hwio [h,w,i,o]
    assert float(params["enc_conv0"]["w"][1, 2, 3, 4]) == float(w[4, 3, 1, 2])


# ----------------------------------------------------------------------------
# Transfer functions


def test_srgb_roundtrip():
    y = jnp.linspace(0.0, 1.0, 101)
    tf = color_mod.make_transfer("srgb")
    np.testing.assert_allclose(np.asarray(tf.inverse(tf.forward(y))), np.asarray(y), atol=1e-5)


def test_pu_roundtrip():
    y = jnp.logspace(-6, 4, 101)
    tf = color_mod.make_transfer("pu")
    np.testing.assert_allclose(
        np.asarray(tf.inverse(tf.forward(y))), np.asarray(y), rtol=1e-3
    )


def test_log_roundtrip():
    y = jnp.logspace(-4, 4, 51)
    tf = color_mod.make_transfer("log")
    # f32 exp(log(x)) over 8 decades: relative error grows with magnitude
    np.testing.assert_allclose(
        np.asarray(tf.inverse(tf.forward(y))), np.asarray(y), rtol=2e-2
    )


def test_autoexposure_const():
    img = jnp.full((64, 64, 3), 0.18)
    # luminance of (0.18,0.18,0.18) = 0.18 -> scale = 1
    np.testing.assert_allclose(float(color_mod.autoexposure(img)), 1.0, rtol=1e-3)


def test_autoexposure_black():
    img = jnp.zeros((64, 64, 3))
    assert float(color_mod.autoexposure(img)) == 1.0


# ----------------------------------------------------------------------------
# Filter API (oidnTest.cpp parity)


def test_single_filter_multiple_frames():
    dev = make_device()
    out, f = run_filter(dev, 64, 64)
    assert np.isfinite(out).all()
    for _ in range(2):  # 3 frames total (oidnTest.cpp:56-90)
        f.execute()
    assert np.isfinite(out).all()


def test_multiple_filters_size_churn():
    dev = make_device()
    # small -> large -> medium on the same device (oidnTest.cpp:94-164)
    for size in (32, 128, 64):
        out, _ = run_filter(dev, size, size)
        assert out.shape == (size, size, 3)
        assert np.isfinite(out).all()


def test_multiple_devices():
    out1, _ = run_filter(make_device(), 33, 49)
    out2, _ = run_filter(make_device(), 33, 49)
    np.testing.assert_allclose(out1, out2)


def test_filter_update_same_size_swap():
    dev = make_device()
    out, f = run_filter(dev, 48, 48)
    f.set_image("color", make_const_image(48, 48, 0.9))
    f.commit()
    f.execute()
    assert np.isfinite(out).all()


def test_filter_resize_requires_matching_sizes():
    dev = make_device()
    out, f = run_filter(dev, 48, 48)
    f.set_image("color", make_const_image(64, 64))  # mismatch vs output
    with pytest.raises(OidnError):
        f.commit()


def test_filter_missing_output():
    dev = make_device()
    f = dev.new_filter("RT")
    f.set_image("color", make_const_image(16, 16))
    with pytest.raises(OidnError):
        f.commit()


def test_filter_remove_image():
    dev = make_device()
    out, f = run_filter(dev, 32, 32, albedo=True)
    f.remove_image("albedo")  # falls back to color-only weights
    f.commit()
    f.execute()
    assert np.isfinite(out).all()


@pytest.mark.parametrize("h,w", [(1, 1), (2, 2), (1, 2), (3, 2), (2, 16)])
def test_degenerate_sizes(h, w):
    dev = make_device()
    out, _ = run_filter(dev, h, w)
    assert np.isfinite(out).all()


def test_zero_size_noop():
    dev = make_device()
    f = dev.new_filter("RT")
    f.set_image("color", np.zeros((0, 0, 3), np.float32))
    f.set_image("output", np.zeros((0, 0, 3), np.float32))
    f.commit()
    f.execute()  # must not crash (oidnTest.cpp:276-320)


@pytest.mark.parametrize("hdr", [False, True])
def test_sanitization(hdr):
    """NaN/Inf/negative inputs must produce finite output (oidnTest.cpp:324-374)."""
    dev = make_device()
    img = make_const_image(40, 40, 0.5)
    img[5, 5] = np.nan
    img[6, 6] = np.inf
    img[7, 7] = -np.inf
    img[8, 8] = -1.0
    f = dev.new_filter("RT")
    f.set_image("color", img)
    alb = make_const_image(40, 40, 0.5)
    alb[3, 3] = np.nan
    f.set_image("albedo", alb)
    out = np.full((40, 40, 3), np.nan, np.float32)
    f.set_image("output", out)
    f.set("hdr", hdr)
    f.set("inputScale", 1.0)
    f.commit()
    f.execute()
    assert np.isfinite(out).all()
    assert (out >= 0).all()
    if not hdr:
        assert (out <= 1.0).all()


def test_hdr_srgb_conflict():
    dev = make_device()
    f = dev.new_filter("RT")
    f.set_image("color", make_const_image(16, 16))
    f.set_image("output", np.zeros((16, 16, 3), np.float32))
    f.set("hdr", True)
    f.set("srgb", True)
    with pytest.raises(OidnError, match="hdr and srgb"):
        f.commit()


def test_progress_monitor_and_cancel():
    """Monotone [0,1] progress; cancel at ~0.5 raises CANCELLED
    (oidnTest.cpp:378-458; multi-tile forced via maxMemoryMB=0)."""
    dev = make_device()
    seen = []

    def monitor(p):
        seen.append(p)
        return True

    f = dev.new_filter("RT")
    n = 520  # > minimum tile size so maxMemoryMB=0 forces multiple tiles
    f.set_image("color", make_const_image(n, n))
    f.set_image("albedo", make_const_image(n, n))
    out = np.zeros((n, n, 3), np.float32)
    f.set_image("output", out)
    f.set("maxMemoryMB", 0)
    f.set_progress_monitor_function(monitor)
    f.commit()
    f.execute()
    assert seen[0] == 0.0 and seen[-1] == 1.0
    assert all(b >= a for a, b in zip(seen, seen[1:]))
    assert len(seen) > 3  # actually tiled

    # cancellation mid-run
    calls = []

    def canceller(p):
        calls.append(p)
        return p < 0.5

    f.set_progress_monitor_function(canceller)
    with pytest.raises(OidnError) as ei:
        f.execute()
    assert ei.value.code == OidnError.CANCELLED
    err_code, _ = dev.get_error()
    assert err_code == OidnError.CANCELLED


def test_weight_selection_table():
    dev = make_device()
    f = dev.new_filter("RT")
    h = w = 16
    f.set_image("color", make_const_image(h, w))
    f.set_image("output", np.zeros((h, w, 3), np.float32))
    f.commit()
    assert f._weights_name == "rt_ldr"
    f.set_image("albedo", make_const_image(h, w))
    f.commit()
    assert f._weights_name == "rt_ldr_alb"
    f.set_image("normal", make_const_image(h, w))
    f.set("hdr", True)
    f.commit()
    assert f._weights_name == "rt_hdr_alb_nrm"
    f.set("cleanAux", True)
    f.commit()
    assert f._weights_name == "rt_hdr_calb_cnrm"


def test_albedo_only_hdr_rejected():
    dev = make_device()
    f = dev.new_filter("RT")
    f.set_image("albedo", make_const_image(16, 16))
    f.set_image("output", np.zeros((16, 16, 3), np.float32))
    f.set("hdr", True)
    with pytest.raises(OidnError, match="hdr mode is not supported"):
        f.commit()


def test_rtlightmap():
    dev = make_device()
    f = dev.new_filter("RTLightmap")
    f.set_image("color", make_const_image(32, 32, 2.0))  # HDR values
    out = np.zeros((32, 32, 3), np.float32)
    f.set_image("output", out)
    f.commit()
    assert f._weights_name == "rtlightmap_hdr"
    f.execute()
    assert np.isfinite(out).all()
    f.set("directional", True)
    f.commit()
    assert f._weights_name == "rtlightmap_dir"


def test_unknown_filter_type():
    dev = make_device()
    with pytest.raises(OidnError):
        dev.new_filter("Bogus")


# ----------------------------------------------------------------------------
# Half3 + strided images (core/image.h:12-66; oidnDenoise.cpp:362 half
# tolerance)


def test_half_images_match_float_within_1e2():
    dev = make_device()
    rng = np.random.default_rng(0)
    img = rng.random((40, 40, 3)).astype(np.float32)
    alb = rng.random((40, 40, 3)).astype(np.float32)

    f = dev.new_filter("RT")
    f.set_image("color", img)
    f.set_image("albedo", alb)
    out32 = np.zeros((40, 40, 3), np.float32)
    f.set_image("output", out32)
    f.commit()
    f.execute()

    g = dev.new_filter("RT")
    g.set_image("color", img.astype(np.float16))
    g.set_image("albedo", alb.astype(np.float16))
    out16 = np.zeros((40, 40, 3), np.float16)
    g.set_image("output", out16)
    g.commit()
    g.execute()

    assert out16.dtype == np.float16
    assert np.isfinite(out16).all()
    # the reference's fp16 reference-compare tolerance (oidnDenoise.cpp:362)
    denom = np.maximum(np.abs(out32), 1e-3)
    assert (np.abs(out16.astype(np.float32) - out32) / denom).max() <= 1e-2


def test_strided_interleaved_rgba_buffer():
    """pixelByteStride = 16 over an RGBA float buffer; strided output view
    writes back in place, untouched alpha lanes preserved."""
    dev = make_device()
    rng = np.random.default_rng(1)
    h = w = 32
    rgba = rng.random((h, w, 4)).astype(np.float32)
    rgba_out = np.full((h, w, 4), -7.0, np.float32)

    f = dev.new_filter("RT")
    f.set_image("color", rgba, width=w, height=h, pixel_byte_stride=16)
    f.set_image("output", rgba_out, width=w, height=h, pixel_byte_stride=16)
    f.commit()
    f.execute()

    # rgb lanes written, alpha lane untouched
    assert (rgba_out[..., 3] == -7.0).all()
    assert np.isfinite(rgba_out[..., :3]).all()
    assert np.abs(rgba_out[..., :3]).max() > 0

    # equals the contiguous run on the same pixels
    g = dev.new_filter("RT")
    g.set_image("color", np.ascontiguousarray(rgba[..., :3]))
    out = np.zeros((h, w, 3), np.float32)
    g.set_image("output", out)
    g.commit()
    g.execute()
    np.testing.assert_allclose(rgba_out[..., :3], out, atol=1e-6)


def test_strided_byte_offset_and_row_stride():
    """A cropped window inside a larger buffer via byteOffset+rowByteStride."""
    dev = make_device()
    rng = np.random.default_rng(2)
    big = rng.random((48, 48, 3)).astype(np.float32)
    h = w = 24
    row_stride = 48 * 3 * 4
    off = (8 * 48 + 4) * 3 * 4  # start at pixel (8, 4)

    f = dev.new_filter("RT")
    f.set_image("color", big, width=w, height=h, byte_offset=off,
                row_byte_stride=row_stride)
    out = np.zeros((h, w, 3), np.float32)
    f.set_image("output", out)
    f.commit()
    f.execute()

    g = dev.new_filter("RT")
    g.set_image("color", np.ascontiguousarray(big[8:8 + h, 4:4 + w]))
    out2 = np.zeros((h, w, 3), np.float32)
    g.set_image("output", out2)
    g.commit()
    g.execute()
    np.testing.assert_allclose(out, out2, atol=1e-6)


def test_strided_view_bounds_checked():
    dev = make_device()
    f = dev.new_filter("RT")
    buf = np.zeros(100, np.float32)
    with pytest.raises(OidnError):
        f.set_image("color", buf, width=10, height=10)  # needs 300 floats
    with pytest.raises(OidnError):
        f.set_image("color", np.zeros((4, 4, 3), np.float64))  # bad dtype


# ----------------------------------------------------------------------------
# Independent numeric U-Net golden


def _np_conv3x3(x, w_oihw, b, relu=True):
    """Reference conv in pure numpy: 3x3, stride 1, pad 1, NHWC input,
    weights in the TZA's native oihw layout. Written with padded sliding
    windows + tensordot — structurally independent of XLA's conv."""
    o, i, kh, kw = w_oihw.shape
    n, h, wd, c = x.shape
    assert c == i and (kh, kw) == (3, 3)
    xp = np.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    y = np.zeros((n, h, wd, o), np.float64)
    for dy in range(3):
        for dx in range(3):
            # window x[:, y+dy-1, x+dx-1, :] . w[:, :, dy, dx]
            y += np.tensordot(
                xp[:, dy:dy + h, dx:dx + wd, :].astype(np.float64),
                w_oihw[:, :, dy, dx].astype(np.float64).T,
                axes=([3], [0]),
            )
    y += b.astype(np.float64)
    return np.maximum(y, 0.0) if relu else y


def _np_pool(x):
    n, h, w, c = x.shape
    return x.reshape(n, h // 2, 2, w // 2, 2, c).max(axis=(2, 4))


def _np_upsample(x):
    return x.repeat(2, axis=1).repeat(2, axis=2)


def test_unet_numeric_golden_vs_numpy(tmp_path):
    """Pin unet_apply + the TZA oihw->HWIO ingestion numerically against an
    independent numpy conv chain (sliding-window tensordot), tolerance 1e-5
    — the fp32 analog of the reference's own <=1e-4 max-rel-error regression
    bar (apps/oidnDenoise.cpp:362). Guards topology, concat order (upsampled
    first, then skip — unet.cpp:530-566), pool/upsample semantics, and the
    weight transpose against silent regression.
    """
    from mygpuraytracer_tpu.denoise.tza import read_tza, write_tza
    from mygpuraytracer_tpu.denoise.unet import unet_apply

    rng = np.random.default_rng(42)
    ic, oc = 9, 3
    tensors = {}
    for name, cin, cout in conv_specs(ic, oc):
        w = rng.standard_normal((cout, cin, 3, 3)).astype(np.float32)
        w *= np.sqrt(2.0 / (9 * cin)).astype(np.float32)
        b = (0.1 * rng.standard_normal(cout)).astype(np.float32)
        tensors[f"{name}.weight"] = (w, "oihw")
        tensors[f"{name}.bias"] = (b, "x")

    # Round-trip through the TZA archive so the on-disk ingest path is the
    # thing under test, exactly as real OIDN blobs would enter.
    path = str(tmp_path / "golden.tza")
    write_tza(path, tensors)
    params = params_from_tza(read_tza(path), dtype=jnp.float32)

    x = rng.standard_normal((1, 32, 32, ic)).astype(np.float32)
    got = np.asarray(unet_apply(params, jnp.asarray(x)))

    # Independent numpy forward pass (float64 accumulation).
    def cv(t, name, relu=True):
        return _np_conv3x3(
            t, tensors[f"{name}.weight"][0], tensors[f"{name}.bias"][0], relu
        )

    t = x.astype(np.float64)
    inp = t
    t = cv(t, "enc_conv0")
    t = cv(t, "enc_conv1")
    t = pool1 = _np_pool(t)
    t = cv(t, "enc_conv2")
    t = pool2 = _np_pool(t)
    t = cv(t, "enc_conv3")
    t = pool3 = _np_pool(t)
    t = cv(t, "enc_conv4")
    t = _np_pool(t)
    t = cv(t, "enc_conv5a")
    t = cv(t, "enc_conv5b")
    t = np.concatenate([_np_upsample(t), pool3], axis=-1)
    t = cv(t, "dec_conv4a")
    t = cv(t, "dec_conv4b")
    t = np.concatenate([_np_upsample(t), pool2], axis=-1)
    t = cv(t, "dec_conv3a")
    t = cv(t, "dec_conv3b")
    t = np.concatenate([_np_upsample(t), pool1], axis=-1)
    t = cv(t, "dec_conv2a")
    t = cv(t, "dec_conv2b")
    t = np.concatenate([_np_upsample(t), inp], axis=-1)
    t = cv(t, "dec_conv1a")
    t = cv(t, "dec_conv1b")
    want = cv(t, "dec_conv0", relu=False)

    scale = np.abs(want).max()
    assert scale > 0.1  # the net actually produced signal
    max_rel = np.abs(got - want).max() / scale
    assert max_rel < 1e-5, f"max rel error {max_rel:.2e}"


def test_inplace_tiled_outputcopy():
    """In-place filtering (output buffer == color buffer) must equal
    out-of-place, including under tiling where later tiles would otherwise
    read already-denoised pixels — the outputTemp/outputCopy path
    (core/unet.cpp:455-460,187-189; oidnDenoise.cpp:264-266)."""
    rng = np.random.default_rng(3)
    n = 520  # forces multiple tiles at maxMemoryMB=0

    def run(inplace: bool, max_mem: int, monitored: bool = False) -> np.ndarray:
        dev = make_device()
        f = dev.new_filter("RT")
        color = rng.random((n, n, 3), np.float32).astype(np.float32)
        # identical input per run
        color = np.asarray(color)
        color.flags.writeable = True
        f.set_image("color", color)
        out = color if inplace else np.zeros((n, n, 3), np.float32)
        f.set_image("output", out)
        f.set("maxMemoryMB", max_mem)
        if monitored:
            # a registered monitor forces the per-tile host path, which is
            # where the outputTemp/outputCopy machinery lives
            f.set_progress_monitor_function(lambda p: True)
        f.commit()
        f.execute()
        return out

    # Compare like-for-like: tiled vs tiled, single-tile vs single-tile
    # (the 96 px-overlap tiling is not bit-exact vs whole-image processing).
    rng = np.random.default_rng(3)
    ref_tiled = run(False, 0)
    rng = np.random.default_rng(3)
    tiled_inplace = run(True, 0)
    np.testing.assert_array_equal(tiled_inplace, ref_tiled)
    rng = np.random.default_rng(3)
    ref_single = run(False, 3000)
    rng = np.random.default_rng(3)
    single_inplace = run(True, 3000)
    np.testing.assert_array_equal(single_inplace, ref_single)

    # Monitored (per-tile host) path: in-place tiled goes through
    # outputTemp + outputCopy (unet.cpp:455-460,187-189).
    rng = np.random.default_rng(3)
    ref_mon = run(False, 0, monitored=True)
    rng = np.random.default_rng(3)
    mon_inplace = run(True, 0, monitored=True)
    np.testing.assert_array_equal(mon_inplace, ref_mon)


def test_tile_plan_exact_accounting():
    """maxMemoryMB -> tile counts via the exact buildNet liveness sum
    (core/unet.cpp:199-239,356-464), not a per-pixel estimate: at 1080p/9ch
    the whole image is one ~1.09 GB-scratch tile under the default 3000 MB
    budget, a 64 MB budget splits 6x12, and maxMemoryMB=0 forces the
    3*overlap minimum tile."""
    dev = make_device()
    cases = {3000: (1, 1), 512: (2, 2), 64: (6, 12), 0: (10, 18)}
    for mb, want in cases.items():
        f = dev.new_filter("RT")
        n_h, n_w = 1080, 1920
        f.set_image("color", make_const_image(n_h, n_w))
        f.set_image("albedo", make_const_image(n_h, n_w))
        f.set_image("normal", make_const_image(n_h, n_w))
        f.set_image("output", np.zeros((n_h, n_w, 3), np.float32))
        f.set("maxMemoryMB", mb)
        f.commit()
        assert f.tile_counts == want, (mb, f.tile_counts)
        # tile grid covers the image exactly once
        tiles = f._tile_grid(n_h, n_w)
        cover = np.zeros((n_h, n_w), np.int32)
        for oh, ow, th, tw in tiles:
            cover[oh:oh + th, ow:ow + tw] += 1
        assert cover.min() == 1 and cover.max() == 1


def test_device_fast_path_matches_monitored_tiled():
    """The unmonitored device-resident execute must produce the SAME pixels
    as the monitored per-tile host path: both now use _tile_grid's output
    regions and _run_tile's re-anchored zero-filled windows, so registering
    a progress monitor must not change the result (the reference has one
    execute loop regardless, core/unet.cpp:146-186). Non-square image with
    a ragged last tile exercises the re-anchor + crop corners."""
    rng = np.random.default_rng(11)
    h, w = 520, 344  # multiple tiles in H and W at maxMemoryMB=0
    color = rng.random((h, w, 3), np.float32).astype(np.float32)
    albedo = rng.random((h, w, 3), np.float32).astype(np.float32)

    def run(monitored: bool) -> np.ndarray:
        dev = make_device()
        f = dev.new_filter("RT")
        f.set_image("color", color.copy())
        f.set_image("albedo", albedo.copy())
        out = np.zeros((h, w, 3), np.float32)
        f.set_image("output", out)
        f.set("maxMemoryMB", 0)
        if monitored:
            f.set_progress_monitor_function(lambda p: True)
        f.commit()
        f.execute()
        return out

    fast = run(False)
    mon = run(True)
    # Same math modulo XLA fusion differences between the scanned and the
    # per-tile programs (f32 on CPU): tolerance far under the reference's
    # own 1e-4 max-rel-error compare bar (oidnDenoise.cpp:362).
    np.testing.assert_allclose(fast, mon, rtol=0, atol=1e-6)


def test_device_buffer_matches_host_single_tile():
    """DeviceBuffer in/out (the oidnNewBuffer-on-device analog,
    oidnBenchmark.cpp:121-165) must produce the same pixels as numpy
    host images — single-tile path, no readback on the output buffer."""
    from mygpuraytracer_tpu.denoise import DeviceBuffer

    rng = np.random.default_rng(21)
    h, w = 120, 168
    color = rng.random((h, w, 3), np.float32).astype(np.float32) * 2
    albedo = rng.random((h, w, 3), np.float32).astype(np.float32)

    dev = make_device()
    f = dev.new_filter("RT")
    f.set_image("color", color.copy())
    f.set_image("albedo", albedo.copy())
    out_host = np.zeros((h, w, 3), np.float32)
    f.set_image("output", out_host)
    f.set("hdr", True)
    f.commit()
    f.execute()

    f2 = dev.new_filter("RT")
    cbuf = DeviceBuffer(color)
    f2.set_image("color", cbuf)
    f2.set_image("albedo", DeviceBuffer(albedo))
    obuf = DeviceBuffer(np.zeros((h, w, 3), np.float32))
    f2.set_image("output", obuf)
    f2.set("hdr", True)
    f2.commit()
    f2.execute()

    np.testing.assert_allclose(obuf.numpy(), out_host, rtol=0, atol=1e-6)
    # the input buffer stayed resident and unchanged
    np.testing.assert_array_equal(cbuf.numpy(), color)


def test_device_buffer_matches_host_multi_tile_and_monitored():
    """DeviceBuffer through the multi-tile scanned path AND the monitored
    per-tile path (which materializes host copies once) — identical pixels
    to the all-numpy filter; in-place device buffers (output is the color
    buffer) work because device arrays are immutable."""
    from mygpuraytracer_tpu.denoise import DeviceBuffer

    rng = np.random.default_rng(22)
    h, w = 520, 344
    color = rng.random((h, w, 3), np.float32).astype(np.float32)
    albedo = rng.random((h, w, 3), np.float32).astype(np.float32)

    def run(device_buffers: bool, monitored: bool, inplace: bool = False):
        dev = make_device()
        f = dev.new_filter("RT")
        if device_buffers:
            cbuf = DeviceBuffer(color)
            f.set_image("color", cbuf)
            f.set_image("albedo", DeviceBuffer(albedo))
            obuf = cbuf if inplace else DeviceBuffer(
                np.zeros((h, w, 3), np.float32))
            f.set_image("output", obuf)
        else:
            f.set_image("color", color.copy())
            f.set_image("albedo", albedo.copy())
            obuf = np.zeros((h, w, 3), np.float32)
            f.set_image("output", obuf)
        f.set("maxMemoryMB", 0)  # force multiple tiles at this size
        if monitored:
            f.set_progress_monitor_function(lambda p: True)
        f.commit()
        f.execute()
        return obuf.numpy() if device_buffers else obuf

    ref = run(False, False)
    np.testing.assert_allclose(run(True, False), ref, rtol=0, atol=1e-6)
    np.testing.assert_allclose(run(True, True), ref, rtol=0, atol=1e-6)
    np.testing.assert_allclose(run(True, False, inplace=True), ref,
                               rtol=0, atol=1e-6)
