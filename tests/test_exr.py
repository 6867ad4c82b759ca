"""Pure-Python EXR I/O round trips (utils/exr.py).

Mirrors the reference's OpenImageIO EXR path (apps/utils/image_io.cpp) and
the training corpus format (training/preprocess.py reads EXR features)."""

import os
import numpy as np
import pytest

from mygpuraytracer_tpu.utils.exr import (
    _predictor_decode,
    _predictor_encode,
    read_exr,
    read_exr_channels,
    write_exr,
)
from mygpuraytracer_tpu.utils.image_io import load_image, save_image


def _hdr(h=37, w=53, c=3, seed=0):
    rng = np.random.default_rng(seed)
    img = rng.gamma(1.5, 1.0, size=(h, w, c)).astype(np.float32)
    img[0, 0] = 0.0
    img[1, 1] = 117.0  # out-of-LDR-range value survives
    return img


def test_predictor_roundtrip():
    rng = np.random.default_rng(1)
    for n in (1, 2, 7, 256, 1001):
        raw = rng.integers(0, 256, n, dtype=np.uint8).tobytes()
        assert _predictor_decode(_predictor_encode(raw)) == raw


@pytest.mark.parametrize("compression", [0, 2, 3])
@pytest.mark.parametrize("half", [True, False])
def test_exr_roundtrip(tmp_path, compression, half):
    img = _hdr()
    p = str(tmp_path / "t.exr")
    write_exr(p, img, half=half, compression=compression)
    back = read_exr(p)
    expect = img.astype(np.float16).astype(np.float32) if half else img
    np.testing.assert_array_equal(back, expect)


def test_exr_single_channel_and_alpha(tmp_path):
    img = _hdr(c=1)
    p = str(tmp_path / "y.exr")
    write_exr(p, img, half=False)
    np.testing.assert_array_equal(read_exr(p), img)

    rgba = _hdr(c=4)
    p = str(tmp_path / "rgba.exr")
    write_exr(p, rgba, half=False)
    np.testing.assert_array_equal(read_exr(p), rgba)


def test_exr_uint_channels(tmp_path):
    img = np.arange(24, dtype=np.uint32).reshape(4, 6, 1) * 100000
    p = str(tmp_path / "u.exr")
    write_exr(p, img)
    chans, header = read_exr_channels(p)
    np.testing.assert_array_equal(chans["Y"], img[..., 0])


def test_exr_layered_channels(tmp_path):
    """split_exr-style multi-layer files: channel dict keeps all names."""
    img = _hdr(c=3, seed=2)
    alb = _hdr(c=3, seed=3)
    p = str(tmp_path / "multi.exr")
    write_exr(
        p,
        np.concatenate([img, alb], axis=-1),
        half=False,
        channel_names=["R", "G", "B", "albedo.R", "albedo.G", "albedo.B"],
    )
    chans, _ = read_exr_channels(p)
    assert set(chans) == {"R", "G", "B", "albedo.R", "albedo.G", "albedo.B"}
    np.testing.assert_array_equal(chans["albedo.G"], alb[..., 1])
    # read_exr picks the RGB display channels
    np.testing.assert_array_equal(read_exr(p), img)


def test_exr_via_image_io(tmp_path):
    img = _hdr()
    p = str(tmp_path / "io.exr")
    save_image(p, img)
    back = load_image(p)
    np.testing.assert_allclose(back, img, rtol=1e-3, atol=1e-3)  # half storage


def test_exr_16line_blocks_tall_image(tmp_path):
    """ZIP blocks span 16 scanlines; a non-multiple height hits the ragged
    last block."""
    img = _hdr(h=45, w=8)
    p = str(tmp_path / "tall.exr")
    write_exr(p, img, half=False, compression=3)
    np.testing.assert_array_equal(read_exr(p), img)


def test_split_exr_features(tmp_path):
    """apps/split_exr extracts hdr/alb/nrm feature images by alias."""
    from mygpuraytracer_tpu.apps.split_exr import split_exr
    from mygpuraytracer_tpu.utils.exr import read_exr, write_exr

    hdr = _hdr(seed=4)
    alb = _hdr(seed=5)
    nrm = _hdr(seed=6)
    p = str(tmp_path / "frame.exr")
    write_exr(
        p,
        np.concatenate([hdr, alb, nrm], axis=-1),
        half=False,
        channel_names=["R", "G", "B", "albedo.R", "albedo.G", "albedo.B",
                       "N.R", "N.G", "N.B"],
    )
    outs = split_exr(p)
    assert sorted(os.path.basename(o) for o in outs) == [
        "frame.alb.exr", "frame.hdr.exr", "frame.nrm.exr"
    ]
    np.testing.assert_array_equal(read_exr(str(tmp_path / "frame.alb.exr")), alb)
    np.testing.assert_array_equal(read_exr(str(tmp_path / "frame.nrm.exr")), nrm)
