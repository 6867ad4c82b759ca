"""CLI app tests (the reference's app layer: oidnRayTracer CLI surface,
oidnDenoise, compare/convert tools)."""

import json
import os

import numpy as np
import pytest


def test_raytrace_cli(tmp_path):
    from mygpuraytracer_tpu.apps.raytrace import main

    rc = main([
        "cornell", "--resolution", "32", "32", "--iterations", "4",
        "--out-dir", str(tmp_path), "--batch", "4", "--quiet",
    ])
    assert rc == 0
    files = os.listdir(tmp_path)
    assert any(f.endswith("samp.png") for f in files)
    assert any(f.endswith("albedo.png") for f in files)
    assert any(f.endswith("output.png") for f in files)
    assert any(f.endswith("input.png") for f in files)


def test_raytrace_cli_no_denoise(tmp_path):
    from mygpuraytracer_tpu.apps.raytrace import main

    rc = main([
        "sphere", "--resolution", "16", "16", "--iterations", "2",
        "--out-dir", str(tmp_path), "--no-denoise", "--quiet",
    ])
    assert rc == 0
    assert not any(f.endswith("output.png") for f in os.listdir(tmp_path))


def test_denoise_cli(tmp_path):
    from mygpuraytracer_tpu.apps.denoise import main
    from mygpuraytracer_tpu.utils.image_io import load_image, write_pfm

    rng = np.random.default_rng(0)
    noisy = rng.random((32, 32, 3)).astype(np.float32)
    write_pfm(str(tmp_path / "in.pfm"), noisy)
    rc = main([
        "--ldr", str(tmp_path / "in.pfm"), "-o", str(tmp_path / "out.pfm"),
    ])
    assert rc == 0
    out = load_image(str(tmp_path / "out.pfm"))
    assert out.shape == (32, 32, 3) and np.isfinite(out).all()


def test_compare_image_cli(tmp_path):
    from mygpuraytracer_tpu.apps.compare_image import main
    from mygpuraytracer_tpu.utils.image_io import write_pfm

    a = np.full((8, 8, 3), 0.5, np.float32)
    write_pfm(str(tmp_path / "a.pfm"), a)
    write_pfm(str(tmp_path / "b.pfm"), a + 0.1)
    assert main([str(tmp_path / "a.pfm"), str(tmp_path / "a.pfm")]) == 0
    assert (
        main([str(tmp_path / "a.pfm"), str(tmp_path / "b.pfm"),
              "--threshold", "rmse", "0.01"]) == 2
    )


def test_convert_image_cli(tmp_path):
    from mygpuraytracer_tpu.apps.convert_image import main
    from mygpuraytracer_tpu.utils.image_io import load_image, write_pfm

    img = np.random.default_rng(1).random((16, 16, 3)).astype(np.float32)
    write_pfm(str(tmp_path / "x.pfm"), img)
    assert main([str(tmp_path / "x.pfm"), str(tmp_path / "x.npy")]) == 0
    back = load_image(str(tmp_path / "x.npy"))
    np.testing.assert_allclose(back, img, atol=1e-6)
    assert main([str(tmp_path / "x.pfm"), str(tmp_path / "x.hdr")]) == 0
    hdr = load_image(str(tmp_path / "x.hdr"))
    # RGBE precision: ~pixel_max/128 absolute per channel
    tol = img.max(axis=-1, keepdims=True) / 64 + 1e-4
    assert (np.abs(hdr - img) <= tol).all()


def test_visualize_cli(tmp_path):
    from mygpuraytracer_tpu.apps.visualize import main

    log = tmp_path / "log.jsonl"
    with open(log, "w") as f:
        for e in range(5):
            f.write(json.dumps({"epoch": e + 1, "loss": 1.0 / (e + 1)}) + "\n")
    assert main([str(tmp_path)]) == 0
    svg = str(tmp_path / "loss.svg")
    assert main([str(tmp_path), "--svg", svg]) == 0
    assert os.path.exists(svg)


def test_hdr_roundtrip(tmp_path):
    from mygpuraytracer_tpu.utils.image_io import read_hdr, write_hdr

    img = np.asarray(
        np.random.default_rng(2).random((12, 20, 3)) * 100.0, np.float32
    )
    path = str(tmp_path / "t.hdr")
    write_hdr(path, img)
    back = read_hdr(path)
    # shared-exponent format: absolute precision ~ pixel_max/128 per channel
    tol = img.max(axis=-1, keepdims=True) / 64 + 1e-4
    assert (np.abs(back - img) <= tol).all()


def test_denoise_cli_prefilter_aux(tmp_path):
    """--prefilter_aux denoises albedo/normal with rt_alb/rt_nrm first and
    runs the main filter with cleanAux (calb/cnrm weights) —
    training/infer.py:46-52,71-78 as a CLI pipeline."""
    from mygpuraytracer_tpu.apps.denoise import main
    from mygpuraytracer_tpu.utils.image_io import load_image, write_pfm

    rng = np.random.default_rng(1)
    write_pfm(str(tmp_path / "c.pfm"), rng.random((32, 32, 3)).astype(np.float32))
    write_pfm(str(tmp_path / "a.pfm"), rng.random((32, 32, 3)).astype(np.float32))
    write_pfm(
        str(tmp_path / "n.pfm"),
        (rng.random((32, 32, 3)) * 2 - 1).astype(np.float32),
    )
    common = [
        "--ldr", str(tmp_path / "c.pfm"),
        "--alb", str(tmp_path / "a.pfm"),
        "--nrm", str(tmp_path / "n.pfm"),
    ]
    rc = main(common + ["--prefilter_aux", "-o", str(tmp_path / "out.pfm")])
    assert rc == 0
    out = load_image(str(tmp_path / "out.pfm"))
    assert out.shape == (32, 32, 3) and np.isfinite(out).all()
    # and it differs from the non-prefiltered cleanAux run (the prefilter
    # nets change the aux features)
    rc = main(common + ["--clean_aux", "-o", str(tmp_path / "out2.pfm")])
    assert rc == 0
    out2 = load_image(str(tmp_path / "out2.pfm"))
    assert np.abs(out - out2).max() > 0


@pytest.mark.parametrize("mode", ["sample", "pixels"])
def test_raytrace_cli_multichip(tmp_path, mode):
    """--multichip renders match the sequential CLI image (8 virtual devs)."""
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from mygpuraytracer_tpu.apps.raytrace import main
    from mygpuraytracer_tpu.utils.png import read_png

    common = ["cornell", "--resolution", "32", "32", "--iterations", "8",
              "--batch", "4", "--no-denoise", "--quiet"]
    assert main(common + ["--out-dir", str(tmp_path / "seq")]) == 0
    assert main(common + ["--out-dir", str(tmp_path / mode),
                          "--multichip", mode]) == 0

    def samp(d):
        fn = [f for f in os.listdir(tmp_path / d) if f.endswith("samp.png")][0]
        return read_png(str(tmp_path / d / fn))

    np.testing.assert_allclose(samp("seq"), samp(mode), atol=1.5 / 255)


def test_raytrace_cli_multichip_gets_resolved_options(tmp_path, monkeypatch):
    """The CLI must hand _render_multichip the Renderer's RESOLVED options:
    on TPU the sharded render path reaches ops/trace._winner_ex, which
    rejects winner_table="auto" (the CLI default) by design. CPU runs skip
    the rows tier, so this pins the contract directly."""
    import mygpuraytracer_tpu.apps.raytrace as rt

    seen = {}

    def fake_multichip(r, options, iterations, mode, log):
        seen["options"] = options
        return iterations  # pretend everything rendered

    monkeypatch.setattr(rt, "_render_multichip", fake_multichip)
    rc = rt.main(["cornell", "--resolution", "16", "16", "--iterations", "4",
                  "--no-denoise", "--quiet", "--multichip", "sample",
                  "--out-dir", str(tmp_path)])
    assert rc == 0
    assert seen["options"].winner_table != "auto"
    assert seen["options"].mesh_sort is not None  # auto resolved at init


def test_raytrace_cli_warns_sort_with_explicit_megakernel(
        tmp_path, monkeypatch, capsys):
    """--sort-by-material with --megakernel on cannot sort (the megakernel
    has no material-order concept); the CLI must say so instead of letting
    a timing run silently measure the unsorted megakernel. The render is
    stubbed: the megakernel itself cannot execute on the CPU backend."""
    import mygpuraytracer_tpu.apps.raytrace as rt

    monkeypatch.setattr(rt, "_render_multichip",
                        lambda r, options, iterations, mode, log: iterations)
    rc = rt.main(["cornell", "--resolution", "16", "16", "--iterations", "2",
                  "--no-denoise", "--quiet", "--megakernel", "on",
                  "--multichip", "sample", "--sort-by-material",
                  "--out-dir", str(tmp_path)])
    assert rc == 0
    assert "no effect" in capsys.readouterr().err


def test_preprocess_cli_defaults_to_cpu(tmp_path, monkeypatch):
    """Host-side preprocessing must not run on a pinned accelerator backend
    (under the axon sitecustomize it would remote-compile per image shape);
    the CLI forces CPU unless --platform overrides."""
    import mygpuraytracer_tpu.apps.preprocess as pp

    seen = {}
    monkeypatch.setattr(
        "mygpuraytracer_tpu.utils.platform.force_platform",
        lambda name: seen.setdefault("platform", name))
    rc = pp.main(["ldr", "-D", str(tmp_path / "none"),
                  "-P", str(tmp_path / "preproc"), "-t", "missing"])
    assert rc == 0
    assert seen["platform"] == "cpu"


def test_preprocess_cli_roundtrip(tmp_path):
    """preprocess CLI (training/preprocess.py parity): EXR feature groups ->
    npy input/target pairs loadable by TileDataset, with the reference's
    grouping (spp-suffixed inputs, _ref target), transfer + fp16, and the
    clean_aux input assembly (noisy main + clean aux from the target)."""
    from mygpuraytracer_tpu.apps.preprocess import main
    from mygpuraytracer_tpu.train.dataset import TileDataset
    from mygpuraytracer_tpu.utils.image_io import save_image

    rng = np.random.default_rng(5)
    data = tmp_path / "data" / "train1"
    data.mkdir(parents=True)
    h, w = 40, 48
    for group in ("scene1", "scene2"):
        for member in (f"{group}_0016spp", f"{group}_ref"):
            for feat in ("ldr", "alb", "nrm"):
                img = rng.random((h, w, 3), np.float32).astype(np.float32)
                if feat == "nrm":
                    img = img * 2.0 - 1.0
                save_image(str(data / f"{member}.{feat}.exr"), img)

    rc = main([
        "ldr", "albedo", "normal",
        "-D", str(tmp_path / "data"), "-P", str(tmp_path / "preproc"),
        "-t", "train1",
    ])
    assert rc == 0
    out = tmp_path / "preproc" / "train1"
    files = sorted(os.listdir(out))
    assert "samples.json" in files and "config.json" in files
    inputs = [f for f in files if f.endswith(".input.npy")]
    assert len(inputs) == 2  # one noisy input per group
    x = np.load(out / "scene1_0016spp.input.npy")
    y = np.load(out / "scene1_0016spp.target.npy")
    assert x.dtype == np.float16 and y.dtype == np.float16
    assert x.shape == (h, w, 9) and y.shape == (h, w, 3)
    # srgb transfer applied to the main channels only: alb/nrm untouched
    alb_src = np.asarray(
        __import__("mygpuraytracer_tpu.utils.image_io", fromlist=["load_image"])
        .load_image(str(data / "scene1_0016spp.alb.exr")), np.float32)
    np.testing.assert_allclose(
        np.asarray(x[..., 3:6], np.float32), np.clip(alb_src, 0, 1), atol=2e-3)
    # the trainer's dataset class accepts the directory wholesale
    ds = TileDataset(str(out), tile_size=32)
    bx, by = ds.sample_batch(2)
    assert bx.shape == (2, 32, 32, 9) and by.shape == (2, 32, 32, 3)

    # clean_aux: input = noisy main + CLEAN aux (from the target image)
    rc = main([
        "ldr", "alb", "nrm", "--clean_aux",
        "-D", str(tmp_path / "data"), "-P", str(tmp_path / "preproc_ca"),
        "-t", "train1",
    ])
    assert rc == 0
    xc = np.load(tmp_path / "preproc_ca" / "train1" / "scene1_0016spp.input.npy")
    assert xc.shape == (h, w, 9)
    ref_alb = np.asarray(
        __import__("mygpuraytracer_tpu.utils.image_io", fromlist=["load_image"])
        .load_image(str(data / "scene1_ref.alb.exr")), np.float32)
    np.testing.assert_allclose(
        np.asarray(xc[..., 3:6], np.float32), np.clip(ref_alb, 0, 1), atol=2e-3)
