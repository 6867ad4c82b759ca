"""Training toolkit tests: losses, trainer step, checkpoint/resume, export."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mygpuraytracer_tpu.denoise.tza import read_tza
from mygpuraytracer_tpu.denoise.unet import init_unet_params, params_from_tza, unet_apply
from mygpuraytracer_tpu.train.export import export_weights
from mygpuraytracer_tpu.train.losses import get_loss_function
from mygpuraytracer_tpu.train.ssim import ms_ssim, ssim
from mygpuraytracer_tpu.train.train import TrainConfig, latest_checkpoint, train
from mygpuraytracer_tpu.train.dataset import TileDataset, _dihedral


def test_ssim_identity():
    x = jax.random.uniform(jax.random.key(0), (1, 64, 64, 3))
    assert float(ssim(x, x)) > 0.999
    assert float(ms_ssim(x, x)) > 0.999


def test_ssim_decreases_with_noise():
    x = jax.random.uniform(jax.random.key(0), (1, 64, 64, 3))
    noisy = x + 0.3 * jax.random.normal(jax.random.key(1), x.shape)
    assert float(ssim(x, noisy)) < float(ssim(x, x))


def test_msssim_bounded_on_near_constant_tiles():
    """MS-SSIM (sum form) must never exceed 1: the sigma estimators are
    catastrophic cancellations and float error can push cs past 1 on
    near-constant windows — observed on TPU (bf16 default-precision convs)
    as a NEGATIVE validation loss that corrupted best-valid selection.
    _ssim_parts now clamps the covariance to the PSD cone and filters at
    Precision.HIGHEST."""
    rng = np.random.default_rng(5)
    flat = 0.9 + 1e-4 * rng.standard_normal((1, 64, 64, 3)).astype(np.float32)
    flat2 = 0.9 + 1e-4 * rng.standard_normal((1, 64, 64, 3)).astype(np.float32)
    for a, b in ((flat, flat2), (flat, flat), (flat, np.zeros_like(flat))):
        v = float(ms_ssim(jnp.asarray(a), jnp.asarray(b), product=False))
        assert v <= 1.0 + 1e-5, v
    loss = get_loss_function("l1_msssim")
    assert float(loss(jnp.asarray(flat), jnp.asarray(flat2))) >= -1e-5


def test_losses_zero_at_identity():
    x = jax.random.uniform(jax.random.key(2), (1, 48, 48, 3)) * 0.8 + 0.1
    for name in ("l1", "l2", "mape", "smape", "l1_grad"):
        loss = get_loss_function(name)
        assert float(loss(x, x)) < 1e-6, name
    assert float(get_loss_function("l1_msssim")(x, x)) < 1e-3


def test_invalid_loss():
    with pytest.raises(ValueError):
        get_loss_function("bogus")


def test_dihedral_shapes():
    img = np.arange(2 * 3 * 1).reshape(2, 3, 1).astype(np.float32)
    seen = set()
    for k in range(8):
        out = _dihedral(img, k)
        seen.add(out.tobytes() + bytes(out.shape[0]))
    assert len(seen) == 8  # all 8 variants distinct for an asymmetric image


def _make_dataset(tmp_path, n=2, size=48):
    rng = np.random.default_rng(0)
    for i in range(n):
        x = rng.random((size, size, 6), np.float32)
        y = rng.random((size, size, 3), np.float32)
        np.save(tmp_path / f"s{i}.input.npy", x)
        np.save(tmp_path / f"s{i}.target.npy", y)
    return str(tmp_path)


def test_tile_dataset(tmp_path):
    d = TileDataset(_make_dataset(tmp_path), tile_size=32)
    x, y = d.sample_batch(4)
    assert x.shape == (4, 32, 32, 6)
    assert y.shape == (4, 32, 32, 3)


def test_train_smoke_and_resume(tmp_path):
    data = _make_dataset(tmp_path / "data" if (tmp_path / "data").mkdir() or True else "", size=48)
    cfg = TrainConfig(
        data_dir=data,
        result_dir=str(tmp_path / "result"),
        in_channels=6,
        loss="l1",
        num_epochs=2,
        steps_per_epoch=2,
        batch_size=2,
        tile_size=32,
        precision="float32",
        save_epochs=1,
    )
    params = train(cfg)
    assert latest_checkpoint(cfg.result_dir)["epoch"] == 2
    # resume: raising num_epochs continues from epoch 2
    cfg2 = TrainConfig(**{**cfg.__dict__, "num_epochs": 3})
    train(cfg2)
    assert latest_checkpoint(cfg.result_dir)["epoch"] == 3
    # loss decreased vs init on this overfit-tiny problem? just check logs exist
    assert os.path.exists(os.path.join(cfg.result_dir, "log.jsonl"))


def test_config_mismatch(tmp_path):
    cfg = TrainConfig(in_channels=6, loss="l1")
    with pytest.raises(ValueError, match="config mismatch"):
        cfg.check_compatible({"in_channels": 9, "loss": "l1", "tile_size": 256, "precision": "mixed"})


def test_export_roundtrip(tmp_path):
    params = init_unet_params(6, seed=3)
    path = str(tmp_path / "w.tza")
    export_weights(params, path)
    tensors = read_tza(path)
    assert "enc_conv0.weight" in tensors and tensors["enc_conv0.weight"][1] == "oihw"
    back = params_from_tza(tensors)
    x = jnp.ones((1, 32, 32, 6))
    np.testing.assert_allclose(
        np.asarray(unet_apply(params, x)), np.asarray(unet_apply(back, x)), atol=1e-5
    )


def test_validation_loop(tmp_path):
    """valid_loss is computed every valid_epochs over the deterministic tile
    grid (reference training/train.py:228-269) and logged to JSONL."""
    import json

    from mygpuraytracer_tpu.train.dataset import ValidationDataset

    (tmp_path / "data").mkdir()
    data = _make_dataset(tmp_path / "data", size=48)
    (tmp_path / "data" / "valid").mkdir()
    _make_dataset(tmp_path / "data" / "valid", n=1, size=64)
    cfg = TrainConfig(
        data_dir=data,
        result_dir=str(tmp_path / "result"),
        in_channels=6,
        loss="l1",
        num_epochs=2,
        steps_per_epoch=4,  # one-cycle schedule degenerates below ~4 steps
        batch_size=2,
        tile_size=32,
        precision="float32",
        save_epochs=2,
        valid_epochs=1,
    )
    train(cfg)
    recs = [json.loads(l) for l in open(os.path.join(cfg.result_dir, "log.jsonl"))]
    assert all("valid_loss" in r for r in recs)
    assert all(np.isfinite(r["valid_loss"]) for r in recs)
    # determinism: the valid grid is fixed, so two evals of the same params
    # give the same number
    vd = ValidationDataset(str(tmp_path / "data" / "valid"), 32)
    tiles1 = [t[0].sum() for t in vd.tiles()]
    tiles2 = [t[0].sum() for t in vd.tiles()]
    assert tiles1 == tiles2 and len(tiles1) == 4  # 64/32 -> 2x2 grid


def test_validation_padded_batch_weighting(tmp_path):
    """The repeated tiles padding the last batch must not affect the loss."""
    from mygpuraytracer_tpu.train.dataset import ValidationDataset
    from mygpuraytracer_tpu.train.train import build_eval_step, validate

    (tmp_path / "v").mkdir()
    _make_dataset(tmp_path / "v", n=1, size=96)  # 3x3 = 9 tiles of 32
    cfg = TrainConfig(
        in_channels=6, loss="l1", batch_size=4, tile_size=32, precision="float32"
    )
    from mygpuraytracer_tpu.denoise.unet import init_unet_params

    params = init_unet_params(6, seed=0)
    vd = ValidationDataset(str(tmp_path / "v"), 32)
    eval_fn = build_eval_step(cfg, None)
    # 9 tiles with batch 4 -> batches of 4,4,1(+3 pad)
    v1 = validate(cfg, params, vd, eval_fn)
    cfg2 = TrainConfig(**{**cfg.__dict__, "batch_size": 3})  # 3,3,3 no padding
    v2 = validate(cfg2, params, vd, build_eval_step(cfg2, None))
    np.testing.assert_allclose(v1, v2, rtol=1e-5)


def test_infer_aux_prefilter_chain():
    """Infer with aux_infers prefilters albedo/normal channels before the
    main 9-channel net (training/infer.py:46-52,71-78)."""
    from mygpuraytracer_tpu.denoise.unet import init_unet_params
    from mygpuraytracer_tpu.train.infer import Infer

    main = Infer(init_unet_params(9, seed=0), transfer="srgb")
    alb = Infer(init_unet_params(3, seed=1), transfer="srgb")
    nrm = Infer(init_unet_params(3, seed=2), snorm=True)
    chained = Infer(
        init_unet_params(9, seed=0),
        transfer="srgb",
        aux_infers={"albedo": alb, "normal": nrm},
    )
    rng = np.random.default_rng(0)
    img = np.concatenate(
        [
            rng.random((24, 24, 3)),
            rng.random((24, 24, 3)),
            rng.random((24, 24, 3)) * 2 - 1,
        ],
        axis=-1,
    ).astype(np.float32)
    y0 = main(img)
    y1 = chained(img)
    assert y0.shape == y1.shape == (24, 24, 3)
    assert np.isfinite(y1).all()
    assert np.abs(y0 - y1).max() > 0  # the prefilters changed the aux input


def test_infer_snorm_roundtrip():
    """snorm Infer keeps outputs in [-1,1] (rt_nrm convention)."""
    from mygpuraytracer_tpu.denoise.unet import init_unet_params
    from mygpuraytracer_tpu.train.infer import Infer

    f = Infer(init_unet_params(3, seed=3), snorm=True)
    rng = np.random.default_rng(1)
    out = f((rng.random((16, 16, 3)) * 2 - 1).astype(np.float32))
    assert out.min() >= -1.0 and out.max() <= 1.0


def test_train_device_smoke(tmp_path):
    """Device-resident trainer: one-dispatch epochs, same artifacts as
    train() (checkpoints, JSONL log, valid_loss)."""
    import json

    from mygpuraytracer_tpu.train.train import train_device

    rng = np.random.default_rng(0)
    x = rng.random((3, 48, 48, 6), np.float32)
    y = rng.random((3, 48, 48, 3), np.float32)
    (tmp_path / "valid").mkdir()
    _make_dataset(tmp_path / "valid", n=1, size=48)
    cfg = TrainConfig(
        data_dir=str(tmp_path),
        result_dir=str(tmp_path / "result"),
        in_channels=6,
        loss="l1",
        num_epochs=2,
        steps_per_epoch=4,
        batch_size=2,
        tile_size=32,
        precision="float32",
        save_epochs=2,
        valid_epochs=1,
    )
    train_device(cfg, x, y)
    assert latest_checkpoint(cfg.result_dir)["epoch"] == 2
    recs = [json.loads(l) for l in open(os.path.join(cfg.result_dir, "log.jsonl"))]
    assert len(recs) == 2 and all(np.isfinite(r["loss"]) for r in recs)
    assert all("valid_loss" in r and np.isfinite(r["valid_loss"]) for r in recs)


def test_train_device_ema(tmp_path):
    """With cfg.ema on, checkpoints carry the params EMA, the returned
    weights are the averaged point (not the raw SGD iterate), and resume
    restores the average."""
    from mygpuraytracer_tpu.train.train import train_device

    rng = np.random.default_rng(1)
    x = rng.random((3, 48, 48, 6), np.float32)
    y = rng.random((3, 48, 48, 3), np.float32)
    cfg = TrainConfig(
        data_dir=str(tmp_path),
        result_dir=str(tmp_path / "result"),
        in_channels=6,
        loss="l1",
        num_epochs=2,
        steps_per_epoch=4,
        batch_size=2,
        tile_size=32,
        precision="float32",
        save_epochs=1,
        ema=0.9,
    )
    out = train_device(cfg, x, y)
    ckpt = latest_checkpoint(cfg.result_dir)
    assert ckpt["epoch"] == 2 and "ema_params" in ckpt
    # the EMA lags the raw iterate after a fresh-init run
    diffs = jax.tree.leaves(jax.tree.map(
        lambda a, b: float(np.abs(np.asarray(a) - np.asarray(b)).max()),
        ckpt["ema_params"], ckpt["params"]))
    assert max(diffs) > 0
    np.testing.assert_allclose(
        np.asarray(jax.tree.leaves(out)[0]),
        np.asarray(jax.tree.leaves(ckpt["ema_params"])[0]))
    # resume restores the average and keeps training
    cfg.num_epochs = 3
    train_device(cfg, x, y)
    assert latest_checkpoint(cfg.result_dir)["epoch"] == 3


def test_warm_start_from_tza(tmp_path):
    """init_from accepts an exported .tza: a fresh machine keeps only the
    committed TZA form of a previous round's params (checkpoints live
    outside git), so fine-tune campaigns warm-start from it."""
    from mygpuraytracer_tpu.train.train import load_init_params

    src = init_unet_params(6, seed=11)
    tza_path = str(tmp_path / "warm.tza")
    export_weights(src, tza_path)
    loaded = load_init_params(tza_path)
    x = jnp.ones((1, 32, 32, 6))
    np.testing.assert_allclose(
        np.asarray(unet_apply(src, x)), np.asarray(unet_apply(loaded, x)),
        atol=1e-5,
    )

    # and a training run that starts from it (no checkpoint in result_dir)
    data = (tmp_path / "data")
    data.mkdir()
    cfg = TrainConfig(
        data_dir=_make_dataset(data, size=48),
        result_dir=str(tmp_path / "result"),
        in_channels=6,
        loss="l1",
        num_epochs=1,
        steps_per_epoch=1,
        batch_size=2,
        tile_size=32,
        precision="float32",
        save_epochs=1,
        init_from=tza_path,
    )
    train(cfg)
    assert latest_checkpoint(cfg.result_dir)["epoch"] == 1
