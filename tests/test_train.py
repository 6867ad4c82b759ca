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
