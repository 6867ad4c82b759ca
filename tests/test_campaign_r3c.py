"""Round-3c campaign driver: device-composed slot stacks + keep-best.

The campaign runs unattended for hours on the TPU queue; these CPU smokes
cover the two pieces a crash there would trace back to — the on-device
recipe composition and the keep-best train/eval/restore loop."""

import json
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

import campaign_r2 as c
import run_campaign_r3c as r3c


def _fake_master(rng, size=64):
    return {
        "noisy_color": rng.uniform(0, 2, (size, size, 3)).astype(np.float32),
        "noisy_albedo": rng.uniform(0, 1, (size, size, 3)).astype(np.float32),
        "noisy_normal": rng.uniform(-1, 1, (size, size, 3)).astype(np.float32),
        "clean_color": rng.uniform(0, 2, (size, size, 3)).astype(np.float32),
        "clean_albedo": rng.uniform(0, 1, (size, size, 3)).astype(np.float32),
        "clean_normal": rng.uniform(-1, 1, (size, size, 3)).astype(np.float32),
    }


@pytest.mark.parametrize("slot", c.ALL_SLOTS)
def test_recipe_dev_matches_recipe(slot):
    if slot == "rtlightmap_dir":
        pytest.skip("dir slot trains from disk pairs, not masters")
    import jax.numpy as jnp

    rng = np.random.default_rng(7)
    m = _fake_master(rng, size=16)
    dev = {k: jnp.asarray(v[None]) for k, v in m.items()}  # P=1 stacks
    x_host, y_host = c.recipe({k: v[None] for k, v in m.items()}, slot)
    x_dev, y_dev = r3c.recipe_dev(dev, slot)
    np.testing.assert_allclose(np.asarray(x_dev), x_host, atol=1e-7)
    np.testing.assert_allclose(np.asarray(y_dev), y_host, atol=1e-7)


def test_keep_best_campaign_smoke(tmp_path, monkeypatch):
    """Two-epoch fine-tune of one slot over a fake 2+1-pose master pool:
    valid slices are prepped, the plane cache composes the train stack,
    eval rows are written, and the exported blob only replaces the
    committed TZA when it evals better."""
    from mygpuraytracer_tpu.denoise.unet import init_unet_params
    from mygpuraytracer_tpu.train.export import export_weights

    rng = np.random.default_rng(3)
    master = tmp_path / "master"
    (master / "valid").mkdir(parents=True)
    for i in range(2):
        np.savez(master / f"fake_c{i}.master.npz", **_fake_master(rng))
    np.savez(master / "valid" / "fake_c9.master.npz", **_fake_master(rng))

    weights_dir = tmp_path / "weights"
    weights_dir.mkdir()
    export_weights(init_unet_params(6, seed=5), str(weights_dir / "rt_ldr_alb.tza"))

    monkeypatch.setattr(c, "MASTER", str(master))
    monkeypatch.setattr(c, "SLOTS_DIR", str(tmp_path / "slots"))
    monkeypatch.setattr(c, "RESULTS_DIR", str(tmp_path / "results"))
    monkeypatch.setattr(c, "WEIGHTS_DIR", str(weights_dir))
    monkeypatch.setattr(c, "INIT_DIR", str(tmp_path / "no_such_dir"))
    monkeypatch.setattr(c, "STEPS_PER_EPOCH", 2)
    monkeypatch.setattr(c, "BATCH_SIZE", 2)
    monkeypatch.setattr(r3c, "DEADLINE_FILE", str(tmp_path / "deadline"))
    monkeypatch.setattr(r3c, "keep_path", lambda slot: str(tmp_path / f"pre_{slot}.tza"),
                        raising=False)

    r3c.run([("rt_ldr_alb", 2)])

    eval_path = str(tmp_path / "results") + "_eval.json"
    rows = json.load(open(eval_path))
    assert "rt_ldr_alb" in rows and np.isfinite(rows["rt_ldr_alb"]["rmse"])
    done = (tmp_path / "results" / "rt_ldr_alb" / "DONE").read_text()
    assert "kept-new" in done or "restored-previous" in done
    # valid slices exist for the slot (ValidationDataset + eval read them)
    assert (tmp_path / "slots" / "rt_ldr_alb" / "valid" / "fake_c9.input.npy").exists()


def test_deadline_skips_everything(tmp_path, monkeypatch):
    monkeypatch.setattr(c, "MASTER", str(tmp_path / "master"))
    monkeypatch.setattr(c, "SLOTS_DIR", str(tmp_path / "slots"))
    monkeypatch.setattr(r3c, "DEADLINE_FILE", str(tmp_path / "deadline"))
    (tmp_path / "master" / "valid").mkdir(parents=True)
    (tmp_path / "deadline").write_text("0")  # epoch 0: always past
    r3c.run([("rt_ldr_alb", 2)])  # must skip the slot without crashing
    assert not (tmp_path / "results" / "rt_ldr_alb").exists()
