"""Train a denoiser weight slot on framework-rendered pairs and export TZA.

Usage: python scripts/train_denoiser.py [weights_name] [data_dir] [epochs]
weights_name: rt_ldr_alb (color+albedo, default) | rt_ldr (color only) | ...
Exports weights/<name>.tza on completion (picked up automatically by the
filter API's weights search path).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mygpuraytracer_tpu.denoise.weights import WEIGHTS_CHANNELS
from mygpuraytracer_tpu.train.export import export_weights
from mygpuraytracer_tpu.train.train import TrainConfig, train


def main():
    name = sys.argv[1] if len(sys.argv) > 1 else "rt_ldr_alb"
    data_dir = sys.argv[2] if len(sys.argv) > 2 else "data/denoise"
    epochs = int(sys.argv[3]) if len(sys.argv) > 3 else 200
    max_lr = float(sys.argv[4]) if len(sys.argv) > 4 else 2e-4
    loss = sys.argv[5] if len(sys.argv) > 5 else "l1_msssim"

    # Per-slot transfer config mirrors the runtime (RTFilter/RTLightmapFilter
    # getTransferFunc + snorm rules, core/unet.cpp:613-621,693-763).
    if name.startswith("rtlightmap"):
        transfer, hdr, snorm = "log", True, False
    elif name == "rt_nrm":
        transfer, hdr, snorm = "linear", False, True
    elif name == "rt_alb":
        transfer, hdr, snorm = "srgb", False, False
    else:
        transfer = "pu" if "hdr" in name else "srgb"
        hdr = "hdr" in name
        snorm = False

    cfg = TrainConfig(
        data_dir=data_dir,
        result_dir=f"results/{name}",
        in_channels=WEIGHTS_CHANNELS[name],
        loss=loss,
        num_epochs=epochs,
        steps_per_epoch=16,
        batch_size=8,
        tile_size=128,
        max_lr=max_lr,
        precision="float32",
        save_epochs=25,
        transfer=transfer,
        hdr=hdr,
        snorm=snorm,
    )
    params = train(cfg, log_fn=lambda rec: print(
        f"epoch {rec['epoch']}: loss {rec['loss']:.4f} "
        f"lr {rec['lr']:.2e} {rec['images_per_sec']:.1f} img/s", flush=True))

    os.makedirs("weights", exist_ok=True)
    export_weights(params, f"weights/{name}.tza")
    print(f"exported weights/{name}.tza")


if __name__ == "__main__":
    main()
