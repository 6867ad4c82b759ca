"""Train the rt_ldr_alb denoiser on framework-rendered pairs and export TZA.

Usage: python scripts/train_denoiser.py [data_dir] [epochs] [result_dir]
Exports weights/rt_ldr_alb.tza on completion (picked up automatically by the
filter API's weights search path).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mygpuraytracer_tpu.train.export import export_weights
from mygpuraytracer_tpu.train.train import TrainConfig, train


def main():
    data_dir = sys.argv[1] if len(sys.argv) > 1 else "data/denoise"
    epochs = int(sys.argv[2]) if len(sys.argv) > 2 else 60
    result_dir = sys.argv[3] if len(sys.argv) > 3 else "results/rt_ldr_alb"

    cfg = TrainConfig(
        data_dir=data_dir,
        result_dir=result_dir,
        in_channels=6,
        loss="l1_msssim",
        num_epochs=epochs,
        steps_per_epoch=16,
        batch_size=8,
        tile_size=128,
        max_lr=2e-4,
        precision="float32",
        save_epochs=10,
    )
    params = train(cfg, log_fn=lambda rec: print(
        f"epoch {rec['epoch']}: loss {rec['loss']:.4f} "
        f"lr {rec['lr']:.2e} {rec['images_per_sec']:.1f} img/s", flush=True))

    os.makedirs("weights", exist_ok=True)
    export_weights(params, "weights/rt_ldr_alb.tza")
    print("exported weights/rt_ldr_alb.tza")


if __name__ == "__main__":
    main()
