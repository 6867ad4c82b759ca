"""Export trained U-Net params to the TZA runtime weights format.

Equivalent of training/export.py:28-65: conv weights as 'oihw', biases as
'x', 64-byte aligned (the Writer handles alignment).
"""

from __future__ import annotations

import numpy as np

import jax

from ..denoise.tza import write_tza


def export_weights(params: dict, path: str) -> None:
    tensors = {}
    for name, p in params.items():
        w = np.asarray(jax.device_get(p["w"]), np.float32)
        b = np.asarray(jax.device_get(p["b"]), np.float32)
        # HWIO -> OIHW
        tensors[f"{name}.weight"] = (np.transpose(w, (3, 2, 0, 1)).copy(), "oihw")
        tensors[f"{name}.bias"] = (b, "x")
    write_tza(path, tensors)


def load_checkpoint_params(result_dir: str):
    from .train import latest_checkpoint

    ckpt = latest_checkpoint(result_dir)
    if ckpt is None:
        raise FileNotFoundError(f"no checkpoint in {result_dir}")
    return ckpt["params"]
