"""Weights acquisition & the feature -> weights selection table.

The reference embeds 12 TZA blobs as C arrays (weights/, blob_to_cpp.py);
this checkout's weights/ files are git-LFS pointer stubs (132 bytes), so real
OIDN v1.4 weights must be provided out of band. Search order:

1. $MYGPURAYTRACER_TPU_WEIGHTS_DIR/<name>.tza
2. <repo>/weights/<name>.tza
3. /root/reference/weights/<name>.tza  (stubs -> rejected by the TZA parser)

If nothing valid is found, deterministic randomly-initialized parameters are
returned (flagged via the second tuple element) so the full pipeline stays
runnable and testable; output quality then reflects the untrained network.
"""

from __future__ import annotations

import os
import zlib

import numpy as np

from .tza import read_tza
from .unet import init_unet_params, params_from_tza

# input channel count per weights blob (unet.cpp feature selection)
WEIGHTS_CHANNELS = {
    "rt_hdr": 3,
    "rt_ldr": 3,
    "rt_hdr_alb": 6,
    "rt_ldr_alb": 6,
    "rt_hdr_alb_nrm": 9,
    "rt_ldr_alb_nrm": 9,
    "rt_hdr_calb_cnrm": 9,
    "rt_ldr_calb_cnrm": 9,
    "rt_alb": 3,
    "rt_nrm": 3,
    "rtlightmap_hdr": 3,
    "rtlightmap_dir": 3,
}

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_cache: dict[str, tuple[dict, bool]] = {}


def _search_dirs() -> list[str]:
    dirs = []
    env = os.environ.get("MYGPURAYTRACER_TPU_WEIGHTS_DIR")
    if env:
        dirs.append(env)
    dirs.append(os.path.join(os.path.dirname(_REPO_ROOT), "weights"))
    dirs.append(os.path.join(_REPO_ROOT, "weights"))
    dirs.append("/root/reference/weights")
    return dirs


def load_default_params(name: str):
    """Returns (params, used_random_init)."""
    if name in _cache:
        return _cache[name]
    if name not in WEIGHTS_CHANNELS:
        raise ValueError(f"unknown weights blob '{name}'")
    for d in _search_dirs():
        path = os.path.join(d, f"{name}.tza")
        if os.path.isfile(path):
            try:
                tensors = read_tza(path)
            except ValueError:
                continue  # LFS stub or corrupt
            params = params_from_tza(tensors)
            _cache[name] = (params, False)
            return _cache[name]
    # Deterministic fallback seeded by the blob name. crc32, not hash():
    # Python salts str.__hash__ per process, which would make the "random"
    # init differ across runs.
    seed = zlib.crc32(name.encode()) % (2**31)
    params = init_unet_params(WEIGHTS_CHANNELS[name], seed=seed)
    _cache[name] = (params, True)
    return _cache[name]


def load_params_from_blob(blob: bytes):
    """User-provided weights via Filter.set_data('weights', ...)."""
    tensors = read_tza(blob)
    return params_from_tza(tensors), False
