"""Image format conversion CLI (training/convert_image.py equivalent).

Usage: python -m mygpuraytracer_tpu.apps.convert_image IN OUT [--exposure E]
Supported: .pfm, .hdr, .npy (float) and .png/.ppm (LDR).
"""

from __future__ import annotations

import argparse
import sys

import numpy as np


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description="convert image formats")
    p.add_argument("input")
    p.add_argument("output")
    p.add_argument("--exposure", type=float, default=1.0,
                   help="linear exposure multiplier applied before saving")
    p.add_argument("--srgb", action="store_true",
                   help="apply sRGB encode when writing an LDR format")
    args = p.parse_args(argv)

    from ..utils.image_io import load_image, save_image

    img = load_image(args.input) * args.exposure
    if args.srgb and args.output.lower().endswith((".png", ".ppm")):
        import jax.numpy as jnp

        from ..denoise.color import SRGBTransfer, sanitize

        img = np.asarray(SRGBTransfer().forward(sanitize(jnp.asarray(img), 0.0, 1.0)))
    save_image(args.output, img)
    return 0


if __name__ == "__main__":
    sys.exit(main())
