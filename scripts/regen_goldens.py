"""Regenerate golden renders + bundled scene files (scripts/test.py
'baseline' mode equivalent). Run on CPU so goldens are platform-stable:

    JAX_PLATFORMS=cpu python scripts/regen_goldens.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

from mygpuraytracer_tpu.config import RenderOptions
from mygpuraytracer_tpu.render import Renderer
from mygpuraytracer_tpu.scene.builtin import cornell_box, cornell_glass, emissive_sphere
from mygpuraytracer_tpu.scene.writer import save_scene


def main():
    os.makedirs("scenes", exist_ok=True)
    os.makedirs("tests/golden", exist_ok=True)
    for name, maker in (
        ("cornell", cornell_box),
        ("cornellGlass", cornell_glass),
        ("sphere", emissive_sphere),
    ):
        save_scene(maker(), f"scenes/builtin_{name}.txt")

    for name, maker in (
        ("cornell_64_32spp", cornell_box),
        ("cornellGlass_64_32spp", cornell_glass),
    ):
        s = maker(resolution=(64, 64))
        r = Renderer(s, RenderOptions(), seed=0)
        r.render(iterations=32, batch=8)
        np.save(f"tests/golden/{name}.npy", r.beauty().astype(np.float32))
        print(f"{name}: mean {r.beauty().mean():.4f}")

    # Paths most at risk under BVH/megakernel work (VERDICT r1 weak #6):
    # the small-mesh tier (cornellObj), DoF, and the cluster-mesh tier.
    from mygpuraytracer_tpu.scene import load_scene

    specs = [
        ("cornellObj_64_16spp", "/root/reference/scenes/cornellObj.txt",
         (64, 64), 16, RenderOptions()),
        ("cornellDof_64_16spp", None, (64, 64), 16,
         RenderOptions(depth_of_field=True, focal_distance=11.0)),
        ("shipOnly_32_4spp", "scenes/shipOnly.txt", (32, 32), 4,
         RenderOptions()),
        # round 3: the textured/bumped 23k-face tier and the reference's
        # real cottage asset end-to-end
        ("shipTexOnly_32_4spp", "scenes/shipTexOnly.txt", (32, 32), 4,
         RenderOptions()),
        ("cornellCottage_32_4spp", "scenes/cornellCottage.txt", (32, 32), 4,
         RenderOptions()),
    ]
    for name, path, res, spp, opts in specs:
        s = load_scene(path) if path else cornell_box()
        s.set_resolution(*res)
        r = Renderer(s, opts, seed=0)
        r.render(iterations=spp, batch=min(spp, 8))
        np.save(f"tests/golden/{name}.npy", r.beauty().astype(np.float32))
        print(f"{name}: mean {r.beauty().mean():.4f}")


if __name__ == "__main__":
    main()
