"""Furnace test: renderer-level energy conservation.

The reference ships no renderer tests (SURVEY §4 — validation was visual);
this is the statistical check it lacks. A diffuse sphere of albedo rho
centered inside a large uniformly emissive enclosure must render at exactly
rho x (the directly-seen emitter value): a cosine-scattered ray leaving a
convex body cannot re-hit it, so every camera->sphere path carries exactly
one diffuse bounce before terminating on the emitter. The identity holds
whatever internal radiometric conventions are in play (the ke emission
rule, the pi gather factor — apps/src/interactions.h:188-239,
pathtrace.cu:583-653), because both sides of the ratio share them.
"""

import numpy as np
import pytest

from mygpuraytracer_tpu.config import RenderOptions
from mygpuraytracer_tpu.render import Renderer
from mygpuraytracer_tpu.scene.builtin import _camera, _geom, _material
from mygpuraytracer_tpu.scene.structs import GeomType, Scene

RHO = 0.6


def _furnace_scene(res=64):
    s = Scene(source_path="<test:furnace>")
    s.materials = [
        _material((1, 1, 1), emit=2.0),        # 0: uniform enclosure
        _material((RHO, RHO, RHO)),            # 1: diffuse probe sphere
    ]
    s.geoms = [
        _geom(GeomType.SPHERE, 0, (0, 0, 0), (0, 0, 0), (200, 200, 200)),
        _geom(GeomType.SPHERE, 1, (0, 0, 0), (0, 0, 0), (4, 4, 4)),
    ]
    s.all_faces = [[], []]
    _camera(s, res=(res, res), iters=64, depth=4, name="furnace",
            eye=(0.0, 0.0, 10.0), look_at=(0.0, 0.0, 0.0))
    return s


def test_furnace_energy_conservation():
    # wavefront path only: the megakernel's hardware PRNG has no CPU
    # interpret lowering (CLAUDE.md), and both paths share shade_soa's
    # radiometry (image-equivalence is covered by test_fastpath/test_golden)
    r = Renderer(_furnace_scene(), RenderOptions(megakernel=False), seed=7)
    r.step_many(64)
    img = np.asarray(r.beauty())
    h = img.shape[0]
    # emitter value from corner pixels (enclosure fills the background),
    # probe value from the center of the sphere's disk
    emitter = float(img[:4, :4].mean())
    probe = float(img[h // 2 - 4 : h // 2 + 4, h // 2 - 4 : h // 2 + 4].mean())
    assert emitter > 0.1
    ratio = probe / emitter
    # 64 spp over a 8x8 patch: MC s.e. well under 1%
    assert abs(ratio - RHO) < 0.02, (ratio, RHO, emitter, probe)
