"""Textured variant of the procedural spaceship stand-in.

The reference's flagship textured workload is the Intergalactic Spaceship
OBJ with kd/ks/ke/bump maps (reference scenes/cornellSpaceship.txt,
apps/src/scene.cpp:132-218) — the mesh itself is absent from the checkout
(SURVEY.md section 0) while its .mtl and textures/*.jpg survive. This script
builds on gen_spaceship.py's ~23k-face geometry and adds:

- cylindrical per-vertex UVs (seam at -y, caps included);
- deterministic procedural 256x256 kd/ks/ke/bump maps (hull panels, glowing
  window strips, tangent-space groove normal map) written as PNGs;
- scenes/models/spaceship_tex.obj + materials/spaceship_tex.mtl wired to
  those maps (the hermetic, in-repo textured flagship);
- scenes/models/spaceship_real.obj whose mtllib points at the REFERENCE's
  real Intergalactic_Spaceship .mtl + 4k .jpg textures (exercises jpg
  decode, names with spaces, and Windows path separators end-to-end); the
  loader resolves it only where /root/reference exists.

Usage: python scripts/gen_spaceship_tex.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from gen_spaceship import build  # noqa: E402

REF_MTL = "/root/reference/models/materials/Intergalactic_Spaceship-(Wavefront).mtl"


def cylindrical_uv(v):
    """u around the hull (atan2 about the z axis), v along the length."""
    u = np.arctan2(v[:, 0], v[:, 1]) / (2 * np.pi) + 0.5
    z0, z1 = v[:, 2].min(), v[:, 2].max()
    vv = (v[:, 2] - z0) / max(z1 - z0, 1e-9)
    return np.stack([u, vv], 1)


def make_textures(size=256, seed=7):
    rng = np.random.default_rng(seed)
    y, x = np.mgrid[0:size, 0:size] / size

    # hull panel grid: darker seams every ~24px with jittered offsets
    panel = np.ones((size, size))
    for k in range(0, size, 24):
        j = int(rng.integers(-2, 3))
        panel[:, (k + j) % size] *= 0.55
        panel[(k + j) % size, :] *= 0.6
    shade = 0.75 + 0.25 * np.sin(x * 9.1 + 1.3) * np.cos(y * 7.7)
    base = np.stack([0.55 * shade, 0.58 * shade, 0.66 * shade], -1)
    stripe = ((y * 8).astype(int) % 8 == 3)[..., None]
    base = np.where(stripe, np.array([0.70, 0.25, 0.18]) * shade[..., None], base)
    kd = np.clip(base * panel[..., None], 0, 1)

    ks = np.clip(0.25 + 0.5 * panel[..., None] * shade[..., None], 0, 1)
    ks = np.repeat(ks[..., :1], 3, axis=-1)

    ke = np.zeros((size, size, 3))
    windows = ((x * 24).astype(int) % 6 == 2) & ((y * 48).astype(int) % 12 == 5)
    ke[windows] = (0.2, 0.8, 1.0)

    # tangent-space normal map: grooves along the panel seams
    h = panel  # treat panel darkness as a height field
    gx = np.roll(h, -1, 1) - np.roll(h, 1, 1)
    gy = np.roll(h, -1, 0) - np.roll(h, 1, 0)
    n = np.stack([-gx * 2.0, -gy * 2.0, np.ones_like(h)], -1)
    n /= np.linalg.norm(n, axis=-1, keepdims=True)
    bump = n * 0.5 + 0.5

    return {"kd": kd, "ks": ks, "ke": ke, "bump": bump}


def save_png(path, img01):
    from PIL import Image

    arr = (np.clip(img01, 0, 1) * 255).astype(np.uint8)
    Image.fromarray(arr).save(path)


def write_obj(path, v, f, uv, mtllib, mtlname="shipTex"):
    from gen_spaceship import face_normals

    n = face_normals(v, f)
    with open(path, "w") as fh:
        fh.write("# textured procedural spaceship (gen_spaceship_tex.py)\n")
        fh.write(f"mtllib {mtllib}\n")
        for p in v:
            fh.write(f"v {p[0]:.6f} {p[1]:.6f} {p[2]:.6f}\n")
        for p in uv:
            fh.write(f"vt {p[0]:.6f} {p[1]:.6f}\n")
        for p in n:
            fh.write(f"vn {p[0]:.6f} {p[1]:.6f} {p[2]:.6f}\n")
        fh.write(f"usemtl {mtlname}\n")
        for i, face in enumerate(f):
            a, b, c = face + 1
            fh.write(f"f {a}/{a}/{i+1} {b}/{b}/{i+1} {c}/{c}/{i+1}\n")


def main():
    root = os.path.join(os.path.dirname(os.path.abspath(__file__)), os.pardir)
    models = os.path.join(root, "scenes", "models")
    mats = os.path.join(models, "materials")
    texd = os.path.join(root, "scenes", "textures")
    for d in (models, mats, texd):
        os.makedirs(d, exist_ok=True)

    v, f = build()
    nrm = np.cross(v[f[:, 1]] - v[f[:, 0]], v[f[:, 2]] - v[f[:, 0]])
    f = f[np.linalg.norm(nrm, axis=1) > 1e-12]
    uv = cylindrical_uv(v)

    for name, img in make_textures().items():
        save_png(os.path.join(texd, f"ship_{name}.png"), img)

    with open(os.path.join(mats, "spaceship_tex.mtl"), "w") as fh:
        fh.write(
            "newmtl shipTex\n"
            "Kd 0.64 0.64 0.64\nKs 0.5 0.5 0.5\nKe 0 0 0\nNi 1.45\nNs 96\n"
            "map_Kd ../textures/ship_kd.png\n"
            "map_Ks ../textures/ship_ks.png\n"
            "map_Ke ../textures/ship_ke.png\n"
            "map_Bump ../textures/ship_bump.png\n"
        )
    write_obj(os.path.join(models, "spaceship_tex.obj"), v, f, uv,
              "spaceship_tex.mtl")
    # real-asset variant: same geometry/uv, reference materials + textures
    write_obj(os.path.join(models, "spaceship_real.obj"), v, f, uv,
              REF_MTL, mtlname="Material")
    print(f"spaceship_tex/real: {len(v)} verts, {len(f)} faces + 4 maps")


if __name__ == "__main__":
    main()
