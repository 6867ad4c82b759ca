"""Procedural spaceship stand-in mesh (>=20k faces).

The reference scene cornellSpaceship.txt references
models/Intergalactic_Spaceship-(Wavefront).obj, which is absent from the
checkout (SURVEY.md section 0 asset gotcha). This generates a deterministic
spaceship-class mesh of comparable scale (~2.5 units long, ~24k triangles):
lathed fuselage + cockpit bubble, swept tapered wings, twin engine nacelles,
and a dorsal fin — written as a plain OBJ (v/vn/f) so the standard loader
path (tinyobj equivalent) is exercised.

Usage: python scripts/gen_spaceship.py [out.obj]
"""

import sys

import numpy as np


def lathe(profile, n_seg, cap=True):
    """Revolve a 2D profile [(r, y), ...] around the Y axis -> (verts, faces)."""
    profile = np.asarray(profile, np.float64)
    n_ring = len(profile)
    ang = np.linspace(0, 2 * np.pi, n_seg, endpoint=False)
    verts = []
    for r, y in profile:
        ring = np.stack([r * np.cos(ang), np.full(n_seg, y), r * np.sin(ang)], 1)
        verts.append(ring)
    verts = np.concatenate(verts, 0)
    faces = []
    for i in range(n_ring - 1):
        for j in range(n_seg):
            a = i * n_seg + j
            b = i * n_seg + (j + 1) % n_seg
            c = (i + 1) * n_seg + j
            d = (i + 1) * n_seg + (j + 1) % n_seg
            faces.append((a, b, d))
            faces.append((a, d, c))
    if cap:
        base = len(verts)
        verts = np.concatenate(
            [verts, [[0, profile[0, 1], 0], [0, profile[-1, 1], 0]]], 0
        )
        for j in range(n_seg):
            faces.append((base, (j + 1) % n_seg, j))
            off = (n_ring - 1) * n_seg
            faces.append((base + 1, off + j, off + (j + 1) % n_seg))
    return verts, np.asarray(faces, np.int64)


def transform(verts, scale=(1, 1, 1), rot_x=0.0, rot_z=0.0, shift=(0, 0, 0)):
    v = verts * np.asarray(scale)
    if rot_x:
        c, s = np.cos(rot_x), np.sin(rot_x)
        v = v @ np.array([[1, 0, 0], [0, c, s], [0, -s, c]]).T
    if rot_z:
        c, s = np.cos(rot_z), np.sin(rot_z)
        v = v @ np.array([[c, s, 0], [-s, c, 0], [0, 0, 1]]).T
    return v + np.asarray(shift)


def tapered_box(length, root_chord, tip_chord, thickness, sweep, n=24):
    """A swept, tapered wing along +X made of n x n grid cells per side."""
    u = np.linspace(0, 1, n + 1)
    verts = []
    for ui in u:
        chord = root_chord + (tip_chord - root_chord) * ui
        x = ui * length
        z0 = ui * sweep - chord / 2
        for vi in u:
            z = z0 + vi * chord
            t = thickness * (1 - 0.7 * ui) * np.sin(np.pi * vi) * 0.5
            verts.append((x, t, z))
    for ui in u:
        chord = root_chord + (tip_chord - root_chord) * ui
        x = ui * length
        z0 = ui * sweep - chord / 2
        for vi in u:
            z = z0 + vi * chord
            t = thickness * (1 - 0.7 * ui) * np.sin(np.pi * vi) * 0.5
            verts.append((x, -t, z))
    verts = np.asarray(verts)
    faces = []
    m = n + 1
    for side, off, flip in ((0, 0, False), (1, m * m, True)):
        for i in range(n):
            for j in range(n):
                a = off + i * m + j
                b = a + 1
                c = a + m
                d = c + 1
                if flip:
                    faces.append((a, d, b))
                    faces.append((a, c, d))
                else:
                    faces.append((a, b, d))
                    faces.append((a, d, c))
    return verts, np.asarray(faces, np.int64)


def build(n_seg=72, n_prof=56, wing_n=32):
    parts = []

    # fuselage: smooth pointed-nose profile, lathed around Y then laid along Z
    t = np.linspace(0, 1, n_prof)
    radius = 0.28 * np.sin(np.pi * np.clip(t * 1.08, 0, 1)) ** 0.7 * (1 - 0.35 * t)
    profile = np.stack([np.maximum(radius, 1e-3), (t - 0.5) * 2.4], 1)
    v, f = lathe(profile, n_seg)
    parts.append((transform(v, rot_x=np.pi / 2), f))  # nose toward -z

    # cockpit bubble
    tb = np.linspace(0, 1, n_prof // 2)
    rb = 0.16 * np.sin(np.pi * tb) ** 0.8
    prof_b = np.stack([np.maximum(rb, 1e-3), (tb - 0.5) * 0.5], 1)
    v, f = lathe(prof_b, n_seg // 2)
    parts.append((transform(v, scale=(1, 1, 1.6), rot_x=np.pi / 2,
                            shift=(0, 0.22, -0.45)), f))

    # wings (mirrored)
    v, f = tapered_box(1.1, 0.8, 0.25, 0.10, 0.55, n=wing_n)
    parts.append((transform(v, shift=(0.12, 0.0, 0.1)), f))
    parts.append((transform(v, scale=(-1, 1, 1), shift=(-0.12, 0.0, 0.1)),
                  f[:, ::-1]))

    # engine nacelles (mirrored, open-back cylinders with inner wall)
    tn = np.linspace(0, 1, n_prof // 2)
    rn = 0.11 + 0.03 * np.sin(np.pi * tn)
    prof_n = np.stack([rn, (tn - 0.5) * 0.8], 1)
    v, f = lathe(prof_n, n_seg // 2)
    for sx in (1, -1):
        parts.append((transform(v, rot_x=np.pi / 2, shift=(sx * 0.65, -0.04, 0.55)),
                      f))

    # dorsal fin
    v, f = tapered_box(0.5, 0.55, 0.15, 0.06, 0.35, n=wing_n // 2)
    parts.append((transform(v, rot_z=np.pi / 2, shift=(0.0, 0.18, 0.55)), f))

    # merge
    all_v, all_f, off = [], [], 0
    for v, f in parts:
        all_v.append(v)
        all_f.append(f + off)
        off += len(v)
    return np.concatenate(all_v), np.concatenate(all_f)


def face_normals(v, f):
    e1 = v[f[:, 1]] - v[f[:, 0]]
    e2 = v[f[:, 2]] - v[f[:, 0]]
    n = np.cross(e1, e2)
    ln = np.linalg.norm(n, axis=1, keepdims=True)
    return n / np.maximum(ln, 1e-20)


def write_obj(path, v, f):
    n = face_normals(v, f)
    with open(path, "w") as fh:
        fh.write("# procedural spaceship stand-in (gen_spaceship.py)\n")
        for p in v:
            fh.write(f"v {p[0]:.6f} {p[1]:.6f} {p[2]:.6f}\n")
        for p in n:
            fh.write(f"vn {p[0]:.6f} {p[1]:.6f} {p[2]:.6f}\n")
        for i, face in enumerate(f):
            a, b, c = face + 1
            fh.write(f"f {a}//{i+1} {b}//{i+1} {c}//{i+1}\n")


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else "scenes/models/spaceship.obj"
    v, f = build()
    # drop degenerate faces (zero-area cap slivers)
    n = np.cross(v[f[:, 1]] - v[f[:, 0]], v[f[:, 2]] - v[f[:, 0]])
    keep = np.linalg.norm(n, axis=1) > 1e-12
    f = f[keep]
    import os

    os.makedirs(os.path.dirname(out), exist_ok=True)
    write_obj(out, v, f)
    print(f"{out}: {len(v)} verts, {len(f)} faces, "
          f"bbox {v.min(0).round(3)} .. {v.max(0).round(3)}")


if __name__ == "__main__":
    main()
