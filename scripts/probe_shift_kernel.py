"""Milestone-B probe: sublane-shifted face layout for the cluster tier.

Today a cluster visit costs 128 roll-steps for a whole (8,128)=1024-ray
block (one face per ray per step). Prototype B stores each face-plane
quantity as an (8,128) block whose sublane s holds the cluster's faces
shifted by 16*s lanes; rays enter as a single broadcast (1,128) row, so one
step tests 8 faces per ray and a visit takes 16 steps. Visits are decided
per 128-ray row (union ~4.2 clusters vs ~12.2 for 1024 rays at the diffuse
bounce, scripts/sim_union_blocks.py), so total roll-steps shrink ~3x.

Probes (shipOnly 256^2 camera rays, real 183-cluster ship):
  A  current kernel (mesh_pallas_hit)              — baseline ms/iter
  A0 current kernel, t_cap=0 (no visits)           — slab+cond overhead
  B  shifted prototype (rows_per_visit=1)          — candidate
  B0 shifted prototype, t_cap=0                    — its overhead floor

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_shift_kernel.py [cpu]
"""

import os
import sys
import time

import numpy as np

if len(sys.argv) > 1 and sys.argv[1] == "cpu":
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
else:
    import jax

import jax.numpy as jnp
from jax import lax

from mygpuraytracer_tpu.ops.trace import HIT_EPS, mesh_pallas_hit
from mygpuraytracer_tpu.ops.vec3 import Vec3
from mygpuraytracer_tpu.scene import load_scene
from mygpuraytracer_tpu.scene.device_scene import build_device_scene

RES = 256
SHIFT = 16  # lanes between sublane copies (128/8)


def build_shifted(fp: np.ndarray, cs: int) -> np.ndarray:
    """[16, Fp] plane-form -> [128, Fp]: row q*8+s = quantity q rolled by
    -16*s lanes within each cluster (so lane l at step k tests face
    (l + 16*s + k) % cs of its cluster)."""
    q_rows, Fp = fp.shape
    out = np.zeros((q_rows * 8, Fp), np.float32)
    n_clus = Fp // cs
    for q in range(q_rows):
        for s in range(8):
            for c in range(n_clus):
                blk = fp[q, c * cs : (c + 1) * cs]
                out[q * 8 + s, c * cs : (c + 1) * cs] = np.roll(blk, -SHIFT * s)
    return out


def shift_cluster_hit(meta, fs_ref, o, d, t_cap):
    """Shifted-layout cluster walk on an (8,128) ray block; visits decided
    per 128-ray sublane row."""
    from jax.experimental.pallas import tpu as pltpu

    CS = meta.cluster_size
    shape = o.x.shape  # (8,128)
    zeros = jnp.zeros(shape, jnp.float32)
    eps = 1e-20
    ix = 1.0 / jnp.where(jnp.abs(d.x) < eps, eps, d.x)
    iy = 1.0 / jnp.where(jnp.abs(d.y) < eps, eps, d.y)
    iz = 1.0 / jnp.where(jnp.abs(d.z) < eps, eps, d.z)
    rowi = lax.broadcasted_iota(jnp.int32, shape, 0)

    best = (t_cap, zeros, zeros, zeros, zeros - 1.0)

    def visit_row(r, c, best):
        bt, bx, by, bz, bg = best
        orow = Vec3(o.x[r : r + 1], o.y[r : r + 1], o.z[r : r + 1])
        drow = Vec3(d.x[r : r + 1], d.y[r : r + 1], d.z[r : r + 1])
        # partial best per (shift-sublane, ray-lane)
        pt = bt[r : r + 1] + zeros  # broadcast row r over sublanes
        pn = (zeros, zeros, zeros, zeros - 1.0)
        sl_c = slice(c * CS, (c + 1) * CS)
        blks = tuple(fs_ref[q * 8 : (q + 1) * 8, sl_c] for q in range(13))

        def step(k, carry):
            pt, px_, py_, pz_, pg = carry[:5]
            B = carry[5:]
            fnx, fny, fnz, cc = B[0], B[1], B[2], B[3]
            ux, uy, uz, cu = B[4], B[5], B[6], B[7]
            vx, vy, vz, cv, gid = B[8], B[9], B[10], B[11], B[12]
            A = orow.x * fnx + orow.y * fny + orow.z * fnz
            Bd = drow.x * fnx + drow.y * fny + drow.z * fnz
            Bd = jnp.where(jnp.abs(Bd) < eps, eps, Bd)
            t = (cc - A) / Bd
            du = drow.x * ux + drow.y * uy + drow.z * uz
            ou = orow.x * ux + orow.y * uy + orow.z * uz
            u = ou + t * du - cu
            dv = drow.x * vx + drow.y * vy + drow.z * vz
            ov = orow.x * vx + orow.y * vy + orow.z * vz
            v = ov + t * dv - cv
            ok = (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0) & (t > HIT_EPS) & (t < pt)
            pt = jnp.where(ok, t, pt)
            px_ = jnp.where(ok, fnx, px_)
            py_ = jnp.where(ok, fny, py_)
            pz_ = jnp.where(ok, fnz, pz_)
            pg = jnp.where(ok, gid, pg)
            return (pt, px_, py_, pz_, pg) + tuple(
                pltpu.roll(b, 1, 1) for b in B
            )

        out = lax.fori_loop(0, CS // 8, step, (pt,) + pn + blks)
        pt, px_, py_, pz_, pg = out[:5]
        # reduce over the 8 shift-sublanes: min-t + first-match one-hot
        mt = pt
        for sh in (4, 2, 1):
            mt = jnp.minimum(mt, pltpu.roll(mt, sh, 0))
        is_min = (pt == mt) & (pg >= 0.0)
        first = jnp.cumsum(is_min.astype(jnp.int32), axis=0) == 1
        oh = (is_min & first).astype(jnp.float32)

        def pick(a):
            s = oh * a
            for sh in (4, 2, 1):
                s = s + pltpu.roll(s, sh, 0)
            return s

        win = mt < bt[r : r + 1]  # (1,128) broadcast against row r
        row = rowi == r
        upd = row & win
        bt = jnp.where(upd, mt + zeros, bt)
        bx = jnp.where(upd, pick(px_), bx)
        by = jnp.where(upd, pick(py_), by)
        bz = jnp.where(upd, pick(pz_), bz)
        bg = jnp.where(upd, pick(pg), bg)
        return bt, bx, by, bz, bg

    def visit_cluster(c, best):
        bmin, bmax = meta.mesh_clusters[c]
        t1 = (bmin[0] - o.x) * ix
        t2 = (bmax[0] - o.x) * ix
        u1 = (bmin[1] - o.y) * iy
        u2 = (bmax[1] - o.y) * iy
        v1 = (bmin[2] - o.z) * iz
        v2 = (bmax[2] - o.z) * iz
        tin = jnp.maximum(jnp.maximum(jnp.minimum(t1, t2), jnp.minimum(u1, u2)),
                          jnp.minimum(v1, v2))
        tout = jnp.minimum(jnp.minimum(jnp.maximum(t1, t2), jnp.maximum(u1, u2)),
                           jnp.maximum(v1, v2))
        m = (tout >= jnp.maximum(tin, 0.0)) & (tin < best[0])

        def outer(b):
            for r in range(8):
                b = lax.cond(
                    jnp.any(m[r : r + 1]),
                    lambda bb, rr=r: visit_row(rr, c, bb),
                    lambda bb: bb,
                    b,
                )
            return b

        return lax.cond(jnp.any(m), outer, lambda b: b, best)

    for c in range(len(meta.mesh_clusters)):
        best = visit_cluster(c, best)
    bt, bx, by, bz, bg = best
    return bg >= 0.0, bt, Vec3(bx, by, bz), bg


def shift_pallas_hit(meta, fs, o, d, t_cap):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = o.x.shape[0]
    SUB, L = 8, 128
    tile = SUB * L
    n_pad = ((n + tile - 1) // tile) * tile
    rows = n_pad // L

    def to2d(a, fill):
        out = jnp.full((n_pad,), fill, jnp.float32)
        return out.at[:n].set(a).reshape(rows, L)

    ins = (
        to2d(o.x, 1e7), to2d(o.y, 1e7), to2d(o.z, 1e7),
        to2d(d.x, 1.0), to2d(d.y, 0.0), to2d(d.z, 0.0),
        to2d(t_cap, 0.0),
    )

    def kernel(fs_ref, ox, oy, oz, dx, dy, dz, tc, t_out, fx, fy, fz, g_out):
        ob = Vec3(ox[:, :], oy[:, :], oz[:, :])
        db = Vec3(dx[:, :], dy[:, :], dz[:, :])
        win, t, fn, gid = shift_cluster_hit(meta, fs_ref, ob, db, tc[:, :])
        t_out[:, :] = jnp.where(win, t, jnp.inf)
        fx[:, :] = fn.x
        fy[:, :] = fn.y
        fz[:, :] = fn.z
        g_out[:, :] = gid

    spec = pl.BlockSpec((SUB, L), lambda i: (i, 0), memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        kernel,
        grid=(n_pad // tile,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] + [spec] * 7,
        out_specs=[spec] * 5,
        out_shape=[jax.ShapeDtypeStruct((rows, L), jnp.float32)] * 5,
        interpret=jax.default_backend() == "cpu",
    )(fs, *ins)
    mt, fx, fy, fz, gf = [a.reshape(-1)[:n] for a in outs]
    return mt, Vec3(fx, fy, fz), gf


def camera_rays(scene, res):
    cam = scene.state.camera
    W = H = res
    xs, ys = np.meshgrid(np.arange(W, dtype=np.float64),
                         np.arange(H, dtype=np.float64))
    px = np.asarray(cam.pixel_length, np.float64)
    d = (np.asarray(cam.view, np.float64)[None, None]
         - np.asarray(cam.right, np.float64)[None, None]
         * (px[0] * (xs - W * 0.5))[..., None]
         - np.asarray(cam.up, np.float64)[None, None]
         * (px[1] * (ys - H * 0.5))[..., None])
    d = (d / np.linalg.norm(d, axis=-1, keepdims=True)).reshape(-1, 3)
    o = np.broadcast_to(np.asarray(cam.position, np.float64), d.shape)
    return o.astype(np.float32), d.astype(np.float32)


def timeit(tag, fn, *args, reps=3):
    out = fn(*args)
    np.asarray(out[0][:8])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
        np.asarray(out[0][:8])
    dt = (time.perf_counter() - t0) / reps
    print(f"{tag}: {dt*1e3:8.2f} ms/call", flush=True)
    return out, dt


def main():
    scene_path = os.environ.get("SHIP_SCENE", "scenes/shipOnly.txt")
    scene = load_scene(scene_path)
    scene.set_resolution(RES, RES)
    dev, meta = build_device_scene(scene, 128)
    fp = np.asarray(dev.face_plane)
    fs = jnp.asarray(build_shifted(fp[:13], meta.cluster_size))
    print(f"clusters={len(meta.mesh_clusters)} fs={fs.shape}", flush=True)

    o_np, d_np = camera_rays(scene, RES)
    if jax.default_backend() == "cpu":  # interpret mode: one ship-row block
        mid = int(len(o_np) * 0.70)  # ship sits in the lower image half
        o_np, d_np = o_np[mid : mid + 1024], d_np[mid : mid + 1024]
    o = Vec3(*(jnp.asarray(o_np[:, i]) for i in range(3)))
    d = Vec3(*(jnp.asarray(d_np[:, i]) for i in range(3)))
    n = o.x.shape[0]
    cap_inf = jnp.full((n,), 1e9, jnp.float32)
    cap0 = jnp.zeros((n,), jnp.float32)

    A = jax.jit(lambda oo, dd, tc: mesh_pallas_hit(meta, dev.face_plane, oo, dd, tc))
    B = jax.jit(lambda oo, dd, tc: shift_pallas_hit(meta, fs, oo, dd, tc))

    (ta, _, _, _), dt_a = timeit("A  current  ", A, o, d, cap_inf)
    _, dt_a0 = timeit("A0 no-visits", A, o, d, cap0)
    (tb, _, _), dt_b = timeit("B  shifted  ", B, o, d, cap_inf)
    _, dt_b0 = timeit("B0 no-visits", B, o, d, cap0)

    ta_np, tb_np = np.asarray(ta), np.asarray(tb)
    close = np.isclose(ta_np, tb_np, rtol=2e-3, atol=2e-3) | (
        np.isinf(ta_np) & np.isinf(tb_np)
    )
    print(f"parity: {close.mean()*100:.2f}% lanes agree "
          f"(hits A {np.isfinite(ta_np).mean()*100:.1f}% "
          f"B {np.isfinite(tb_np).mean()*100:.1f}%)", flush=True)
    print(f"speedup B vs A: {dt_a/dt_b:.2f}x "
          f"(visit work A {1e3*(dt_a-dt_a0):.1f} ms vs B {1e3*(dt_b-dt_b0):.1f} ms)",
          flush=True)


if __name__ == "__main__":
    main()
