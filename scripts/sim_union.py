"""Cost simulation for the BVH mesh tier (pure numpy, CPU).

For the cornellShip stand-in scene, measures — per megakernel tile (4096
consecutive pixels) and per bounce — how many face clusters survive the
per-ray {AABB hit & t_enter < t_best} test for AT LEAST ONE ray in the tile
(the work a tile-cond'd cluster stream pays), and the per-ray mean cluster
count (what a true per-ray traversal would pay). This decides the mesh-tier
mechanism before any Pallas work.

Run: python scripts/sim_union.py [res] [cluster_size]
"""

import sys

import numpy as np

RES = int(sys.argv[1]) if len(sys.argv) > 1 else 800
CSIZE = int(sys.argv[2]) if len(sys.argv) > 2 else 128
TILE = 32 * 128


def morton3(x, y, z, bits=10):
    def spread(v):
        v = v.astype(np.uint64)
        v = (v | (v << np.uint64(32))) & np.uint64(0x1F00000000FFFF)
        v = (v | (v << np.uint64(16))) & np.uint64(0x1F0000FF0000FF)
        v = (v | (v << np.uint64(8))) & np.uint64(0x100F00F00F00F00F)
        v = (v | (v << np.uint64(4))) & np.uint64(0x10C30C30C30C30C3)
        v = (v | (v << np.uint64(2))) & np.uint64(0x1249249249249249)
        return v

    return spread(x) | (spread(y) << np.uint64(1)) | (spread(z) << np.uint64(2))


def main():
    import os

    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
    from mygpuraytracer_tpu.scene import load_scene
    from mygpuraytracer_tpu.scene.device_scene import build_device_scene

    scene = load_scene("scenes/cornellShip.txt")
    scene.set_resolution(RES, RES)
    dev, meta = build_device_scene(scene, 64)

    F = meta.num_faces
    v0 = np.asarray(dev.face_v0[:F], np.float64)
    e1 = np.asarray(dev.face_e1[:F], np.float64)
    e2 = np.asarray(dev.face_e2[:F], np.float64)

    # ---- Morton-order faces, cluster, AABBs --------------------------------
    cent = v0 + (e1 + e2) / 3.0
    lo, hi = cent.min(0), cent.max(0)
    q = ((cent - lo) / np.maximum(hi - lo, 1e-9) * 1023).astype(np.uint64)
    order = np.argsort(morton3(q[:, 0], q[:, 1], q[:, 2]))
    v0, e1, e2 = v0[order], e1[order], e2[order]

    n_clus = (F + CSIZE - 1) // CSIZE
    cmin = np.full((n_clus, 3), np.inf)
    cmax = np.full((n_clus, 3), -np.inf)
    for c in range(n_clus):
        s, e = c * CSIZE, min((c + 1) * CSIZE, F)
        pts = np.concatenate(
            [v0[s:e], v0[s:e] + e1[s:e], v0[s:e] + e2[s:e]], 0
        )
        cmin[c], cmax[c] = pts.min(0), pts.max(0)
    vol = np.prod(np.maximum(cmax - cmin, 0), 1)
    print(f"faces={F} clusters={n_clus} (size {CSIZE}); "
          f"cluster AABB vol mean {vol.mean():.4f}", flush=True)

    # ---- camera rays --------------------------------------------------------
    cam = scene.state.camera
    W = H = RES
    xs, ys = np.meshgrid(np.arange(W, dtype=np.float64),
                         np.arange(H, dtype=np.float64))
    px = np.asarray(cam.pixel_length, np.float64)
    view = np.asarray(cam.view, np.float64)
    up = np.asarray(cam.up, np.float64)
    right = np.asarray(cam.right, np.float64)
    eye = np.asarray(cam.position, np.float64)
    d = (view[None, None]
         - right[None, None] * (px[0] * (xs - W * 0.5))[..., None]
         - up[None, None] * (px[1] * (ys - H * 0.5))[..., None])
    d = d / np.linalg.norm(d, axis=-1, keepdims=True)
    o = np.broadcast_to(eye, d.shape).copy()
    o = o.reshape(-1, 3)
    d = d.reshape(-1, 3)
    N = o.shape[0]

    # ---- primitives nearest-t (walls/spheres) via the repo oracle -----------
    import jax.numpy as jnp

    from mygpuraytracer_tpu.ops.trace import intersect_primitives_soa
    from mygpuraytracer_tpu.ops.vec3 import Vec3

    def prim_t(o_np, d_np):
        ts = []
        B = 65536
        for s in range(0, len(o_np), B):
            ov = Vec3(*(jnp.asarray(o_np[s:s+B, i], jnp.float32) for i in range(3)))
            dv = Vec3(*(jnp.asarray(d_np[s:s+B, i], jnp.float32) for i in range(3)))
            out = intersect_primitives_soa(meta, ov, dv)
            ts.append(np.asarray(out[0], np.float64))
        return np.concatenate(ts)

    # ---- cluster-aware mesh nearest-t (doubles as algorithm prototype) -----
    fn = np.cross(e1, e2)

    def mesh_t(o_np, d_np, t_cap):
        t_best = t_cap.copy()
        for c in range(n_clus):
            tin, tout = slab(o_np, d_np, cmin[c], cmax[c])
            m = (tout >= np.maximum(tin, 0)) & (tin < t_best)
            if not m.any():
                continue
            om, dm = o_np[m], d_np[m]
            s, e = c * CSIZE, min((c + 1) * CSIZE, F)
            t = mt_block(om, dm, v0[s:e], e1[s:e], e2[s:e], fn[s:e])
            t_best[m] = np.minimum(t_best[m], t)
        return t_best

    def slab(o_np, d_np, bmin, bmax):
        inv = 1.0 / np.where(np.abs(d_np) < 1e-20, 1e-20, d_np)
        t1 = (bmin[None] - o_np) * inv
        t2 = (bmax[None] - o_np) * inv
        tin = np.minimum(t1, t2).max(1)
        tout = np.maximum(t1, t2).min(1)
        return tin, tout

    def mt_block(o_np, d_np, bv0, be1, be2, bfn):
        # plane-based tri test, [rays, faces] panels (float64 numpy)
        c = np.einsum("fk,fk->f", bfn, bv0)
        A = o_np @ bfn.T
        B = d_np @ bfn.T
        B = np.where(np.abs(B) < 1e-20, 1e-20, B)
        t = (c[None] - A) / B
        x = o_np[:, None, :] + t[..., None] * d_np[:, None, :]
        r = x - bv0[None]
        d11 = np.einsum("fk,fk->f", be1, be1)
        d12 = np.einsum("fk,fk->f", be1, be2)
        d22 = np.einsum("fk,fk->f", be2, be2)
        inv = 1.0 / np.maximum(d11 * d22 - d12 * d12, 1e-30)
        ru = np.einsum("rfk,fk->rf", r, be1)
        rv = np.einsum("rfk,fk->rf", r, be2)
        u = (d22 * ru - d12 * rv) * inv
        v = (d11 * rv - d12 * ru) * inv
        ok = (u >= -1e-9) & (v >= -1e-9) & (u + v <= 1 + 1e-9) & (t > 1e-4)
        t = np.where(ok, t, np.inf)
        return t.min(1)

    rng = np.random.default_rng(0)

    def report(tag, o_np, d_np, t_best, alive):
        n_tiles = (N + TILE - 1) // TILE
        unions, perray, anymesh, pairs = [], [], [], []
        for ti in range(n_tiles):
            s = ti * TILE
            sl = slice(s, min(s + TILE, N))
            a = alive[sl]
            if not a.any():
                unions.append(0)
                pairs.append(0)
                continue
            om, dm, tm = o_np[sl][a], d_np[sl][a], t_best[sl][a]
            hit_any = np.zeros(n_clus, bool)
            cnt = np.zeros(len(om))
            for c in range(n_clus):
                tin, tout = slab(om, dm, cmin[c], cmax[c])
                m = (tout >= np.maximum(tin, 0)) & (tin < tm)
                if m.any():
                    hit_any[c] = True
                cnt += m
            unions.append(int(hit_any.sum()))
            perray.append(cnt.mean())
            anymesh.append((cnt > 0).mean())
            pairs.append(int(cnt.sum()))
        unions = np.asarray(unions)
        pairs = np.asarray(pairs)
        print(f"{tag}: tile-union clusters mean {unions.mean():.1f} "
              f"p90 {np.percentile(unions, 90):.0f} max {unions.max()} "
              f"| per-ray mean {np.mean(perray):.2f} clusters "
              f"| rays needing mesh {np.mean(anymesh)*100:.1f}% "
              f"| (ray,cluster) pairs/tile mean {pairs.mean():.0f} "
              f"p90 {np.percentile(pairs, 90):.0f} max {pairs.max()}", flush=True)

    print("computing primary t ...", flush=True)
    tp = prim_t(o, d)
    tb0 = mesh_t(o, d, tp)
    report("bounce0", o, d, tb0, np.isfinite(tb0) | True)

    # diffuse bounce from primary hits (cosine hemisphere around up-ish
    # normal approx: use reflection-free random hemisphere of the true normal
    # would need normals; approximate with random cosine around geometric
    # up-facing normal via gradient — instead reuse direction flip + jitter)
    hit = np.isfinite(tb0)
    xh = o[hit] + d[hit] * (tb0[hit][:, None] - 1e-3)
    # random cosine hemisphere around a random axis-aligned-ish normal proxy:
    # sample true lambertian around the INVERTED incident direction as proxy
    nrm = -d[hit]
    u1, u2 = rng.random(len(xh)), rng.random(len(xh))
    r = np.sqrt(u1)
    th = 2 * np.pi * u2
    a = np.where(np.abs(nrm[:, 0:1]) < 0.577, [[1, 0, 0]], [[0, 1, 0]])
    t1v = np.cross(nrm, a)
    t1v /= np.linalg.norm(t1v, axis=1, keepdims=True)
    t2v = np.cross(nrm, t1v)
    nd = (nrm * np.sqrt(1 - u1)[:, None] + t1v * (r * np.cos(th))[:, None]
          + t2v * (r * np.sin(th))[:, None])
    o1 = np.zeros_like(o)
    d1 = np.zeros_like(d)
    o1[hit] = xh
    d1[hit] = nd
    print("computing bounce1 t ...", flush=True)
    tp1 = np.full(N, np.inf)
    tp1[hit] = prim_t(o1[hit], d1[hit])
    tb1 = tp1.copy()
    tb1[hit] = mesh_t(o1[hit], d1[hit], tp1[hit])
    report("bounce1(diffuse)", o1, d1, tb1, hit)


if __name__ == "__main__":
    main()
