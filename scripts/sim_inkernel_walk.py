"""Visit counts for candidate IN-KERNEL near-to-far cluster walks.

The bounce megakernel cannot use the rows tier's XLA visit-list prepass
(bounce-N rays exist only inside the kernel), so the walk order must be
computed in-kernel. Candidates, all with the running-best recheck:

  row-tin     — exact per-row near-to-far (min masked tin per row): the
                rows-tier oracle; costs a per-ray slab pass + a per-row
                (row x cluster) tin matrix build in-kernel (~8k vreg ops)
  row-dist    — conservative per-row ordering by DISTANCE from the row's
                origin AABB to the cluster AABB (direction-free): ~1.5k
                vreg ops via cluster-lane vectorization; may visit
                clusters behind the rays
  sub-tin     — exact near-to-far at (8,128)=1024-ray subblock granularity
                (visit = 128 roll-steps instead of 16, but fewer argmins)

Reports visits/row-equivalent cost in 16-step visit units so the
candidates are comparable: row visits cost 1 unit, subblock visits 8.

Run: python scripts/sim_inkernel_walk.py [res]
"""

import os
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

os.environ["JAX_PLATFORMS"] = "cpu"
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

RES = int(sys.argv[1]) if len(sys.argv) > 1 else 256
ROW = 128
SUB = 1024


def main():
    import jax.numpy as jnp

    from mygpuraytracer_tpu.ops.trace import intersect_primitives_soa
    from mygpuraytracer_tpu.ops.vec3 import Vec3
    from mygpuraytracer_tpu.scene import load_scene
    from mygpuraytracer_tpu.scene.device_scene import build_device_scene

    scene = load_scene("scenes/shipOnly.txt")
    scene.set_resolution(RES, RES)
    dev, meta = build_device_scene(scene, 128)
    F = meta.num_faces
    v0 = np.asarray(dev.face_v0[:F], np.float64)
    e1 = np.asarray(dev.face_e1[:F], np.float64)
    e2 = np.asarray(dev.face_e2[:F], np.float64)
    fn = np.cross(e1, e2)
    cmin = np.array([c[0] for c in meta.mesh_clusters])
    cmax = np.array([c[1] for c in meta.mesh_clusters])
    n_clus = len(cmin)
    CS = meta.cluster_size

    cam = scene.state.camera
    W = H = RES
    xs, ys = np.meshgrid(np.arange(W, dtype=np.float64),
                         np.arange(H, dtype=np.float64))
    px = np.asarray(cam.pixel_length, np.float64)
    d = (np.asarray(cam.view, np.float64)[None, None]
         - np.asarray(cam.right, np.float64)[None, None]
         * (px[0] * (xs - W * 0.5))[..., None]
         - np.asarray(cam.up, np.float64)[None, None]
         * (px[1] * (ys - H * 0.5))[..., None])
    d = (d / np.linalg.norm(d, axis=-1, keepdims=True)).reshape(-1, 3)
    o = np.broadcast_to(np.asarray(cam.position, np.float64), d.shape).copy()
    N = len(o)

    def prim_t(o_np, d_np):
        ts = []
        for s in range(0, len(o_np), 65536):
            ov = Vec3(*(jnp.asarray(o_np[s:s+65536, i], jnp.float32) for i in range(3)))
            dv = Vec3(*(jnp.asarray(d_np[s:s+65536, i], jnp.float32) for i in range(3)))
            ts.append(np.asarray(intersect_primitives_soa(meta, ov, dv)[0], np.float64))
        return np.concatenate(ts)

    packs = []
    for c in range(n_clus):
        s, e = c * CS, min((c + 1) * CS, F)
        d11 = np.einsum("fk,fk->f", e1[s:e], e1[s:e])
        d12 = np.einsum("fk,fk->f", e1[s:e], e2[s:e])
        d22 = np.einsum("fk,fk->f", e2[s:e], e2[s:e])
        inv = 1.0 / np.maximum(d11 * d22 - d12 * d12, 1e-30)
        cc = np.einsum("fk,fk->f", fn[s:e], v0[s:e])
        packs.append((s, e, cc, d11, d12, d22, inv))

    def face_test(o_r, d_r, c):
        s, e, cc, d11, d12, d22, inv = packs[c]
        A = o_r @ fn[s:e].T
        B = d_r @ fn[s:e].T
        B = np.where(np.abs(B) < 1e-20, 1e-20, B)
        t = (cc[None] - A) / B
        x = o_r[:, None, :] + t[..., None] * d_r[:, None, :]
        r = x - v0[None, s:e]
        ru = np.einsum("rfk,fk->rf", r, e1[s:e])
        rv = np.einsum("rfk,fk->rf", r, e2[s:e])
        u = (d22 * ru - d12 * rv) * inv
        v = (d11 * rv - d12 * ru) * inv
        ok = (u >= -1e-9) & (v >= -1e-9) & (u + v <= 1 + 1e-9) & (t > 1e-4)
        return np.where(ok, t, np.inf).min(1)

    def slab(o_g, d_g):
        inv = 1.0 / np.where(np.abs(d_g) < 1e-20, 1e-20, d_g)
        t1 = (cmin[None, :, :] - o_g[:, None, :]) * inv[:, None, :]
        t2 = (cmax[None, :, :] - o_g[:, None, :]) * inv[:, None, :]
        tin = np.minimum(t1, t2).max(-1)
        tout = np.maximum(t1, t2).min(-1)
        return tin, (tout >= np.maximum(tin, 0.0))

    def walk(o_g, d_g, cap, order_key):
        """Near-to-far walk over one ray group by ascending order_key;
        live-check: any(open & tin < best). Returns visit count."""
        tin, open_ = slab(o_g, d_g)
        best = cap.copy()
        visited = np.zeros(n_clus, bool)
        visits = 0
        key = order_key.copy()
        while True:
            live_c = (~visited) & (open_ & (tin < best[:, None])).any(0)
            if not live_c.any():
                return visits
            k = np.where(live_c, key, np.inf)
            c = int(k.argmin())
            visited[c] = True
            visits += 1
            best = np.minimum(best, face_test(o_g, d_g, c))

    def run(tag, o_np, d_np, tcap):
        stats = {"row-tin": 0.0, "row-dist": 0.0, "sub-tin": 0.0}
        nb = N // SUB
        for b in range(nb):
            for r in range(SUB // ROW):
                sl = slice(b * SUB + r * ROW, b * SUB + (r + 1) * ROW)
                o_r, d_r, cap = o_np[sl], d_np[sl], tcap[sl]
                tin, open_ = slab(o_r, d_r)
                m = open_ & (tin < cap[:, None])
                key_tin = np.where(m, tin, np.inf).min(0)
                stats["row-tin"] += walk(o_r, d_r, cap, key_tin)
                lo, hi = o_r.min(0), o_r.max(0)
                dist = np.linalg.norm(
                    np.maximum(0, np.maximum(cmin - hi[None], lo[None] - cmax)),
                    axis=1)
                stats["row-dist"] += walk(o_r, d_r, cap, dist)
            sl = slice(b * SUB, (b + 1) * SUB)
            o_s, d_s, cap = o_np[sl], d_np[sl], tcap[sl]
            tin, open_ = slab(o_s, d_s)
            m = open_ & (tin < cap[:, None])
            key_tin = np.where(m, tin, np.inf).min(0)
            # x8: a 1024-ray visit streams 128 roll-steps vs the row's 16
            stats["sub-tin"] += 8 * walk(o_s, d_s, cap, key_tin)
        rows = N // ROW
        print(f"{tag}: 16-step-visit units/row  "
              + "  ".join(f"{k} {v/rows:6.2f}" for k, v in stats.items()),
              flush=True)

    print(f"faces={F} clusters={n_clus} rays={N}", flush=True)
    tp = prim_t(o, d)
    run("bounce0", o, d, tp)

    def mesh_t_full(o_np, d_np, t_cap):
        best = t_cap.copy()
        for c in range(n_clus):
            invd = 1.0 / np.where(np.abs(d_np) < 1e-20, 1e-20, d_np)
            t1 = (cmin[c][None] - o_np) * invd
            t2 = (cmax[c][None] - o_np) * invd
            tin = np.minimum(t1, t2).max(1)
            tout = np.maximum(t1, t2).min(1)
            mm = (tout >= np.maximum(tin, 0)) & (tin < best)
            if not mm.any():
                continue
            best[mm] = np.minimum(best[mm], face_test(o_np[mm], d_np[mm], c))
        return best

    tb0 = mesh_t_full(o, d, tp)
    rng = np.random.default_rng(0)
    hit = np.isfinite(tb0)
    xh = o[hit] + d[hit] * (tb0[hit][:, None] - 1e-3)
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
    o1, d1 = o.copy(), d.copy()
    o1[hit], d1[hit] = xh, nd
    # dead lanes (misses) don't query the mesh in the kernel: their
    # remaining==0 keeps the row's t_cap at 0 -> model with cap=0
    cap1 = np.where(hit, prim_t(o1, d1), 0.0)
    run("bounce1(diffuse)", o1, d1, cap1)


if __name__ == "__main__":
    main()
