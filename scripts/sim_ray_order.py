"""Would sorting rays by predicted first cluster shrink rows-tier visits?

The rows tier's work amplification is a ray-ORDER problem: a 128-ray row's
visit list is the UNION of its rays' cluster footprints (per-ray ~0.6
clusters, per-row 4-6 after the dynamic recheck — sim_dynamic_prune.py).
VERDICT r3 #1 proposes bounce-wise binning/sorting of rays by predicted
cluster so rows become cluster-coherent.

This sims, on shipOnly (bounce 0 and a diffuse bounce), the per-row visit
counts of the production kernel model (near-to-far ordered walk + dynamic
t-cap recheck) under three lane orders:

  pixel   — today's order
  sorted  — stable counting sort by per-ray key = argmin-tin open cluster
            under the initial t_cap (misses keyed last); the key comes free
            from the same slab pre-pass that builds the visit lists
  sorted2 — two-level key: (first cluster, second cluster) — how much more
            a finer key buys

Output: visits/row per order + the implied mesh-streaming speedup bound.
Transport cost (gathering o/d/t_cap into sorted order and scattering hits
back) is measured separately on hardware (probe_ray_order.py).

Run: python scripts/sim_ray_order.py [res]
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

    def slab_all(o_np, d_np):
        """tin/open for ALL rays x clusters, chunked."""
        tins, opens = [], []
        for s in range(0, len(o_np), 16384):
            o_r, d_r = o_np[s:s+16384], d_np[s:s+16384]
            inv = 1.0 / np.where(np.abs(d_r) < 1e-20, 1e-20, d_r)
            t1 = (cmin[None, :, :] - o_r[:, None, :]) * inv[:, None, :]
            t2 = (cmax[None, :, :] - o_r[:, None, :]) * inv[:, None, :]
            tin = np.minimum(t1, t2).max(-1)
            tout = np.maximum(t1, t2).min(-1)
            tins.append(tin)
            opens.append(tout >= np.maximum(tin, 0.0))
        return np.concatenate(tins), np.concatenate(opens)

    def visits_dynamic(o_np, d_np, tcap, tin, open_):
        """Production kernel model: per-row near-to-far walk + recheck."""
        nb = len(o_np) // ROW
        dyn = 0
        for b in range(nb):
            sl = slice(b * ROW, (b + 1) * ROW)
            o_r, d_r, cap = o_np[sl], d_np[sl], tcap[sl].copy()
            ti, op = tin[sl], open_[sl]
            m0 = op & (ti < cap[:, None])
            best = cap
            order = np.argsort(np.where(m0, ti, np.inf).min(0))
            for c in order:
                if not m0[:, c].any():
                    break
                live = m0[:, c] & (ti[:, c] < best)
                if not live.any():
                    continue
                dyn += 1
                best = np.minimum(best, face_test(o_r, d_r, c))
            # tail rows (misses) still count as 0 visits
        return dyn / nb

    def run(tag, o_np, d_np, tcap):
        tin, open_ = slab_all(o_np, d_np)
        m0 = open_ & (tin < tcap[:, None])
        # per-ray first-cluster key (argmin tin among candidates)
        key = np.where(m0.any(1),
                       np.where(m0, tin, np.inf).argmin(1), n_clus)
        key2 = np.where(m0, tin, np.inf)
        key2[np.arange(N), np.clip(key, 0, n_clus - 1)] = np.inf
        second = np.where((m0.sum(1) > 1),
                          key2.argmin(1), n_clus)
        base = visits_dynamic(o_np, d_np, tcap, tin, open_)
        order1 = np.argsort(key, kind="stable")
        s1 = visits_dynamic(o_np[order1], d_np[order1], tcap[order1],
                            tin[order1], open_[order1])
        order2 = np.lexsort((second, key))
        s2 = visits_dynamic(o_np[order2], d_np[order2], tcap[order2],
                            tin[order2], open_[order2])
        frac_needy = float(m0.any(1).mean())
        print(f"{tag}: visits/row pixel {base:6.2f}  sorted {s1:6.2f}  "
              f"sorted2 {s2:6.2f}   (needy rays {frac_needy*100:.1f}%, "
              f"mesh-stream bound {base/max(s1,1e-9):.2f}x)", flush=True)

    print(f"faces={F} clusters={n_clus} rays={N} rows={N//ROW}", flush=True)
    tp = prim_t(o, d)
    run("bounce0", o, d, tp)

    def mesh_t_full(o_np, d_np, t_cap):
        best = t_cap.copy()
        for c in range(n_clus):
            s, e, cc, d11, d12, d22, inv = packs[c]
            invd = 1.0 / np.where(np.abs(d_np) < 1e-20, 1e-20, d_np)
            t1 = (cmin[c][None] - o_np) * invd
            t2 = (cmax[c][None] - o_np) * invd
            tin = np.minimum(t1, t2).max(1)
            tout = np.maximum(t1, t2).min(1)
            m = (tout >= np.maximum(tin, 0)) & (tin < best)
            if not m.any():
                continue
            best[m] = np.minimum(best[m], face_test(o_np[m], d_np[m], c))
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
    tp1 = prim_t(o1, d1)
    run("bounce1(diffuse)", o1, d1, tp1)


if __name__ == "__main__":
    main()
