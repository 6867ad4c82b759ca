"""Cluster-union vs ray-block granularity (milestone-B sizing, round 3).

The cluster tier's cost = (clusters visited per ray block) x (steps per
visit). Today a visit costs 128 roll-steps for a (8,128)=1024-ray block.
A sublane-shifted face layout would let 128-ray blocks pay 16 steps per
visit at the same per-pair math — worth it iff 128-ray unions are much
smaller than 1024-ray unions. This measures exactly that, for bounce-0 and
a diffuse bounce, in scanline order, on shipOnly at 256^2.

Run: python scripts/sim_union_blocks.py [res]
"""

import os
import sys

import numpy as np

os.environ["JAX_PLATFORMS"] = "cpu"
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

RES = int(sys.argv[1]) if len(sys.argv) > 1 else 256


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

    def slab(o_np, d_np, bmin, bmax):
        inv = 1.0 / np.where(np.abs(d_np) < 1e-20, 1e-20, d_np)
        t1 = (bmin[None] - o_np) * inv
        t2 = (bmax[None] - o_np) * inv
        return np.minimum(t1, t2).max(1), np.maximum(t1, t2).min(1)

    def mesh_t(o_np, d_np, t_cap):
        t_best = t_cap.copy()
        for c in range(n_clus):
            tin, tout = slab(o_np, d_np, cmin[c], cmax[c])
            m = (tout >= np.maximum(tin, 0)) & (tin < t_best)
            if not m.any():
                continue
            om, dm = o_np[m], d_np[m]
            s, e = c * CS, min((c + 1) * CS, F)
            cc = np.einsum("fk,fk->f", fn[s:e], v0[s:e])
            A = om @ fn[s:e].T
            B = dm @ fn[s:e].T
            B = np.where(np.abs(B) < 1e-20, 1e-20, B)
            t = (cc[None] - A) / B
            x = om[:, None, :] + t[..., None] * dm[:, None, :]
            r = x - v0[None, s:e]
            d11 = np.einsum("fk,fk->f", e1[s:e], e1[s:e])
            d12 = np.einsum("fk,fk->f", e1[s:e], e2[s:e])
            d22 = np.einsum("fk,fk->f", e2[s:e], e2[s:e])
            inv = 1.0 / np.maximum(d11 * d22 - d12 * d12, 1e-30)
            ru = np.einsum("rfk,fk->rf", r, e1[s:e])
            rv = np.einsum("rfk,fk->rf", r, e2[s:e])
            u = (d22 * ru - d12 * rv) * inv
            v = (d11 * rv - d12 * ru) * inv
            ok = (u >= -1e-9) & (v >= -1e-9) & (u + v <= 1 + 1e-9) & (t > 1e-4)
            t_best[m] = np.minimum(t_best[m], np.where(ok, t, np.inf).min(1))
        return t_best

    def report(tag, o_np, d_np, t_best):
        masks = np.zeros((N, n_clus), bool)
        for c in range(n_clus):
            tin, tout = slab(o_np, d_np, cmin[c], cmax[c])
            masks[:, c] = (tout >= np.maximum(tin, 0)) & (tin < t_best)
        print(f"{tag}: per-ray mean {masks.sum(1).mean():.2f} clusters")
        for bs in (4096, 1024, 128):
            nb = N // bs
            u = masks[: nb * bs].reshape(nb, bs, n_clus).any(1).sum(1)
            # visit cost model: steps/visit = CS for 1024+ blocks (roll
            # kernel), CS/8 for 128-ray blocks (sublane-shifted kernel)
            steps = CS if bs >= 1024 else CS // 8
            per_ray_cost = u.mean() * steps / bs * 1024
            print(f"  block {bs:5d}: union mean {u.mean():7.1f} "
                  f"p90 {np.percentile(u, 90):5.0f} "
                  f"-> roll-steps per 1024 rays {per_ray_cost:8.0f}",
                  flush=True)

    print(f"faces={F} clusters={n_clus} rays={N}", flush=True)
    tp = prim_t(o, d)
    tb0 = mesh_t(o, d, tp)
    report("bounce0", o, d, tb0)

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
    tb1 = mesh_t(o1, d1, tp1)
    # dead lanes (miss on bounce0) keep their primary ray: harmless filler
    report("bounce1(diffuse)", o1, d1, tb1)


if __name__ == "__main__":
    main()
