"""How many rows-tier visits would a dynamic t-cap recheck save?

The visit lists (ops/trace.py _cluster_visit_lists) are built ONCE per
query with the initial t_cap (primitive hits; infinity on mesh-only
scenes). As the kernel streams visits, per-ray best-t only shrinks — a
cluster listed up front may be fully occluded by the time its turn comes.
This sims, per 128-ray row on shipOnly at 256^2 (bounce 0 and a diffuse
bounce), three visit counts:

  static   — today's kernel: every cluster in the initial-t_cap union
  dynamic  — visits in near-to-far (min-tin) order, rechecking the mask
             against the row's running best-t before each visit
  oracle   — union computed with the final converged t (lower bound)

If dynamic ~= static, the recheck is not worth kernel complexity; if
dynamic ~= oracle << static, a near-to-far ordered list + in-kernel
recheck is the next big rows-tier lever.

Run: python scripts/sim_dynamic_prune.py [res]
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

    # per-cluster geometry prepacked
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

    def slab_rows(o_r, d_r):
        inv = 1.0 / np.where(np.abs(d_r) < 1e-20, 1e-20, d_r)
        t1 = (cmin[None, :, :] - o_r[:, None, :]) * inv[:, None, :]
        t2 = (cmax[None, :, :] - o_r[:, None, :]) * inv[:, None, :]
        tin = np.minimum(t1, t2).max(-1)
        tout = np.maximum(t1, t2).min(-1)
        return tin, tout  # [ROW, C]

    def run(tag, o_np, d_np, tcap):
        nb = N // ROW
        stat = dyn = orac = 0
        for b in range(nb):
            sl = slice(b * ROW, (b + 1) * ROW)
            o_r, d_r, cap = o_np[sl], d_np[sl], tcap[sl].copy()
            tin, tout = slab_rows(o_r, d_r)
            open_ = tout >= np.maximum(tin, 0.0)
            m0 = open_ & (tin < cap[:, None])
            stat += int(m0.any(0).sum())
            # near-to-far dynamic walk
            best = cap
            order = np.argsort(np.where(m0, tin, np.inf).min(0))
            for c in order:
                if not m0[:, c].any():
                    break  # rest of the order is unvisited too
                live = m0[:, c] & (tin[:, c] < best)
                if not live.any():
                    continue
                dyn += 1
                tc = face_test(o_r, d_r, c)
                best = np.minimum(best, tc)
            orac += int((open_ & (tin < best[:, None])).any(0).sum())
        print(f"{tag}: visits/row static {stat/nb:7.1f}  "
              f"dynamic {dyn/nb:7.1f}  oracle(final-t) {orac/nb:7.1f}",
              flush=True)
        return

    print(f"faces={F} clusters={n_clus} rays={N} rows={N//ROW}", flush=True)
    tp = prim_t(o, d)
    run("bounce0", o, d, tp)

    # one diffuse bounce off the bounce-0 hits
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
