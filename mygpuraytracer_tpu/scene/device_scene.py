"""Static-shape SoA device representation of a scene.

The reference patches raw device pointers into host-built ``Geom`` PODs and
memcpys the array (apps/src/pathtrace.cu:140-172). The TPU design replaces
pointer-chasing with indices into flat SoA buffers:

- geoms          -> parallel arrays [G, ...] (type, material, transforms, AABB,
                    texture-slot ids)
- per-geom faces -> ONE world-space triangle buffer [F, ...] (v0/e1/e2/uv/geom),
                    padded with degenerate triangles to a chunk multiple
- byte textures  -> ONE pre-decoded float32 atlas [P, 3] + a meta table
                    (offset, width, height, channels); slot 0 is the null
                    texture so ``channels == 0`` keeps the reference's
                    "texture absent" test (interactions.h:172,207,229)
- materials      -> parallel arrays [M, ...]

Faces are stored in WORLD space (vertices pre-transformed at load). This is
equivalent to the reference's per-ray local-space test (intersections.h:207-242)
but avoids a per-geom ray transform each bounce, and makes the returned ``t`` a
true world-space distance. (The reference returns the *local*-space distance
for meshes — a bug when geom scale != 1; we deliberately fix it and note the
deviation here.)
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import numpy as np

import jax.numpy as jnp

from .structs import Camera, GeomType, Scene


class CameraParams(NamedTuple):
    """Dynamic camera state for raygen (sceneStructs.h:84-93)."""

    position: jnp.ndarray  # [3]
    view: jnp.ndarray  # [3]
    up: jnp.ndarray  # [3]
    right: jnp.ndarray  # [3]
    pixel_length: jnp.ndarray  # [2]


class DeviceScene(NamedTuple):
    """All dynamic (traced) scene arrays. A pure pytree of jnp arrays."""

    # Geoms [G]
    geom_type: jnp.ndarray  # i32[G]
    geom_material: jnp.ndarray  # i32[G]
    transform: jnp.ndarray  # f32[G,4,4]
    inverse_transform: jnp.ndarray  # f32[G,4,4]
    inv_transpose: jnp.ndarray  # f32[G,4,4]
    aabb_min: jnp.ndarray  # f32[G,3]
    aabb_max: jnp.ndarray  # f32[G,3]
    geom_kd: jnp.ndarray  # i32[G] texture slot (0 = none)
    geom_ks: jnp.ndarray  # i32[G]
    geom_ke: jnp.ndarray  # i32[G]
    geom_bump: jnp.ndarray  # i32[G]

    # World-space triangles [F]
    face_v0: jnp.ndarray  # f32[F,3]
    face_e1: jnp.ndarray  # f32[F,3]  v1 - v0
    face_e2: jnp.ndarray  # f32[F,3]  v2 - v0
    face_uv0: jnp.ndarray  # f32[F,2]
    face_uv1: jnp.ndarray  # f32[F,2]
    face_uv2: jnp.ndarray  # f32[F,2]
    face_geom: jnp.ndarray  # i32[F] owning geom (pad faces point at geom 0)
    # SoA columns of the same triangles for the fast trace path: a [F,3]
    # slice-by-column is a strided load on TPU; flat [F] columns stream clean.
    face_cols: tuple  # 9x f32[F]: v0x v0y v0z e1x e1y e1z e2x e2y e2z
    face_uv_cols: tuple  # 6x f32[F]: uv0u uv0v uv1u uv1v uv2u uv2v
    # Per-face unit TBN tangent/bitangent (world space, from e1/e2 + uv
    # deltas, intersections.h:245-279). Constant per face, so the winner's
    # frame is a one-hot select — no per-ray recomputation.
    face_tb_cols: tuple  # 6x f32[F]: tx ty tz bx by bz
    # Plane-form triangle constants for the megakernel BVH tier,
    # quantity-major so cluster c of quantity q is the clean 128-aligned
    # lane slice [q, c*128:(c+1)*128]. Rows: fn(3), c=fn.v0, U(3), cu=U.v0,
    # V(3), cv=V.v0, geom, pad — where (U, V) is the dual basis of (e1, e2)
    # in the triangle plane: the barycentric test is u = (x-v0).U,
    # v = (x-v0).V with x the ray/plane intersection.
    face_plane: jnp.ndarray  # f32[16, Fp], Fp = F padded to CLUSTER_SIZE
    # Texture extension of face_plane for the textured/bumped cluster tier
    # (same cluster-major lane layout). Rows 0-5: uv0u uv0v d1u d1v d2u d2v
    # (texcoord = uv0 + u*d1 + v*d2 at barycentric (u,v)); rows 8-13: unit
    # tangent/bitangent xyz. [16, 1] placeholder when the scene is untextured
    # so the plain kernel's operands stay unchanged.
    face_plane_ex: jnp.ndarray  # f32[16, Fp] (or [16, 1])
    # Transposed copy for the rows tier's deferred winner gather: row-major
    # rows gather ~2x faster than columns on TPU (measured 32.4 vs 68.6 ms
    # at 640k indices), and gather cost scales with row BYTES (~0.4 ms/byte
    # over an ~8.6 ms floor at 640k indices) — so the pad columns of the
    # streamed 16-row layout are dropped here: cols 0-5 uv coefficients,
    # cols 6-11 unit tangent/bitangent.
    face_ex_t: jnp.ndarray  # f32[Fp, 12] (or [1, 12])
    # f16-packed copy of face_ex_t for RenderOptions.winner_table="f16":
    # word j holds columns (2j, 2j+1) as IEEE half pairs (low half = even
    # column), so the per-bounce winner gather reads 24-byte rows instead
    # of 48 (gather cost scales with row bytes). Lossy: uv coefficients
    # round to ~5e-4 relative — within half a texel at 256^2 maps.
    face_ex_h: jnp.ndarray  # u32[Fp, 6] (or [1, 6])
    # Octahedral-packed copy for RenderOptions.winner_table="oct": words
    # 0-2 are the same f16 uv-coefficient pairs as face_ex_h; word 3 packs
    # the unit tangent/bitangent as two 8-bit octahedral pairs
    # (tx|ty<<8|bx<<16|by<<24). 16-byte gather rows instead of 24 — the
    # gather cost model is ~0.4 ms/byte over an ~8.6 ms floor at 640k
    # indices (docs/MESH_TIERS.md "byte-packed"). Lossy only in the
    # deferred fetch: uv as in f16 mode; the TBN frame quantizes to ~1
    # deg worst-case (8-bit octahedral), which only perturbs bump-mapped
    # shading normals. Degenerate (zero) tangents decode to +z instead of
    # 0 — such faces have degenerate uv and garbage bump either way.
    face_ex_o: jnp.ndarray  # u32[Fp, 4] (or [1, 4])
    # Sublane-shifted face quantities for the row-granular mesh tier
    # (mesh_tier='rows'): row q*8+s, lane c*128+l = quantity q of face
    # (c*128 + (l + 16*s) % 128) — so one (8,128) block of quantity q holds
    # 8 lane-shifted copies of a cluster's faces and a visit covers all
    # (ray, face) pairs for a 128-ray row in 16 roll-steps instead of 128.
    # Quantity order: the 13 plane rows (fn3 c U3 cu V3 cv gid). uv/TBN are
    # NOT streamed: the rows tier defers them to a post-kernel gather from
    # face_plane_ex on the winners (ops/trace.py mesh_rows_hit), keeping
    # the streamed buffer at untextured size.
    # [1, 1] placeholder when the scene has no clusters.
    face_shift: jnp.ndarray  # f32[104, Fp] (or [1, 1])

    # Materials [M]
    mat_color: jnp.ndarray  # f32[M,3]
    mat_spec_color: jnp.ndarray  # f32[M,3]
    mat_spec_ex: jnp.ndarray  # f32[M]
    mat_refl: jnp.ndarray  # f32[M]
    mat_refr: jnp.ndarray  # f32[M]
    mat_ior: jnp.ndarray  # f32[M]
    mat_emittance: jnp.ndarray  # f32[M]

    # Texture atlas
    tex_atlas: jnp.ndarray  # f32[P,4] (rgb + pad; values already /255)
    tex_meta: jnp.ndarray  # i32[T,4] (offset, width, height, channels)
    # Packed per-geom atlas: row = [kd.rgb ks.rgb ke.rgb bump.rgb pad4],
    # built when every textured geom's present maps share one resolution.
    # ONE [N]-row gather then serves all four per-bounce texel fetches
    # (kd/ks/ke in shade + bump in intersect), vs four separate gathers —
    # per-index gather cost dominates the textured tier (docs/MESH_TIERS.md
    # "per-bounce gathers"). The runtime gathers exclusively from the
    # byte-packed tex_atlas16_w; this f32 field stays a [1,16] placeholder
    # (a full f32 copy would waste 64 B/texel of HBM + tunnel upload).
    tex_atlas16: jnp.ndarray  # f32[1,16] placeholder
    # Byte-packed forms of the same atlases: textures are uint8 by contract
    # (scene/structs.py Texture), so a texel row is exactly reconstructible
    # as u8/255 after the gather — and gathering 16-byte uint32 rows instead
    # of 64-byte f32 rows cuts the dominant per-bounce gather cost ~2x
    # (docs/MESH_TIERS.md "per-bounce gathers"). Word j packs channels
    # 4j..4j+3 little-endian (channel 4j in the low byte).
    tex_atlas_w: jnp.ndarray  # u32[P] (r | g<<8 | b<<16)
    tex_atlas16_w: jnp.ndarray  # u32[P16,4]

    camera: CameraParams


@dataclasses.dataclass(frozen=True)
class GeomStatic:
    """Host-static per-geom constants, baked into the compiled trace program.

    On TPU a gather from a tiny table costs ~10ms over a 640k-lane wavefront;
    embedding the scene's handful of transforms/materials as literals makes
    geometry dispatch and material resolution pure register math.
    """

    type: int
    material_id: int
    transform: tuple  # 4x4 nested tuple of floats
    inverse_transform: tuple
    inv_transpose: tuple
    # material fields (scene.cpp Material)
    color: tuple  # (r,g,b)
    spec_color: tuple
    spec_exponent: float
    has_reflective: float
    has_refractive: float
    ior: float
    emittance: float
    # texture slots (0 = none)
    kd: int
    ks: int
    ke: int
    bump: int
    face_start: int
    face_count: int
    # World-space AABB over this geom's faces (OBJ geoms only; zeros
    # otherwise). Literals so the BOUNDING_BOX pre-test (pathtrace.cu:348-353,
    # intersections.h:146-175) is pure register math.
    aabb_min: tuple = (0.0, 0.0, 0.0)
    aabb_max: tuple = (0.0, 0.0, 0.0)


def _morton3(x: np.ndarray, y: np.ndarray, z: np.ndarray) -> np.ndarray:
    """30-bit 3D Morton code (10 bits/axis) — same curve as the native
    loader's face ordering (native/objload.cpp)."""

    def spread(v):
        v = v.astype(np.uint64)
        v = (v | (v << np.uint64(32))) & np.uint64(0x1F00000000FFFF)
        v = (v | (v << np.uint64(16))) & np.uint64(0x1F0000FF0000FF)
        v = (v | (v << np.uint64(8))) & np.uint64(0x100F00F00F00F00F)
        v = (v | (v << np.uint64(4))) & np.uint64(0x10C30C30C30C30C3)
        v = (v | (v << np.uint64(2))) & np.uint64(0x1249249249249249)
        return v

    return spread(x) | (spread(y) << np.uint64(1)) | (spread(z) << np.uint64(2))


# Faces per BVH leaf cluster. 128 = one face per vector lane, so a cluster
# visit is pure (faces-in-sublanes x rays-in-lanes) panel math from static
# VMEM slices; scripts/sim_union.py sizes the per-tile visit counts.
CLUSTER_SIZE = 128


def build_clusters(v0: np.ndarray, e1: np.ndarray, e2: np.ndarray,
                   cluster_size: int = CLUSTER_SIZE):
    """Morton-order world-space triangles and group them into uniform leaf
    clusters with AABBs — the flat leaf level of the wide BVH (the
    north-star's stackless-wide-BVH prescription; the reference has no BVH
    at all, pathtrace.cu:331 'todo BVH').

    Returns (order, cmin [C,3], cmax [C,3]) where ``order`` re-indexes faces
    so cluster c owns faces [c*cluster_size, (c+1)*cluster_size).
    """
    n = len(v0)
    cent = v0 + (e1 + e2) / 3.0
    lo = cent.min(axis=0)
    hi = cent.max(axis=0)
    q = ((cent - lo) / np.maximum(hi - lo, 1e-9) * 1023.0).astype(np.uint64)
    order = np.argsort(_morton3(q[:, 0], q[:, 1], q[:, 2]), kind="stable")
    sv0, se1, se2 = v0[order], e1[order], e2[order]
    n_clus = (n + cluster_size - 1) // cluster_size
    cmin = np.zeros((n_clus, 3), np.float32)
    cmax = np.zeros((n_clus, 3), np.float32)
    for c in range(n_clus):
        s, e = c * cluster_size, min((c + 1) * cluster_size, n)
        pts = np.concatenate([sv0[s:e], sv0[s:e] + se1[s:e], sv0[s:e] + se2[s:e]])
        cmin[c] = pts.min(axis=0)
        cmax[c] = pts.max(axis=0)
    return order, cmin, cmax


@dataclasses.dataclass(frozen=True)
class SceneMeta:
    """Static (non-traced) scene facts; changing any retriggers jit tracing."""

    resolution: tuple[int, int]  # (x, y)
    trace_depth: int
    iterations: int
    image_name: str
    num_geoms: int
    num_faces: int  # real (unpadded) face count
    has_obj: bool
    has_textures: bool
    # Per-geom [start, count) into the face buffer, for geoms of type OBJ.
    face_ranges: tuple[tuple[int, int], ...]
    geoms: tuple[GeomStatic, ...] = ()
    # Small meshes baked as literals for the megakernel: per real face
    # (geom_index, v0(3), e1(3), e2(3), unit_normal(3)) in world space.
    # Populated only when the scene has few enough faces (see MEGA_FACE_CAP).
    mega_faces: tuple = ()
    # Wide-BVH leaf level: ((min3, max3), ...) world AABBs of the
    # CLUSTER_SIZE-face Morton clusters the device face buffer is laid out
    # in. Cluster c owns faces [c*cluster_size, (c+1)*cluster_size).
    mesh_clusters: tuple = ()
    cluster_size: int = CLUSTER_SIZE
    # Static copy of the texture atlas table: per slot (offset, width,
    # height, channels). Texel fetches resolve slot metadata with a short
    # literal select chain instead of a per-lane [N,4] gather — at 800^2 x
    # 8 bounces x 4 maps those meta gathers alone cost hundreds of ms.
    tex_table: tuple = ()
    # Packed-atlas table: per textured geom
    # (kd_id, ks_id, ke_id, bump_id, offset, width, height) — ids are
    # tex_table slots (0 = absent map; presence per map derives from them).
    # Empty when the scene is not packable (see tex_atlas16).
    tex_pack_table: tuple = ()


def _pad_to(n: int, multiple: int) -> int:
    return max(multiple, ((n + multiple - 1) // multiple) * multiple)


def camera_params(cam: Camera) -> CameraParams:
    return CameraParams(
        position=jnp.asarray(cam.position, jnp.float32),
        view=jnp.asarray(cam.view, jnp.float32),
        up=jnp.asarray(cam.up, jnp.float32),
        right=jnp.asarray(cam.right, jnp.float32),
        pixel_length=jnp.asarray(cam.pixel_length, jnp.float32),
    )


def build_device_scene(
    scene: Scene, face_chunk: int = 64
) -> tuple[DeviceScene, SceneMeta]:
    """Flatten a parsed host Scene into (DeviceScene, SceneMeta)."""
    geoms = scene.geoms
    G = len(geoms)
    if G == 0:
        raise ValueError("scene has no geometry")

    geom_type = np.array([int(g.type) for g in geoms], np.int32)
    geom_material = np.array([g.materialid for g in geoms], np.int32)
    transform = np.stack([g.transform for g in geoms]).astype(np.float32)
    inverse_transform = np.stack([g.inverse_transform for g in geoms]).astype(np.float32)
    inv_transpose = np.stack([g.inv_transpose for g in geoms]).astype(np.float32)

    # --- Textures -> atlas -------------------------------------------------
    # 4-channel rows (rgb + pad): 16-byte-aligned row gathers are cheaper
    # than 12-byte ones, and the texel fetch is a per-bounce [N]-row gather.
    atlas_chunks: list[np.ndarray] = [np.zeros((1, 4), np.float32)]  # null texel
    word_chunks: list[np.ndarray] = [np.zeros((1,), np.uint32)]
    tex_meta: list[tuple[int, int, int, int]] = [(0, 0, 0, 0)]  # slot 0 = none
    offset = 1

    def _pack_words(u8):
        """Little-endian byte pack of a (n, k<=4) uint8 array into uint32."""
        w = np.zeros(u8.shape[0], np.uint32)
        for j in range(u8.shape[1]):
            w |= u8[:, j].astype(np.uint32) << np.uint32(8 * j)
        return w

    def _pack_f16_pairs(f32):
        """Pack a (n, 2k) float32 array into (n, k) uint32 of f16 pairs
        (even column in the low half) — half-width gather rows for the
        winner_table="f16" mode."""
        h = np.ascontiguousarray(f32.astype(np.float16)).view(np.uint16)
        lo = h[:, 0::2].astype(np.uint32)
        hi = h[:, 1::2].astype(np.uint32)
        return lo | (hi << np.uint32(16))

    def _oct8(vecs):
        """8-bit octahedral encoding of (n, 3) unit vectors -> two uint32
        columns in [0, 255]. Zero vectors (degenerate-uv tangents) map to
        the +z pole."""
        v = vecs.astype(np.float64)
        s = np.abs(v).sum(axis=1)
        s = np.where(s < 1e-20, 1.0, s)
        px, py = v[:, 0] / s, v[:, 1] / s
        fx = (1.0 - np.abs(py)) * np.where(px >= 0.0, 1.0, -1.0)
        fy = (1.0 - np.abs(px)) * np.where(py >= 0.0, 1.0, -1.0)
        neg = v[:, 2] < 0.0
        x = np.where(neg, fx, px)
        y = np.where(neg, fy, py)
        qx = np.clip(np.rint((x * 0.5 + 0.5) * 255.0), 0, 255)
        return qx.astype(np.uint32), np.clip(
            np.rint((y * 0.5 + 0.5) * 255.0), 0, 255).astype(np.uint32)

    def add_texture(tex) -> int:
        nonlocal offset
        if not tex.present:
            return 0
        img = tex.image
        if img.shape[-1] < 3:
            img = np.repeat(img[..., :1], 3, axis=-1)
        u8 = img[..., :3].reshape(-1, 3)
        if u8.dtype != np.uint8:  # load_texture normalizes at entry
            raise TypeError(
                f"texture image dtype {u8.dtype} reached atlas packing; "
                "textures are uint8 by contract (utils/png.py load_texture)"
            )
        flat3 = u8.astype(np.float32) / 255.0
        flat = np.zeros((flat3.shape[0], 4), np.float32)
        flat[:, :3] = flat3
        atlas_chunks.append(flat)
        word_chunks.append(_pack_words(u8))
        tex_meta.append((offset, tex.width, tex.height, tex.channels))
        offset += flat.shape[0]
        return len(tex_meta) - 1

    geom_kd = np.array([add_texture(g.kd) for g in geoms], np.int32)
    geom_ks = np.array([add_texture(g.ks) for g in geoms], np.int32)
    geom_ke = np.array([add_texture(g.ke) for g in geoms], np.int32)
    geom_bump = np.array([add_texture(g.bump) for g in geoms], np.int32)
    tex_atlas = np.concatenate(atlas_chunks, axis=0)
    tex_atlas_w = np.concatenate(word_chunks, axis=0)
    tex_meta_arr = np.asarray(tex_meta, np.int32)

    # --- Packed per-geom atlas (see DeviceScene.tex_atlas16) ----------------
    pack_word_chunks: list[np.ndarray] = [np.zeros((1, 4), np.uint32)]
    pack_table: list[tuple[int, int, int, int, int, int, int]] = []
    pack_off = 1
    packable = True
    for gi, g in enumerate(geoms):
        maps = [g.kd, g.ks, g.ke, g.bump]
        present = [t for t in maps if t.present]
        if not present:
            continue
        if len({(t.width, t.height) for t in present}) != 1:
            packable = False  # mixed resolutions within one geom: fall back
            break
        w_, h_ = present[0].width, present[0].height
        row_u8 = np.zeros((w_ * h_, 16), np.uint8)
        for mi, t in enumerate(maps):
            if not t.present:
                continue
            img = t.image
            if img.shape[-1] < 3:
                img = np.repeat(img[..., :1], 3, axis=-1)
            u8 = img[..., :3].reshape(-1, 3)
            if u8.dtype != np.uint8:  # load_texture normalizes at entry
                raise TypeError(
                    f"texture image dtype {u8.dtype} reached atlas packing; "
                    "textures are uint8 by contract (utils/png.py load_texture)"
                )
            row_u8[:, 3 * mi:3 * mi + 3] = u8
        pack_word_chunks.append(np.stack(
            [_pack_words(row_u8[:, 4 * j:4 * j + 4]) for j in range(4)], axis=1))
        pack_table.append((int(geom_kd[gi]), int(geom_ks[gi]),
                           int(geom_ke[gi]), int(geom_bump[gi]),
                           pack_off, w_, h_))
        pack_off += row_u8.shape[0]
    if not packable:
        pack_table = []
        pack_word_chunks = [np.zeros((1, 4), np.uint32)]
    # Placeholder only — the runtime gathers from the word atlas exclusively
    # (ops/trace.py fetch_texels_packed); a full f32 mirror would waste
    # 64 B/texel of HBM and ~1 GB/s tunnel upload for a dead buffer.
    tex_atlas16 = np.zeros((1, 16), np.float32)
    tex_atlas16_w = np.concatenate(pack_word_chunks, axis=0)

    # --- Faces -> world-space triangle soup --------------------------------
    v0s, e1s, e2s, uv0s, uv1s, uv2s, fgeom = [], [], [], [], [], [], []
    face_ranges: list[tuple[int, int]] = []
    aabb_min = np.zeros((G, 3), np.float32)
    aabb_max = np.zeros((G, 3), np.float32)
    cursor = 0
    from .structs import FaceArray

    for gi, (g, faces) in enumerate(zip(geoms, scene.all_faces)):
        start = cursor
        if len(faces):
            if not isinstance(faces, FaceArray):
                faces = FaceArray.from_faces(list(faces))
            local = faces.positions  # [f,3,3]
            uvs = faces.uvs  # [f,3,2]
            hom = np.concatenate(
                [local, np.ones((*local.shape[:2], 1), np.float32)], axis=-1
            )  # [f,3,4]
            world = np.einsum("ij,fvj->fvi", g.transform.astype(np.float64), hom)[
                ..., :3
            ].astype(np.float32)
            v0s.append(world[:, 0])
            e1s.append(world[:, 1] - world[:, 0])
            e2s.append(world[:, 2] - world[:, 0])
            uv0s.append(uvs[:, 0])
            uv1s.append(uvs[:, 1])
            uv2s.append(uvs[:, 2])
            fgeom.append(np.full(len(faces), gi, np.int32))
            cursor += len(faces)
            aabb_min[gi] = world.reshape(-1, 3).min(axis=0)
            aabb_max[gi] = world.reshape(-1, 3).max(axis=0)
        face_ranges.append((start, cursor - start))

    num_faces = cursor

    # Morton-reorder the whole face soup and build the wide-BVH leaf level
    # (order only affects tie-breaks; face_geom tracks ownership). The
    # face_ranges stay as logical per-geom counts — the device buffer itself
    # is cluster-major after this.
    mesh_cluster_bounds = ()
    if num_faces:
        all_v0 = np.concatenate(v0s)
        all_e1 = np.concatenate(e1s)
        all_e2 = np.concatenate(e2s)
        order, cmin, cmax = build_clusters(all_v0, all_e1, all_e2, CLUSTER_SIZE)
        v0s = [all_v0[order]]
        e1s = [all_e1[order]]
        e2s = [all_e2[order]]
        uv0s = [np.concatenate(uv0s)[order]]
        uv1s = [np.concatenate(uv1s)[order]]
        uv2s = [np.concatenate(uv2s)[order]]
        fgeom = [np.concatenate(fgeom)[order]]
        mesh_cluster_bounds = tuple(
            (tuple(float(x) for x in mn), tuple(float(x) for x in mx))
            for mn, mx in zip(cmin, cmax)
        )

    # Plane-form constants (f64 precompute for a well-conditioned dual basis)
    Fp = _pad_to(max(num_faces, 1), CLUSTER_SIZE)
    face_plane = np.zeros((16, Fp), np.float32)
    if num_faces:
        fv0 = v0s[0].astype(np.float64)
        fe1 = e1s[0].astype(np.float64)
        fe2 = e2s[0].astype(np.float64)
        fn = np.cross(fe1, fe2)
        d11 = np.einsum("ij,ij->i", fe1, fe1)
        d12 = np.einsum("ij,ij->i", fe1, fe2)
        d22 = np.einsum("ij,ij->i", fe2, fe2)
        inv = 1.0 / np.maximum(d11 * d22 - d12 * d12, 1e-30)
        U = (d22[:, None] * fe1 - d12[:, None] * fe2) * inv[:, None]
        V = (d11[:, None] * fe2 - d12[:, None] * fe1) * inv[:, None]
        face_plane[0:3, :num_faces] = fn.T
        face_plane[3, :num_faces] = np.einsum("ij,ij->i", fn, fv0)
        face_plane[4:7, :num_faces] = U.T
        face_plane[7, :num_faces] = np.einsum("ij,ij->i", U, fv0)
        face_plane[8:11, :num_faces] = V.T
        face_plane[11, :num_faces] = np.einsum("ij,ij->i", V, fv0)
        face_plane[12, :num_faces] = fgeom[0].astype(np.float32)
        # pad faces: fn = 0 -> B = 0 handled by the epsilon guard; make the
        # plane unreachable anyway
        face_plane[3, num_faces:] = 1e30

    # Texture-tier extension: uv interpolation coefficients + the per-face
    # unit TBN frame (interactions.h:188-239 texel fetch at the winner's uv;
    # intersections.h:245-279 bump TBN). Built only for textured scenes.
    has_textures = bool(
        (geom_kd > 0).any() or (geom_ks > 0).any()
        or (geom_ke > 0).any() or (geom_bump > 0).any()
    )
    face_tb = np.zeros((num_faces, 6), np.float32)
    face_plane_ex = np.zeros((16, 1), np.float32)
    if num_faces and has_textures:
        fuv0 = uv0s[0].astype(np.float64)
        duv1 = uv1s[0].astype(np.float64) - fuv0
        duv2 = uv2s[0].astype(np.float64) - fuv0
        den = duv1[:, 0] * duv2[:, 1] - duv2[:, 0] * duv1[:, 1]
        f = 1.0 / np.where(np.abs(den) < 1e-20, 1e-20, den)
        T = f[:, None] * (duv2[:, 1:2] * fe1 - duv1[:, 1:2] * fe2)
        B = f[:, None] * (-duv2[:, 0:1] * fe1 + duv1[:, 0:1] * fe2)

        def unit(a):
            n = np.linalg.norm(a, axis=1, keepdims=True)
            return a / np.where(n < 1e-20, 1.0, n)

        face_tb[:num_faces, 0:3] = unit(T)
        face_tb[:num_faces, 3:6] = unit(B)
        face_plane_ex = np.zeros((16, Fp), np.float32)
        face_plane_ex[0:2, :num_faces] = fuv0.T
        face_plane_ex[2:4, :num_faces] = duv1.T
        face_plane_ex[4:6, :num_faces] = duv2.T
        face_plane_ex[8:14, :num_faces] = face_tb[:num_faces].T

    # Sublane-shifted layout for the row-granular tier (see DeviceScene).
    face_shift = np.zeros((1, 1), np.float32)
    if num_faces > 0 and len(mesh_cluster_bounds) > 0:
        # 13 intersection quantities only: the rows tier DEFERS uv/TBN to a
        # post-kernel gather from face_plane_ex (ops/trace.py mesh_rows_hit),
        # so the streamed buffer stays at untextured size.
        q_rows = [face_plane[q] for q in range(13)]
        SHIFT = CLUSTER_SIZE // 8
        face_shift = np.zeros((len(q_rows) * 8, Fp), np.float32)
        n_clus_p = Fp // CLUSTER_SIZE
        for q, row in enumerate(q_rows):
            blocks = row.reshape(n_clus_p, CLUSTER_SIZE)
            for s in range(8):
                face_shift[q * 8 + s] = np.roll(
                    blocks, -SHIFT * s, axis=1
                ).reshape(-1)

    F = _pad_to(max(num_faces, 1), face_chunk)
    face_v0 = np.zeros((F, 3), np.float32)
    face_e1 = np.zeros((F, 3), np.float32)
    face_e2 = np.zeros((F, 3), np.float32)
    face_uv0 = np.zeros((F, 2), np.float32)
    face_uv1 = np.zeros((F, 2), np.float32)
    face_uv2 = np.zeros((F, 2), np.float32)
    face_geom = np.zeros(F, np.int32)
    face_tb_pad = np.zeros((F, 6), np.float32)
    face_tb_pad[:num_faces] = face_tb
    if num_faces:
        face_v0[:num_faces] = np.concatenate(v0s)
        face_e1[:num_faces] = np.concatenate(e1s)
        face_e2[:num_faces] = np.concatenate(e2s)
        face_uv0[:num_faces] = np.concatenate(uv0s)
        face_uv1[:num_faces] = np.concatenate(uv1s)
        face_uv2[:num_faces] = np.concatenate(uv2s)
        face_geom[:num_faces] = np.concatenate(fgeom)

    # --- Materials ----------------------------------------------------------
    mats = scene.materials
    M = max(len(mats), 1)
    mat_color = np.zeros((M, 3), np.float32)
    mat_spec_color = np.zeros((M, 3), np.float32)
    mat_spec_ex = np.zeros(M, np.float32)
    mat_refl = np.zeros(M, np.float32)
    mat_refr = np.zeros(M, np.float32)
    mat_ior = np.zeros(M, np.float32)
    mat_emittance = np.zeros(M, np.float32)
    for i, m in enumerate(mats):
        mat_color[i] = m.color
        mat_spec_color[i] = m.specular_color
        mat_spec_ex[i] = m.specular_exponent
        mat_refl[i] = m.has_reflective
        mat_refr[i] = m.has_refractive
        mat_ior[i] = m.index_of_refraction
        mat_emittance[i] = m.emittance

    # Deferred winner gather tables (cols 0-5 uv coefficients, 6-11 unit
    # tangent/bitangent; the streamed layout's pad columns are dropped).
    ex12 = np.ascontiguousarray(
        face_plane_ex[list(range(6)) + list(range(8, 14))].T)
    otx, oty = _oct8(ex12[:, 6:9])
    obx, oby = _oct8(ex12[:, 9:12])
    ex_oct = np.concatenate(
        [_pack_f16_pairs(ex12[:, :6]),
         (otx | (oty << np.uint32(8)) | (obx << np.uint32(16))
          | (oby << np.uint32(24)))[:, None]],
        axis=1)

    dev = DeviceScene(
        geom_type=jnp.asarray(geom_type),
        geom_material=jnp.asarray(geom_material),
        transform=jnp.asarray(transform),
        inverse_transform=jnp.asarray(inverse_transform),
        inv_transpose=jnp.asarray(inv_transpose),
        aabb_min=jnp.asarray(aabb_min),
        aabb_max=jnp.asarray(aabb_max),
        geom_kd=jnp.asarray(geom_kd),
        geom_ks=jnp.asarray(geom_ks),
        geom_ke=jnp.asarray(geom_ke),
        geom_bump=jnp.asarray(geom_bump),
        face_v0=jnp.asarray(face_v0),
        face_e1=jnp.asarray(face_e1),
        face_e2=jnp.asarray(face_e2),
        face_uv0=jnp.asarray(face_uv0),
        face_uv1=jnp.asarray(face_uv1),
        face_uv2=jnp.asarray(face_uv2),
        face_geom=jnp.asarray(face_geom),
        face_cols=tuple(
            jnp.asarray(np.ascontiguousarray(col))
            for arr in (face_v0, face_e1, face_e2)
            for col in (arr[:, 0], arr[:, 1], arr[:, 2])
        ),
        face_uv_cols=tuple(
            jnp.asarray(np.ascontiguousarray(col))
            for arr in (face_uv0, face_uv1, face_uv2)
            for col in (arr[:, 0], arr[:, 1])
        ),
        face_tb_cols=tuple(
            jnp.asarray(np.ascontiguousarray(face_tb_pad[:, i])) for i in range(6)
        ),
        face_plane=jnp.asarray(face_plane),
        face_plane_ex=jnp.asarray(face_plane_ex),
        face_ex_t=jnp.asarray(ex12),
        face_ex_h=jnp.asarray(_pack_f16_pairs(ex12)),
        face_ex_o=jnp.asarray(ex_oct),
        face_shift=jnp.asarray(face_shift),
        mat_color=jnp.asarray(mat_color),
        mat_spec_color=jnp.asarray(mat_spec_color),
        mat_spec_ex=jnp.asarray(mat_spec_ex),
        mat_refl=jnp.asarray(mat_refl),
        mat_refr=jnp.asarray(mat_refr),
        mat_ior=jnp.asarray(mat_ior),
        mat_emittance=jnp.asarray(mat_emittance),
        tex_atlas=jnp.asarray(tex_atlas),
        tex_meta=jnp.asarray(tex_meta_arr),
        tex_atlas16=jnp.asarray(tex_atlas16),
        tex_atlas_w=jnp.asarray(tex_atlas_w),
        tex_atlas16_w=jnp.asarray(tex_atlas16_w),
        camera=camera_params(scene.state.camera),
    )
    def _t4(m) -> tuple:
        return tuple(tuple(float(v) for v in row) for row in np.asarray(m))

    def _t3(v) -> tuple:
        return tuple(float(x) for x in np.asarray(v))

    geom_statics = []
    for gi, g in enumerate(geoms):
        m = mats[g.materialid] if 0 <= g.materialid < len(mats) else mats[0]
        geom_statics.append(
            GeomStatic(
                type=int(g.type),
                material_id=int(g.materialid),
                transform=_t4(g.transform),
                inverse_transform=_t4(g.inverse_transform),
                inv_transpose=_t4(g.inv_transpose),
                color=_t3(m.color),
                spec_color=_t3(m.specular_color),
                spec_exponent=float(m.specular_exponent),
                has_reflective=float(m.has_reflective),
                has_refractive=float(m.has_refractive),
                ior=float(m.index_of_refraction),
                emittance=float(m.emittance),
                kd=int(geom_kd[gi]),
                ks=int(geom_ks[gi]),
                ke=int(geom_ke[gi]),
                bump=int(geom_bump[gi]),
                face_start=int(face_ranges[gi][0]),
                face_count=int(face_ranges[gi][1]),
                aabb_min=_t3(aabb_min[gi]),
                aabb_max=_t3(aabb_max[gi]),
            )
        )

    MEGA_FACE_CAP = 256
    mega_faces = ()
    if 0 < num_faces <= MEGA_FACE_CAP:
        all_v0 = np.concatenate(v0s) if v0s else np.zeros((0, 3), np.float32)
        all_e1 = np.concatenate(e1s) if e1s else np.zeros((0, 3), np.float32)
        all_e2 = np.concatenate(e2s) if e2s else np.zeros((0, 3), np.float32)
        all_g = np.concatenate(fgeom) if fgeom else np.zeros(0, np.int32)
        mf = []
        for i in range(num_faces):
            nrm = np.cross(all_e1[i].astype(np.float64), all_e2[i].astype(np.float64))
            nl = np.linalg.norm(nrm)
            nrm = nrm / nl if nl > 0 else nrm
            mf.append(
                (
                    int(all_g[i]),
                    _t3(all_v0[i]),
                    _t3(all_e1[i]),
                    _t3(all_e2[i]),
                    _t3(nrm),
                )
            )
        mega_faces = tuple(mf)

    meta = SceneMeta(
        resolution=tuple(scene.state.camera.resolution),
        trace_depth=scene.state.trace_depth,
        iterations=scene.state.iterations,
        image_name=scene.state.image_name,
        num_geoms=G,
        num_faces=num_faces,
        has_obj=any(g.type == GeomType.OBJ for g in geoms),
        has_textures=has_textures,
        face_ranges=tuple(face_ranges),
        geoms=tuple(geom_statics),
        mega_faces=mega_faces,
        mesh_clusters=mesh_cluster_bounds,
        cluster_size=CLUSTER_SIZE,
        tex_table=tuple(tex_meta),
        tex_pack_table=tuple(pack_table),
    )
    return dev, meta
