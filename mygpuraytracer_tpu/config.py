"""Runtime render configuration.

Collapses the reference's compile-time ``#define`` feature flags
(apps/src/pathtrace.cu:36-42, apps/src/interactions.h:5) into one dataclass.
Each option is static with respect to ``jax.jit`` — flipping one retraces the
render function, mirroring the reference's recompile-on-flag-change model
without the rebuild.
"""

from __future__ import annotations

import dataclasses


@dataclasses.dataclass(frozen=True)
class RenderOptions:
    """Feature flags for one render pipeline instance.

    Defaults match the reference build (pathtrace.cu:36-42):
    DEPTH_OF_FIELD 0, CACHE_FIRST_BOUNCE 1, SORT_BY_MATERIAL 1,
    ANTIALIASING 1, BOUNDING_BOX 0, AI_DENOISE 1, JITTERED_SAMPLING 0.
    """

    depth_of_field: bool = False
    cache_first_bounce: bool = True
    # Material-sorted wavefront execution (thrust::sort_by_key,
    # pathtrace.cu:590,612): each bounce jointly sorts path state +
    # intersections by descending material id before shading. The rendered
    # image is bitwise identical either way (RNG streams follow the pixel
    # id); on TPU sorting is pure overhead — there is no warp divergence to
    # fix — so this exists for reference parity and for measuring that fact.
    # The reference compiles it in by default (SORT_BY_MATERIAL 1); here the
    # default is OFF because the per-bounce argsort+gathers measured ~2/3 of
    # the whole wavefront iteration (cornell 256^2: 109.5 -> ~35 ms/iter).
    # BASELINE config #3 (bench cornell_dof_cache_sort) exercises it on.
    # The megakernel ignores it: its lanes are register-resident and have no
    # memory order to sort.
    sort_by_material: bool = False
    antialiasing: bool = True
    # Per-ray mesh-AABB pre-test (pathtrace.cu:348-353): rays missing every
    # mesh AABB skip the face stream (scalar lax.cond over the wavefront).
    bounding_box: bool = False
    ai_denoise: bool = True
    # Emit the SH-L1 directional lightmap AOV (luminance-weighted mean
    # first-bounce incident direction, normalized to [-1,1]) — training data
    # for the RTLightmap directional filter (core/unet.cpp:744-763,
    # rtlightmap_dir weights). Wavefront path only; forces sorting off so
    # the first-bounce directions stay in pixel lane order.
    dir_aov: bool = False
    # Stratified-jitter hemisphere variant (interactions.h:5,47-86). The
    # sampler exists (ops.sampling.jittered_sample_hemisphere) but, like the
    # reference default, is compiled out of the shade path.
    jittered_sampling: bool = False

    # Thin-lens parameters (pathtrace.cu:279-280).
    lens_radius: float = 0.8
    focal_distance: float = 11.0

    # TPU-specific knobs (no reference equivalent).
    # Faces are streamed through the intersector in chunks of this size to
    # bound the [rays, faces] intermediate in VMEM/HBM.
    face_chunk: int = 64
    # Compute dtype for the trace core. float32 is the reference-parity
    # default; bfloat16 halves HBM traffic at a small quality cost.
    dtype: str = "float32"
    # RNG backend: 'threefry' (counter-based, reference-grade, reproducible
    # across platforms), 'pallas' (TPU hardware PRNG, faster), or 'auto'
    # (pallas on TPU, threefry on CPU).
    rng: str = "threefry"
    # Run the whole iteration as ONE Pallas kernel (rays resident in VMEM,
    # hardware PRNG, zero inter-bounce HBM traffic). TPU-only; applies to
    # primitive-only scenes without the first-bounce cache — other scenes
    # fall back to the wavefront path automatically.
    megakernel: bool = False
    # Opt-in: route >256-face cluster-BVH meshes through the bounce
    # megakernel (in-kernel near-to-far cluster walk fused with shading)
    # when megakernel=True. Measured SLOWER than the wavefront rows tier on
    # shipOnly 800^2 (1.97 vs 2.46 Msam/s, docs/MESH_TIERS.md "bounce
    # megakernel"): the cluster-walk work amplification dominates, so the
    # HBM round-trips the fusion saves don't pay. Kept for measurement and
    # as the platform if the walk's block coherence improves.
    bounce_megakernel: bool = False
    # Wavefront mesh tier: None = auto (cluster-BVH Pallas kernel on TPU for
    # untextured meshes > 256 faces, chunked Moller-Trumbore stream
    # elsewhere); True/False force it. The Pallas tier prunes whole 128-face
    # Morton clusters per (8,128) ray sub-block against the best hit so far.
    mesh_pallas: bool | None = None
    # Mesh-query reorder before the Pallas tier (results are scattered
    # back; image-identical either way — docs/MESH_TIERS.md):
    #   "need"/True — stable-partition by the 1-bit "ray can reach a mesh
    #     AABB" key; ~89% of bounce-ray blocks then skip every cluster.
    #     Measured ~1.5x on embedded meshes, slightly negative when the
    #     mesh fills the view.
    #   "coherence" — (origin cell | direction bin) key; measured a wash.
    #   False — query in pixel order.
    #   None (default) — auto: Renderer enables "need" on TPU when the
    #     host-side bounce-0 AABB-reach estimate is < 30% (VERDICT r2 §2).
    mesh_sort: bool | str | None = None
    # Precision of the rows tier's deferred winner uv/TBN gather table:
    #   "auto" (default) — oct on TPU, f32 on CPU (Renderer resolves at
    #     construction; CPU keeps exact f32 so goldens are platform-stable).
    #   "f32" — [Fp,12] float32, exact.
    #   "f16" — [Fp,6] uint32 of packed half pairs: 24-byte gather rows
    #     instead of 48 (the per-bounce winner gather is the dominant
    #     remaining textured-tier cost, docs/MESH_TIERS.md "byte-packed":
    #     shipTexOnly 800^2 1.60 -> 2.15 Msam/s). Lossy only in the
    #     deferred uv/TBN fetch: t/hit bitwise identical by construction,
    #     uv rounds ~5e-4 relative (< half a texel at 256^2 maps).
    #   "oct" — [Fp,4] uint32: uv coefficients as in "f16" plus the
    #     tangent/bitangent as 8-bit octahedral pairs in one word — 16-byte
    #     gather rows. TBN quantizes to ~1 deg worst-case (bump-mapped
    #     shading normals only; image-mean drift vs f16 measured 6e-6).
    #     Fastest measured: shipTexOnly 800^2 2.213 Msam/s vs f16's 2.137
    #     same-session (scripts/probe_winner_oct.py 2026-08-19), hence the
    #     TPU "auto" choice.
    winner_table: str = "auto"
    # Which Pallas mesh kernel runs the cluster visits (docs/MESH_TIERS.md):
    #   "rows"  — row-granular shifted-face kernel (16-step visits per
    #     128-ray row; visit lists at tile=128). Production default: the
    #     2026-08-17 shoot-out measured it fastest on every config
    #     (shipOnly 256^2 0.94 vs 0.61 Msam/s, 800^2 1.78 vs 0.69;
    #     textured ship 256^2 0.95 vs 0.57).
    #   "rows_dma" — rows with the face buffer HBM-resident and one
    #     cluster panel DMA'd into a VMEM scratch per visit (lifts the
    #     VMEM mesh-size ceiling and enables the dynamic recheck on big
    #     textured buffers; scripts/probe_rows_dma.py).
    #   "lists" — (8,128)-block visit-list kernel (vectorized XLA pre-pass
    #     builds per-block cluster lists; dynamic trip-count loop).
    #   "conds" — the round-2 in-kernel slab+cond walk.
    # All tiers are image-equivalent (parity-tested).
    mesh_tier: str = "rows"
    # Implementation of the sorted-wavefront bounce (sort_by_material=True;
    # image bitwise identical across all three — the permutation is the same
    # stable descending-material order):
    #   "fused"   — one variadic lax.sort co-sorts every wavefront array
    #     through a single comparator network (no materialized permutation
    #     gathers). Default.
    #   "perm"    — counting-sort permutation (M cumsums + one inverse
    #     scatter) applied per array.
    #   "argsort" — the round-2 argsort + per-array take (the BASELINE
    #     config-#3 pathology: ~36 full-wavefront gathers per bounce at
    #     ~10 ms each on this TPU); kept for measurement.
    sort_impl: str = "fused"

    @property
    def first_bounce_cache_active(self) -> bool:
        """First-bounce cache is compiled out when AA or DoF perturbs primary
        rays (pathtrace.cu:586,608)."""
        return self.cache_first_bounce and not self.antialiasing and not self.depth_of_field
