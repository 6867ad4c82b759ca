"""mygpuraytracer_tpu — a TPU-native Monte-Carlo path tracer + AI denoiser framework.

A from-scratch JAX/XLA/Pallas rebuild with the capability surface of the
reference CUDA raytracer + vendored Intel OIDN denoiser (nkkk98/MyGPURaytracer):

- ``scene``    : scene.txt parser, OBJ/MTL ingestion, texture atlas, SoA device scene
                 (reference: apps/src/scene.cpp, sceneStructs.h)
- ``ops``      : vectorized intersection/sampling/compaction primitives
                 (reference: apps/src/intersections.h, interactions.h,
                 stream_compaction/)
- ``render``   : wavefront path-trace pipeline over fixed-shape ray buffers
                 (reference: apps/src/pathtrace.cu)
- ``denoise``  : OIDN-style Device/Filter API around a JAX U-Net + TZA weights
                 (reference: core/, include/OpenImageDenoise/)
- ``train``    : U-Net training toolkit (reference: training/)
- ``parallel`` : multi-chip sharding over jax.sharding.Mesh
- ``utils``    : PNG IO, timers, config

The architecture is TPU-first: static shapes, ``lax.scan`` depth loops with
liveness masks instead of stream compaction, SoA buffers instead of
pointer-chasing PODs, MXU convolutions instead of oneDNN JIT, and on-device
fusion of render→accumulate→denoise instead of the reference's per-frame
GPU→CPU→GPU round trip.
"""

__version__ = "0.1.0"
