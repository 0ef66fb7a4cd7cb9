"""nerf_kinematics_tpu: a TPU-native JAX/XLA/Pallas NeRF framework.

A brand-new framework with the capabilities of the `tomeupm/nerf-kinematics`
thesis pipeline (reference: /root/reference), redesigned TPU-first:

- ``poses``     : robot forward-kinematics 4x4 pose parsing, recenter/scale/Z-flip
                  normalization, orbit test/video pose synthesis, sharpness scoring
                  (reference: parser_instant_ngp.py).
- ``data``      : blender / llff (NDC) / robot / instant-ngp transforms.json loaders
                  (reference: nerf-pytorch submodule loaders + instant-ngp nerf_loader.cu).
- ``cameras``   : intrinsics, ray generation, NDC warp — pure jnp, vmap-first.
- ``ops``       : compute kernels — sinusoidal positional encoding, multiresolution
                  hash-grid encoding (Pallas + jnp reference), spherical harmonics,
                  stratified/importance sampling, alpha compositing, fused MLP kernels.
- ``models``    : FlexibleNeRF coarse/fine MLP (classic NeRF) and the Instant-NGP-class
                  hash-grid model (density 64x3 MLP + color 64x4 MLP).
- ``rendering`` : full volume-rendering pipeline (coarse+fine), chunked image render.
- ``train``     : YAML config (reference schema), jitted train step, Adam + exp decay,
                  validation loop, checkpointing.
- ``parallel``  : device mesh, shardings (rays data-parallel over ICI, params replicated).
- ``io``        : orbax checkpoints, legacy torch-checkpoint import/export, compressed
                  single-file snapshots (.ingp-style).
- ``metrics``   : PSNR, rays/sec, parallax/pose-diversity analysis, TensorBoard scalars.
- ``export``    : marching-cubes mesh export (native C++ core), screenshots, video.
- ``cli``       : reference-compatible command-line entry points.
"""

__version__ = "0.1.0"
