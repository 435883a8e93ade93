"""nsff_pl_tpu — a TPU-native JAX framework for Neural Scene Flow Fields.

A from-scratch re-design of the capabilities of kwea123/nsff_pl
(PyTorch Lightning + CUDA) as an idiomatic JAX / XLA / Pallas / pjit
framework:

- host-side NumPy "scene" layer (COLMAP I/O, pose math, flow/depth priors)
- HBM-resident ray tables with on-device batch sampling (no DataLoader)
- functional static+transient NeRF with scene-flow heads, evaluated as
  large batched matmuls on the MXU (optionally via a fused Pallas kernel)
- a statically-specialized volumetric renderer with 3-frame scene-flow
  warping and disocclusion weights
- the eight NSFF loss terms with epoch schedules
- softmax-splatting forward warping as a deterministic XLA scatter-add
  (custom VJP matching the reference CUDA op) for space-time interpolation
- pjit data-parallel training over a `jax.sharding.Mesh`

Reference behavior citations use `file:line` into the upstream repo
(`kwea123/nsff_pl`), e.g. `models/rendering.py:52`.
"""

__version__ = "0.1.0"

from nsff_pl_tpu.config import NSFFConfig  # noqa: F401
