"""Model layer: functional static+transient NeRF with scene-flow heads, and
the statically-specialized volumetric renderer."""

from nsff_pl_tpu.models import nerf, rendering  # noqa: F401
