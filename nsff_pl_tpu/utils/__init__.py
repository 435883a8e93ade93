"""Host-side utilities: visualization + logging."""

from nsff_pl_tpu.utils.visualization import (  # noqa: F401
    blend_images,
    visualize_depth,
    visualize_mask,
)
