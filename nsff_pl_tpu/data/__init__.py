"""Device-side data pipeline: HBM-resident ray tables with on-device batch
sampling (replaces the reference's 4-worker torch DataLoader)."""

from nsff_pl_tpu.data.pipeline import RayBatcher, FrameScheduler  # noqa: F401
