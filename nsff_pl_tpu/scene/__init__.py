"""Host-side scene layer: COLMAP I/O, pose math, prior (flow/depth) I/O,
and the monocular scene loader that materializes ray tables.

All of this runs on the host in NumPy — it is one-time setup work, the
device-side pipeline consumes its outputs (see `nsff_pl_tpu.data`).
"""

from nsff_pl_tpu.scene import colmap, flowio, depthio, poses  # noqa: F401
from nsff_pl_tpu.scene.monocular import MonocularScene  # noqa: F401

scene_dict = {"monocular": MonocularScene}
