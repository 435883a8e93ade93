"""Synthetic-scene fixture: writes a tiny but complete monocular scene
(COLMAP binary model + images + disparity/mask/flow priors) so dataset and
CLI paths are testable without real data (the reference has no fixtures at
all — SURVEY.md §4)."""
import os

import numpy as np


def make_synthetic_scene(root: str, W: int = 64, H: int = 48, N: int = 5,
                         seed: int = 0):
    """Create a valid scene directory under `root` with `N` frames of
    `W x H` images. Camera translates laterally looking down +z (COLMAP
    convention); 3D points lie 3-8 units in front."""
    import cv2
    from PIL import Image as PILImage

    from nsff_pl_tpu.scene import colmap, flowio
    from nsff_pl_tpu.scene.poses import rotmat2qvec

    rng = np.random.default_rng(seed)
    for sub in ["images", "disps", "masks", "flow_fw", "flow_bw", "sparse/0"]:
        os.makedirs(os.path.join(root, sub), exist_ok=True)

    cams = {1: colmap.Camera(1, "SIMPLE_RADIAL", W, H,
                             np.array([0.9 * W, W / 2, H / 2, 0.0]))}
    images = {}
    for i in range(N):
        Rm = np.eye(3)
        t = np.array([0.05 * i, 0.0, 0.0])
        images[i + 1] = colmap.Image(
            i + 1, rotmat2qvec(Rm), t, 1, f"{i:05d}.png",
            np.zeros((0, 2)), np.zeros(0, np.int64))

    pts = {}
    for j in range(1, 60):
        xyz = np.array([rng.uniform(-1, 1), rng.uniform(-1, 1),
                        rng.uniform(3.0, 8.0)])
        pts[j] = colmap.Point3D(
            j, xyz, np.array([128, 128, 128], np.uint8), 0.1,
            np.arange(1, N + 1), np.zeros(N, np.int64))
    colmap.write_model(cams, images, pts, os.path.join(root, "sparse/0"))

    for i in range(N):
        img = rng.uniform(0, 255, (H, W, 3)).astype(np.uint8)
        PILImage.fromarray(img).save(f"{root}/images/{i:05d}.png")
        disp = (1000.0 / rng.uniform(3, 8, (H, W))).astype(np.uint16)
        cv2.imwrite(f"{root}/disps/{i:05d}.png", disp)
        mask = ((rng.uniform(0, 1, (H, W)) > 0.8) * 255).astype(np.uint8)
        PILImage.fromarray(mask).save(f"{root}/masks/{i:05d}.png")
        if i < N - 1:
            flowio.write_flow(rng.normal(0, 1, (H, W, 2)).astype(np.float32),
                              f"{root}/flow_fw/{i:05d}.flo")
        if i > 0:
            flowio.write_flow(rng.normal(0, 1, (H, W, 2)).astype(np.float32),
                              f"{root}/flow_bw/{i:05d}.flo")
    return root
