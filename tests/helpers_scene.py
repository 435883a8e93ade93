"""Synthetic-scene fixture: writes a tiny but complete monocular scene
(COLMAP binary model + images + disparity/mask/flow priors) so dataset and
CLI paths are testable without real data (the reference has no fixtures at
all — SURVEY.md §4)."""
import os

import numpy as np


def _frame(H, W, N, i, rng):
    """Structured, learnable frame: smooth sinusoid background (shifting
    with the camera's lateral translation so geometry is plausibly
    consistent) plus a bright disk moving across frames (dynamic content
    for the transient field + flows). Unlike the default uniform-noise
    frames — whose best achievable PSNR is the predict-the-mean
    10*log10(12) = 10.79 dB at scales too large to memorize — this is
    fittable to high PSNR, so it supports convergence validation at
    reference scale."""
    y, x = np.mgrid[0:H, 0:W].astype(np.float32)
    shift = 0.05 * i * 0.9 * W / 5.0  # camera dx * focal / mean depth
    img = np.stack([
        0.5 + 0.35 * np.sin(2 * np.pi * (x + shift) / W * 3.0),
        0.5 + 0.35 * np.sin(2 * np.pi * y / H * 2.0 + 1.0),
        0.5 + 0.25 * np.sin(2 * np.pi * ((x + shift) / W + y / H) * 2.0),
    ], -1)
    cx = (0.15 + 0.7 * i / max(N - 1, 1)) * W
    cy = H * (0.5 + 0.15 * np.sin(2 * np.pi * i / max(N, 1)))
    r2 = (x - cx) ** 2 + (y - cy) ** 2
    disk = np.exp(-r2 / (0.08 * min(H, W)) ** 2)[..., None]
    img = img * (1 - disk) + disk * np.array([0.95, 0.3, 0.2])
    return (np.clip(img, 0, 1) * 255).astype(np.uint8)


def make_synthetic_scene(root: str, W: int = 64, H: int = 48, N: int = 5,
                         seed: int = 0, learnable: bool = False):
    """Create a valid scene directory under `root` with `N` frames of
    `W x H` images. Camera translates laterally looking down +z (COLMAP
    convention); 3D points lie 3-8 units in front. With `learnable`,
    frames are structured content (see `_frame`) instead of uniform
    noise."""
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
        img = _frame(H, W, N, i, rng) if learnable else \
            rng.uniform(0, 255, (H, W, 3)).astype(np.uint8)
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
