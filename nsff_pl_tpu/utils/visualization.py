"""Visualization helpers for TensorBoard grids and eval outputs.

Equivalent to the reference `utils/visualization.py:6-44` but numpy-native
(HWC uint8/float outputs instead of torch CHW tensors).
"""
from __future__ import annotations

import numpy as np


def visualize_depth(depth: np.ndarray, cmap: int = None) -> np.ndarray:
    """(H, W) depth -> (H, W, 3) float RGB in [0,1], JET colormap after
    min-max normalization (`visualization.py:6-18`)."""
    import cv2

    if cmap is None:
        cmap = cv2.COLORMAP_JET
    x = np.nan_to_num(np.asarray(depth, dtype=np.float32))
    mi, ma = x.min(), x.max()
    x = (x - mi) / (ma - mi + 1e-8)
    x = (255 * x).astype(np.uint8)
    bgr = cv2.applyColorMap(x, cmap)
    return bgr[..., ::-1].astype(np.float32) / 255.0


def visualize_mask(mask: np.ndarray, cmap: int = None) -> np.ndarray:
    """(H, W) mask in [0,1] -> BONE-colormapped RGB
    (`visualization.py:21-29`)."""
    import cv2

    if cmap is None:
        cmap = cv2.COLORMAP_BONE
    x = (255 * np.clip(np.asarray(mask, dtype=np.float32), 0, 1)).astype(np.uint8)
    bgr = cv2.applyColorMap(x, cmap)
    return bgr[..., ::-1].astype(np.float32) / 255.0


def blend_images(img1: np.ndarray, img2: np.ndarray,
                 alpha: float) -> np.ndarray:
    """alpha-blend two (H, W, 3) float images (`visualization.py:32-44`)."""
    import cv2

    a = (255 * np.clip(img1, 0, 1)).astype(np.uint8)
    b = (255 * np.clip(img2, 0, 1)).astype(np.uint8)
    blend = cv2.addWeighted(a, alpha, b, 1 - alpha, 2.2)
    return blend.astype(np.float32) / 255.0


def make_grid(images, nrow: int = 3) -> np.ndarray:
    """Tile (H, W, 3) images into a grid, `nrow` per row (the reference
    uses torchvision make_grid, `train.py:232`)."""
    if not images:
        return np.zeros((1, 1, 3), np.float32)
    h, w = images[0].shape[:2]
    imgs = [np.clip(np.asarray(im, np.float32), 0, 1) if im.ndim == 3
            else visualize_depth(im) for im in images]
    n = len(imgs)
    ncol = nrow
    nrows = (n + ncol - 1) // ncol
    grid = np.zeros((nrows * h, ncol * w, 3), np.float32)
    for i, im in enumerate(imgs):
        r, c = divmod(i, ncol)
        grid[r * h:(r + 1) * h, c * w:(c + 1) * w] = im
    return grid
