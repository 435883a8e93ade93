"""Motion-mask prediction for dynamic objects.

Equivalent of the reference's `third_party/predict_mask.py:28-64`: a COCO
Mask-RCNN marks pixels of movable categories (person, vehicles, animals,
balls, ...) as dynamic; the mask is eroded (region inflated, since mask=0
marks dynamic) with a 15x15 kernel and written as `masks/<name>.png.png`
(double suffix kept: COLMAP's `--ImageReader.mask_path` expects the mask
for `x.png` at `x.png.png`).

detectron2 is not baked into this image, so the predictor is gated: if
unavailable, `predict_masks` raises with instructions, and callers can use
`trivial_masks` (all-static) to run static-scene pipelines.
"""
from __future__ import annotations

import glob
import os

import numpy as np

# COCO class ids treated as dynamic (person, vehicles, animals, ball, ...)
# — same category prior as the reference (predict_mask.py:28-30)
DYNAMIC_CATEGORIES = [0, 1, 2, 3, 5, 7, 14, 15, 16, 17, 18, 19, 20, 21, 32]
SCORE_THRESHOLD = 0.05  # predict_mask.py:47
ERODE_KERNEL = 15  # predict_mask.py:63


def predict_masks(root_dir: str, categories=None,
                  score_thresh: float = SCORE_THRESHOLD) -> int:
    """Run Mask-RCNN over `root_dir/images/*` and write masks.

    Returns the number of masks written. Raises RuntimeError when
    detectron2 is unavailable.
    """
    try:
        from detectron2 import model_zoo
        from detectron2.config import get_cfg
        from detectron2.engine import DefaultPredictor
    except Exception as e:  # pragma: no cover - detectron2 not in image
        raise RuntimeError(
            "detectron2 is required for mask prediction but is not "
            "installed; install it or provide masks/ yourself "
            f"(import error: {e})")

    import cv2

    categories = categories or DYNAMIC_CATEGORIES
    cfg = get_cfg()
    cfg.merge_from_file(model_zoo.get_config_file(
        "COCO-InstanceSegmentation/mask_rcnn_R_50_FPN_3x.yaml"))
    cfg.MODEL.ROI_HEADS.SCORE_THRESH_TEST = score_thresh
    cfg.MODEL.WEIGHTS = model_zoo.get_checkpoint_url(
        "COCO-InstanceSegmentation/mask_rcnn_R_50_FPN_3x.yaml")
    predictor = DefaultPredictor(cfg)

    out_dir = os.path.join(root_dir, "masks")
    os.makedirs(out_dir, exist_ok=True)
    kernel = np.ones((ERODE_KERNEL, ERODE_KERNEL), np.uint8)
    n = 0
    for path in sorted(glob.glob(os.path.join(root_dir, "images", "*"))):
        img = cv2.imread(path)
        inst = predictor(img)["instances"]
        mask = np.ones(img.shape[:2], np.uint8) * 255  # 255 = static
        for cls, m in zip(inst.pred_classes.cpu().numpy(),
                          inst.pred_masks.cpu().numpy()):
            if int(cls) in categories:
                mask[m] = 0  # dynamic
        mask = cv2.erode(mask, kernel)  # inflate the dynamic region
        cv2.imwrite(os.path.join(out_dir,
                                 os.path.basename(path) + ".png"), mask)
        n += 1
    return n


def trivial_masks(root_dir: str) -> int:
    """All-static masks (for scenes without dynamic objects, or when
    detectron2 is unavailable and masks are provided some other way)."""
    import cv2

    out_dir = os.path.join(root_dir, "masks")
    os.makedirs(out_dir, exist_ok=True)
    n = 0
    for path in sorted(glob.glob(os.path.join(root_dir, "images", "*"))):
        img = cv2.imread(path)
        mask = np.ones(img.shape[:2], np.uint8) * 255
        cv2.imwrite(os.path.join(out_dir,
                                 os.path.basename(path) + ".png"), mask)
        n += 1
    return n
