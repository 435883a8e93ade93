"""Monocular-video scene loader.

Host-side NumPy re-design of the reference `datasets/monocular.py:15-309`.
Instead of a torch `Dataset` feeding 4 DataLoader workers, this class does
the one-time geometry/prior work and materializes a single
(N_frames, H*W, 16) float32 **ray table** that the device pipeline
(`nsff_pl_tpu.data.pipeline`) uploads to HBM once; batch sampling then
happens on-device.

Ray-table channel layout (identical to `monocular.py:181-184`):
    [0:3]   rays_o (NDC)
    [3:6]   rays_d (NDC)
    [6:9]   rgb
    [9]     t (frame index)
    [10]    disparity prior
    [11]    motion mask (0 = static, 1 = dynamic)
    [12:14] uv + forward optical flow target
    [14:16] uv + backward optical flow target
"""
from __future__ import annotations

import glob
import os
from typing import Optional, Tuple

import numpy as np

from nsff_pl_tpu.scene import colmap, flowio
from nsff_pl_tpu.scene import poses as pose_utils

# ray generation is pure math; reuse the jnp implementation on CPU arrays
from nsff_pl_tpu.ops import rays as ray_ops


def _imread_rgb(path: str, img_wh: Tuple[int, int]) -> np.ndarray:
    from PIL import Image

    img = Image.open(path).convert("RGB")
    img = img.resize(img_wh, Image.LANCZOS)
    return np.asarray(img, dtype=np.float32) / 255.0  # (h, w, 3)


def _imread_gray(path: str, img_wh: Tuple[int, int]) -> np.ndarray:
    from PIL import Image

    img = Image.open(path).convert("L")
    img = img.resize(img_wh, Image.NEAREST)
    return np.asarray(img, dtype=np.float32) / 255.0  # (h, w)


def _imread_disp(path: str, img_wh: Tuple[int, int]) -> np.ndarray:
    import cv2

    disp = cv2.imread(path, cv2.IMREAD_ANYDEPTH).astype(np.float32)
    return cv2.resize(disp, img_wh, interpolation=cv2.INTER_NEAREST)


class MonocularScene:
    """Scene geometry + priors + ray tables for one monocular video.

    Split options (identical semantics to `monocular.py:20-27`):
        train, val, test, test_spiral, test_spiralX, test_fixviewX_interpY
    """

    def __init__(self, root_dir: str, split: str = "train",
                 img_wh: Tuple[int, int] = (512, 288),
                 start_end: Tuple[int, int] = (0, 30),
                 cache_dir: Optional[str] = None,
                 hard_sampling: bool = False):
        self.root_dir = root_dir
        self.split = split
        self.img_wh = img_wh
        self.cam_train = [0]
        self.cam_test = 1
        self.start_frame, self.end_frame = start_end
        self.cache_dir = cache_dir or None
        self.hard_sampling = hard_sampling
        self.read_meta()

    # ------------------------------------------------------------------
    def _glob(self, sub: str, pattern: str = "*"):
        return sorted(glob.glob(os.path.join(self.root_dir, sub, pattern)))[
            self.start_frame:self.end_frame]

    def read_meta(self):
        """Load COLMAP model, estimate the near depth, center/scale poses,
        and build per-split buffers (`monocular.py:41-209`)."""
        self.image_paths = self._glob("images")
        self.disp_paths = self._glob("disps")
        self.mask_paths = self._glob("masks")
        self.flow_fw_paths = self._glob("flow_fw", "*.flo") + ["dummy"]
        self.flow_bw_paths = ["dummy"] + self._glob("flow_bw", "*.flo")
        self.N_frames = len(self.image_paths)

        camdata = colmap.read_cameras_binary(
            os.path.join(self.root_dir, "sparse/0/cameras.bin"))
        cam = camdata[1]
        H, W = cam.height, cam.width
        f = cam.params[0]
        # intrinsics with centered principal point, rescaled to img_wh
        # (monocular.py:61-65)
        self.K = np.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]],
                          dtype=np.float32)
        self.K[0] *= self.img_wh[0] / W
        self.K[1] *= self.img_wh[1] / H

        imdata = colmap.read_images_binary(
            os.path.join(self.root_dir, "sparse/0/images.bin"))
        perm = np.argsort([imdata[k].name for k in imdata])
        bottom = np.array([[0, 0, 0, 1.0]])
        w2c_mats = np.stack([
            np.concatenate([np.concatenate(
                [imdata[k].qvec2rotmat(), imdata[k].tvec.reshape(3, 1)], 1),
                bottom], 0)
            for k in imdata], 0)[perm][self.start_frame:self.end_frame]
        poses = np.linalg.inv(w2c_mats)[:, :3]  # (N_frames, 3, 4) c2w

        pts3d = colmap.read_points3d_binary(
            os.path.join(self.root_dir, "sparse/0/points3D.bin"))
        self.nearest_depth = self._estimate_near_depth(pts3d, w2c_mats)

        # COLMAP "right down front" -> "right up back" + centering
        # (monocular.py:120-121)
        self.poses = np.concatenate(
            [poses[..., 0:1], -poses[..., 1:3], poses[..., 3:4]], -1)
        self.poses = pose_utils.center_poses(self.poses)

        # scale so the nearest scene content sits at depth ~1
        # (monocular.py:124-125)
        self.scale_factor = self.nearest_depth
        self.poses[..., 3] /= self.scale_factor

        # projection matrices for the 2D-3D flow loss (monocular.py:128-134)
        bottom_n = np.zeros((self.N_frames, 1, 4))
        bottom_n[..., -1] = 1
        rt = np.linalg.inv(np.concatenate([self.poses, bottom_n], 1))[:, :3]
        rt[:, 1:] *= -1  # "right up back" -> "right down forward"
        self.Ps = (self.K @ rt)[None].astype(np.float32)  # (1, N_frames, 3, 4)
        self.Ks = self.K[None].astype(np.float32)  # (1, 3, 3)

        if self.split == "train":
            self.rays = self._build_ray_table()
            if self.hard_sampling:
                n_pix = self.img_wh[0] * self.img_wh[1]
                self.weights = np.ones((self.N_frames, n_pix), np.float32)
        elif self.split == "val" or self.split == "test":
            self.poses_test = self.poses.copy()
        elif self.split.startswith("test_fixview"):
            target_idx = int(self.split.split("_")[1][7:])
            self.poses_test = np.tile(self.poses[target_idx],
                                      (self.N_frames, 1, 1))
        elif self.split.startswith("test_spiral"):
            if self.split == "test_spiral":
                max_trans = np.percentile(
                    np.abs(np.diff(self.poses[:, 0, 3])), 10)
                radii = np.array([max_trans, max_trans, 0])
                self.poses_test = pose_utils.create_spiral_poses(
                    self.poses, radii, n_poses=6 * self.N_frames)
            else:
                target_idx = int(self.split.split("_")[1][6:])
                max_trans = np.abs(
                    self.poses[0, 0, 3] - self.poses[-1, 0, 3]) / 5
                self.poses_test = pose_utils.create_wander_path(
                    self.poses[target_idx], max_trans=max_trans, n_poses=60)

    # ------------------------------------------------------------------
    def _estimate_near_depth(self, pts3d, w2c_mats) -> float:
        """Per-frame near depth by regressing COLMAP point depths against
        the monodepth disparity prior; geometric fallback when the
        regression is poor (`monocular.py:93-116`)."""
        from scipy.stats import linregress

        ids = list(pts3d)
        pts_w = np.stack([pts3d[k].xyz for k in ids], 1)  # (3, P)
        visibilities = np.zeros((self.N_frames, len(ids)))
        for i, k in enumerate(ids):
            for j in pts3d[k].image_ids:
                if self.start_frame <= j - 1 < self.end_frame:
                    visibilities[j - 1 - self.start_frame, i] = 1

        pts_w_h = np.concatenate([pts_w, np.ones((1, len(ids)))], 0)  # (4, P)
        min_depth = 1e8
        for i in range(self.N_frames):
            disp = _imread_disp(self.disp_paths[i], self.img_wh)
            vis = visibilities[i] == 1
            pts_c = (w2c_mats[i] @ pts_w_h[:, vis])[:3]
            pts_uvd = self.K @ pts_c
            uv = (pts_uvd[:2] / pts_uvd[2:]).T.astype(int)
            uv[:, 0] = np.clip(uv[:, 0], 0, self.img_wh[0] - 1)
            uv[:, 1] = np.clip(uv[:, 1], 0, self.img_wh[1] - 1)
            depth = pts_uvd[2]
            reg = linregress(1 / depth, disp[uv[:, 1], uv[:, 0]])
            if reg.rvalue ** 2 > 0.9:  # trustworthy fit
                min_depth = min(min_depth, reg.slope /
                                (np.percentile(disp, 95) - reg.intercept))
            else:
                min_depth = min(min_depth, np.percentile(depth, 5))
        return min_depth * 0.75

    # ------------------------------------------------------------------
    def _frame_rays(self, c2w: np.ndarray):
        """NDC rays for one camera pose; shared by train table and test
        batches (`monocular.py:139-154,268-272`)."""
        w, h = self.img_wh
        directions, uv = ray_ops.get_ray_directions(h, w, self.K,
                                                    return_uv=True)
        rays_o, rays_d = ray_ops.get_rays(directions, c2w[:3, :4])
        shift_near = -min(-1.0, float(c2w[2, 3]))
        rays_o, rays_d = ray_ops.get_ndc_rays(self.K, 1.0, shift_near,
                                              rays_o, rays_d)
        return np.asarray(rays_o), np.asarray(rays_d), np.asarray(uv)

    def _read_flow_pair(self, t: int):
        w, h = self.img_wh
        if t < self.N_frames - 1:
            fw = flowio.resize_flow(
                flowio.read_flow(self.flow_fw_paths[t]), w, h).reshape(-1, 2)
        else:
            fw = np.zeros((w * h, 2), np.float32)
        if t >= 1:
            bw = flowio.resize_flow(
                flowio.read_flow(self.flow_bw_paths[t]), w, h).reshape(-1, 2)
        else:
            bw = np.zeros((w * h, 2), np.float32)
        return fw, bw

    def _build_ray_table(self) -> np.ndarray:
        """(N_frames, h*w, 16) ray table (`monocular.py:137-184`), cacheable
        to `cache_dir/rays.npy`."""
        if self.cache_dir:
            cache_file = os.path.join(self.cache_dir, "rays.npy")
            if os.path.exists(cache_file):
                return np.load(cache_file, mmap_mode=None)

        from nsff_pl_tpu.scene import native

        w, h = self.img_wh
        use_native = native.available()
        tables = []
        for t in range(self.N_frames):
            img = _imread_rgb(self.image_paths[t], self.img_wh)
            disp = _imread_disp(self.disp_paths[t], self.img_wh)
            mask = _imread_gray(self.mask_paths[t], self.img_wh)
            flow_fw, flow_bw = self._read_flow_pair(t)
            if use_native:
                shift_near = -min(-1.0, float(self.poses[t, 2, 3]))
                tables.append(native.build_frame_rays(
                    self.K, self.poses[t], img, disp, mask,
                    flow_fw.reshape(h, w, 2), flow_bw.reshape(h, w, 2),
                    t, 1.0, shift_near))
            else:
                rays_o, rays_d, uv = self._frame_rays(self.poses[t])
                rays_t = np.full((w * h, 1), t, np.float32)
                tables.append(np.concatenate(
                    [rays_o, rays_d, img.reshape(-1, 3), rays_t,
                     disp.reshape(-1, 1), mask.reshape(-1, 1),
                     uv + flow_fw, uv + flow_bw], 1).astype(np.float32))
        table = np.stack(tables, 0)

        if self.cache_dir:
            os.makedirs(self.cache_dir, exist_ok=True)
            np.save(os.path.join(self.cache_dir, "rays.npy"), table)
        return table

    # ------------------------------------------------------------------
    def test_item(self, idx: int):
        """Full-image sample for val/test splits (`monocular.py:251-309`).
        Returns a dict of numpy arrays."""
        if self.split == "val":
            c2w = self.poses[self.N_frames // 2]
            t = self.N_frames // 2
        else:
            c2w = self.poses_test[idx]
            if self.split == "test" or self.split.startswith("test_fixview"):
                t = idx
            elif self.split == "test_spiral":
                t = int(idx / len(self.poses_test) * self.N_frames)
            elif self.split.startswith("test_spiral"):
                t = int(self.split.split("_")[1][6:])
            else:
                t = 0

        w, h = self.img_wh
        rays_o, rays_d, _ = self._frame_rays(c2w)
        sample = {
            "rays": np.concatenate([rays_o, rays_d], 1).astype(np.float32),
            "ts": np.full((w * h,), t, np.int32),
            "c2w": np.asarray(c2w, np.float32),
            "cam_ids": 0,
        }
        if t < len(self.image_paths):
            sample["rgbs"] = _imread_rgb(
                self.image_paths[t], self.img_wh).reshape(-1, 3)
            sample["disp"] = _imread_disp(
                self.disp_paths[t], self.img_wh).reshape(-1)
            sample["mask"] = _imread_gray(
                self.mask_paths[t], self.img_wh).reshape(-1)
            fw, bw = self._read_flow_pair(t)
            sample["flow_fw"] = fw.reshape(h, w, 2)
            sample["flow_bw"] = bw.reshape(h, w, 2)
        return sample

    def __len__(self):
        if self.split == "train":
            # steps per epoch (monocular.py:214-216)
            return self.img_wh[0] * self.img_wh[1] * self.N_frames // 1000
        if self.split == "val":
            return 1
        return len(self.poses_test)
