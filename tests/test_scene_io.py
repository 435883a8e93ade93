"""COLMAP binary round-trip, pose math, and flow/depth I/O tests."""
import numpy as np
import pytest

from nsff_pl_tpu.scene import colmap, depthio, flowio, poses


def _random_model(rng):
    cams = {1: colmap.Camera(1, "SIMPLE_RADIAL", 640, 480,
                             np.array([500.0, 320.0, 240.0, 0.01]))}
    images = {}
    for i in range(1, 4):
        q = rng.standard_normal(4)
        q /= np.linalg.norm(q)
        if q[0] < 0:
            q = -q
        n = rng.integers(2, 6)
        images[i] = colmap.Image(
            i, q, rng.standard_normal(3), 1, f"{i:03d}.png",
            rng.uniform(0, 640, (n, 2)),
            rng.integers(-1, 10, n).astype(np.int64))
    pts = {}
    for j in range(1, 6):
        m = rng.integers(1, 4)
        pts[j] = colmap.Point3D(
            j, rng.standard_normal(3),
            rng.integers(0, 255, 3).astype(np.uint8), float(rng.uniform()),
            rng.integers(1, 4, m), rng.integers(0, 5, m))
    return cams, images, pts


def test_colmap_binary_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    cams, images, pts = _random_model(rng)
    colmap.write_model(cams, images, pts, str(tmp_path))
    cams2, images2, pts2 = colmap.read_model(str(tmp_path), ".bin")

    assert cams2[1].model == "SIMPLE_RADIAL"
    np.testing.assert_allclose(cams2[1].params, cams[1].params)
    for i in images:
        np.testing.assert_allclose(images2[i].qvec, images[i].qvec)
        np.testing.assert_allclose(images2[i].tvec, images[i].tvec)
        assert images2[i].name == images[i].name
        np.testing.assert_array_equal(images2[i].point3D_ids,
                                      images[i].point3D_ids)
    for j in pts:
        np.testing.assert_allclose(pts2[j].xyz, pts[j].xyz)
        np.testing.assert_array_equal(pts2[j].image_ids, pts[j].image_ids)


def test_qvec_rotmat_roundtrip():
    rng = np.random.default_rng(1)
    for _ in range(10):
        q = rng.standard_normal(4)
        q /= np.linalg.norm(q)
        if q[0] < 0:
            q = -q
        R = poses.qvec2rotmat(q)
        # proper rotation
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-10)
        assert np.linalg.det(R) > 0
        np.testing.assert_allclose(poses.rotmat2qvec(R), q, atol=1e-8)


def test_center_poses_average_is_identity():
    rng = np.random.default_rng(2)
    from scipy.spatial.transform import Rotation

    Rm = Rotation.random(8, random_state=3).as_matrix()
    t = rng.standard_normal((8, 3, 1))
    p = np.concatenate([Rm, t], -1)
    centered = poses.center_poses(p)
    avg = poses.average_poses(centered)
    np.testing.assert_allclose(avg[:, :3], np.eye(3), atol=1e-8)
    np.testing.assert_allclose(avg[:, 3], 0, atol=1e-8)


def test_spiral_poses_shape_and_rotations():
    from scipy.spatial.transform import Rotation

    Rm = Rotation.random(5, random_state=4).as_matrix()
    p = np.concatenate([Rm, np.zeros((5, 3, 1))], -1)
    sp = poses.create_spiral_poses(p, np.array([0.1, 0.1, 0.0]), n_poses=30)
    assert sp.shape == (30, 3, 4)
    # first pose rotation == first original rotation (slerp endpoint)
    np.testing.assert_allclose(sp[0, :, :3], Rm[0], atol=1e-8)


def test_wander_path_returns_to_reference():
    c2w = np.concatenate([np.eye(3), np.array([[1.0], [2.0], [3.0]])], 1)
    wp = poses.create_wander_path(c2w, max_trans=0.0, n_poses=8)
    assert wp.shape == (8, 3, 4)
    for i in range(8):
        np.testing.assert_allclose(wp[i], c2w, atol=1e-12)


def test_flo_roundtrip(tmp_path):
    rng = np.random.default_rng(5)
    flow = rng.standard_normal((12, 16, 2)).astype(np.float32)
    path = str(tmp_path / "t.flo")
    flowio.write_flow(flow, path)
    back = flowio.read_flow(path)
    np.testing.assert_allclose(back, flow)


def test_resize_flow_rescales_components():
    flow = np.ones((10, 20, 2), dtype=np.float32)
    out = flowio.resize_flow(flow, 40, 10)
    np.testing.assert_allclose(out[..., 0], 2.0, atol=1e-5)
    np.testing.assert_allclose(out[..., 1], 1.0, atol=1e-5)


def test_flow_to_image_shape():
    flow = np.zeros((8, 8, 2), dtype=np.float32)
    flow[..., 0] = 1.0
    img = flowio.flow_to_image(flow)
    assert img.shape == (8, 8, 3)
    assert img.dtype == np.uint8


def test_pfm_roundtrip(tmp_path):
    rng = np.random.default_rng(6)
    img = rng.standard_normal((7, 9)).astype(np.float32)
    path = str(tmp_path / "d.pfm")
    depthio.save_pfm(path, img)
    back, scale = depthio.read_pfm(path)
    np.testing.assert_allclose(back, img, rtol=1e-6)
    assert scale == 1.0


def test_pfm_color_roundtrip(tmp_path):
    rng = np.random.default_rng(7)
    img = rng.standard_normal((5, 6, 3)).astype(np.float32)
    path = str(tmp_path / "c.pfm")
    depthio.save_pfm(path, img)
    back, _ = depthio.read_pfm(path)
    np.testing.assert_allclose(back, img, rtol=1e-6)
