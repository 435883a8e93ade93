"""Geometry golden tests: ray directions, NDC projection and its inverse,
visibility — checked against closed forms (`datasets/ray_utils.py`)."""
import jax.numpy as jnp
import numpy as np

from nsff_pl_tpu.ops import rays as R


def _K(fx=100.0, fy=120.0, cx=32.0, cy=24.0):
    return np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1]], dtype=np.float32)


def test_ray_directions_center_pixel():
    K = _K()
    d = np.asarray(R.get_ray_directions(48, 64, K, flatten=False))
    # pixel exactly at the principal point -> direction (0, 0, -1)
    np.testing.assert_allclose(d[24, 32], [0, 0, -1], atol=1e-6)
    # pixel (j=y, i=x): d = ((i-cx)/fx, -(j-cy)/fy, -1), no +0.5 centering
    np.testing.assert_allclose(d[0, 0], [(0 - 32) / 100, -(0 - 24) / 120, -1],
                               atol=1e-6)


def test_ray_directions_uv_grid():
    d, uv = R.get_ray_directions(4, 5, _K(), return_uv=True)
    uv = np.asarray(uv)
    assert uv.shape == (20, 2)
    np.testing.assert_allclose(uv[0], [0, 0])
    np.testing.assert_allclose(uv[6], [1, 1])  # row-major: v=1 -> idx 5+1


def test_get_rays_identity_pose():
    K = _K()
    dirs = R.get_ray_directions(4, 4, K)
    c2w = np.concatenate([np.eye(3), np.zeros((3, 1))], 1)
    rays_o, rays_d = R.get_rays(dirs, c2w)
    assert np.allclose(rays_o, 0)
    norm = np.linalg.norm(np.asarray(rays_d), axis=-1)
    np.testing.assert_allclose(norm, 1.0, atol=1e-6)


def test_get_rays_translation():
    dirs = R.get_ray_directions(2, 2, _K())
    c2w = np.concatenate([np.eye(3), np.array([[1.0], [2.0], [3.0]])], 1)
    rays_o, _ = R.get_rays(dirs, c2w)
    np.testing.assert_allclose(np.asarray(rays_o),
                               np.tile([1, 2, 3], (4, 1)), atol=1e-6)


def test_ndc_rays_near_plane_maps_to_z0():
    """After the origin shift, the ray origin sits on z_ndc = 1 + 2*near/o_z.
    With near=1 and the shifted origin at o_z=-shift_near=-1 -> z=−1... the
    reference convention gives o2 = 1 + 2*near/o_z; for a camera at origin
    looking down -z with shift_near=1, o_z=-1 so o2 = -1. d2 = 1-o2 = 2;
    marching t in [0,1] spans z in [-1, 1]."""
    K = _K()
    rays_o = jnp.array([[0.0, 0.0, 0.0]])
    rays_d = jnp.array([[0.0, 0.0, -1.0]])
    o, d = R.get_ndc_rays(K, 1.0, 1.0, rays_o, rays_d)
    np.testing.assert_allclose(np.asarray(o)[0], [0, 0, -1], atol=1e-6)
    np.testing.assert_allclose(np.asarray(d)[0], [0, 0, 2], atol=1e-6)


def test_ndc_world_roundtrip():
    """world2ndc and ndc2world must be inverse maps (`ray_utils.py:109-151`)."""
    K = _K()
    rng = np.random.RandomState(0)
    xyz_w = rng.uniform(-1, 1, (100, 3)).astype(np.float32)
    xyz_w[:, 2] = -np.abs(xyz_w[:, 2]) - 1.1  # points in front, beyond near
    ndc = R.world2ndc(jnp.asarray(xyz_w), K)
    back = R.ndc2world(ndc, K)
    np.testing.assert_allclose(np.asarray(back), xyz_w, atol=1e-3, rtol=1e-3)


def test_ndc2world_per_ray_K():
    K = _K()
    xyz = np.random.RandomState(1).uniform(-0.5, 0.5, (4, 6, 3)).astype(np.float32)
    Ks = np.tile(K, (4, 1, 1))
    w_batched = np.asarray(R.ndc2world(jnp.asarray(xyz), jnp.asarray(Ks)))
    w_single = np.asarray(R.ndc2world(jnp.asarray(xyz.reshape(-1, 3)), K))
    np.testing.assert_allclose(w_batched.reshape(-1, 3), w_single, atol=1e-5)


def test_visibility_counts():
    K = _K()
    H, W = 48, 64
    # camera at origin looking down -z ("right up back" c2w = [I | 0])
    c2w = np.concatenate([np.eye(3), np.zeros((3, 1))], 1)[None]
    pts = np.array([
        [0.0, 0.0, -5.0],   # straight ahead -> visible
        [0.0, 0.0, 5.0],    # behind -> invisible
        [100.0, 0.0, -5.0],  # far off-frustum -> invisible
    ], dtype=np.float32)
    vis = np.asarray(R.compute_world_visibility(jnp.asarray(pts), K, H, W, c2w))
    assert vis[0] == 1
    assert vis[1] == 0
    assert vis[2] == 0


def test_visibility_multi_camera():
    K = _K()
    c2w1 = np.concatenate([np.eye(3), np.zeros((3, 1))], 1)
    c2w2 = np.concatenate([np.eye(3), np.array([[0.0], [0.0], [-10.0]])], 1)
    c2ws = np.stack([c2w1, c2w2])
    pts = np.array([[0.0, 0.0, -5.0]], dtype=np.float32)
    vis = np.asarray(R.compute_world_visibility(jnp.asarray(pts), K, 48, 64, c2ws))
    # visible from cam1; behind cam2 (cam2 at z=-10 looking down -z)
    assert vis[0] == 1
