"""Native (C++) scene-loading kernels vs the Python/JAX reference path."""
import numpy as np
import pytest

from nsff_pl_tpu.scene import native

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="no C++ toolchain")


def _K(W, H):
    return np.array([[0.9 * W, 0, W / 2], [0, 0.9 * W, H / 2], [0, 0, 1]],
                    np.float32)


def test_native_frame_rays_match_python():
    from nsff_pl_tpu.ops import rays as R

    rng = np.random.default_rng(0)
    W, H = 24, 16
    K = _K(W, H)
    from scipy.spatial.transform import Rotation

    c2w = np.concatenate([Rotation.random(1, random_state=1).as_matrix()[0],
                          rng.normal(0, 0.2, (3, 1)) - [[0], [0], [1.5]]], 1)
    img = rng.random((H, W, 3)).astype(np.float32)
    disp = rng.random((H, W)).astype(np.float32)
    mask = (rng.random((H, W)) > 0.5).astype(np.float32)
    fw = rng.normal(0, 2, (H, W, 2)).astype(np.float32)
    bw = rng.normal(0, 2, (H, W, 2)).astype(np.float32)

    shift_near = -min(-1.0, float(c2w[2, 3]))
    out = native.build_frame_rays(K, c2w, img, disp, mask, fw, bw, 3.0,
                                  1.0, shift_near)
    assert out.shape == (H * W, 16)

    # python reference path
    import jax.numpy as jnp

    dirs, uv = R.get_ray_directions(H, W, K, return_uv=True)
    ro, rd = R.get_rays(dirs, c2w)
    ro, rd = R.get_ndc_rays(K, 1.0, shift_near, ro, rd)
    ref = np.concatenate(
        [np.asarray(ro), np.asarray(rd), img.reshape(-1, 3),
         np.full((H * W, 1), 3.0, np.float32), disp.reshape(-1, 1),
         mask.reshape(-1, 1), np.asarray(uv) + fw.reshape(-1, 2),
         np.asarray(uv) + bw.reshape(-1, 2)], 1)
    np.testing.assert_allclose(out, ref, atol=2e-4, rtol=1e-4)


def test_native_frame_rays_null_flows():
    rng = np.random.default_rng(1)
    W, H = 8, 6
    c2w = np.concatenate([np.eye(3), [[0], [0], [-1.0]]], 1).astype(np.float32)
    out = native.build_frame_rays(
        _K(W, H), c2w, rng.random((H, W, 3)).astype(np.float32),
        rng.random((H, W)).astype(np.float32),
        rng.random((H, W)).astype(np.float32), None, None, 0.0)
    # uv channels should be the raw pixel grid
    np.testing.assert_allclose(out[:, 12], np.tile(np.arange(W), H))
    np.testing.assert_allclose(out[:, 13], np.repeat(np.arange(H), W))


def test_native_flo_parser(tmp_path):
    from nsff_pl_tpu.scene import flowio

    rng = np.random.default_rng(2)
    flow = rng.normal(0, 3, (10, 14, 2)).astype(np.float32)
    path = str(tmp_path / "x.flo")
    flowio.write_flow(flow, path)
    out = native.parse_flo(path)
    np.testing.assert_allclose(out, flow)


def test_native_flo_bad_magic(tmp_path):
    path = str(tmp_path / "bad.flo")
    with open(path, "wb") as f:
        f.write(b"\x01" * 32)
    with pytest.raises(ValueError):
        native.parse_flo(path)


def test_scene_uses_native_table(tmp_path):
    """End-to-end: MonocularScene's table via native == via python."""
    from tests.helpers_scene import make_synthetic_scene
    from nsff_pl_tpu.scene import MonocularScene

    root = str(tmp_path / "scene")
    make_synthetic_scene(root, W=32, H=24, N=3)
    sc = MonocularScene(root, split="train", img_wh=(32, 24), start_end=(0, 3))
    assert sc.rays.shape == (3, 32 * 24, 16)

    # force the python path and compare
    import nsff_pl_tpu.scene.native as nat

    orig = nat.available
    nat.available = lambda: False
    try:
        sc_py = MonocularScene(root, split="train", img_wh=(32, 24),
                               start_end=(0, 3))
    finally:
        nat.available = orig
    np.testing.assert_allclose(sc.rays, sc_py.rays, atol=2e-4, rtol=1e-4)
