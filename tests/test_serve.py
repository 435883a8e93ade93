"""HTTP render server (`tools/serve_render.py`): checkpoint -> live
serving endpoint. Drives a real server subprocess end-to-end: health,
scene metadata, a PNG render of a training pose, a custom-pose render,
and error handling."""
import io
import json
import os
import subprocess
import sys
import time
import urllib.error
import urllib.request

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _get(url, timeout=120):
    with urllib.request.urlopen(url, timeout=timeout) as r:
        return r.status, r.headers.get_content_type(), r.read()


def _post(url, obj, timeout=600):
    req = urllib.request.Request(url, data=json.dumps(obj).encode(),
                                 method="POST")
    try:
        with urllib.request.urlopen(req, timeout=timeout) as r:
            return r.status, r.headers.get_content_type(), r.read()
    except urllib.error.HTTPError as e:
        return e.code, e.headers.get_content_type(), e.read()


def test_serve_render_end_to_end(tmp_path):
    from tests.helpers_scene import make_synthetic_scene

    import jax

    from nsff_pl_tpu.config import NSFFConfig
    from nsff_pl_tpu.training import checkpoint as ckpt_lib
    from nsff_pl_tpu.training.trainer import build_params

    scene = str(tmp_path / "scene")
    make_synthetic_scene(scene, W=32, H=24, N=3)

    # a bare-params checkpoint (the eval.py load_params fallback path) —
    # no training needed to exercise the serving surface
    cfg = NSFFConfig(root_dir=scene, img_wh=(32, 24), start_end=(0, 3),
                     N_samples=8, encode_t=True, N_tau=8)
    params = build_params(cfg, jax.random.PRNGKey(0))
    ckpt = str(tmp_path / "ckpt" / "step_1")
    ckpt_lib.save_checkpoint(str(tmp_path / "ckpt"), 1, {"params": params})

    port = 8900 + os.getpid() % 100
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    proc = subprocess.Popen(
        [sys.executable, os.path.join(REPO, "tools", "serve_render.py"),
         "--root_dir", scene, "--ckpt_path", ckpt,
         "--img_wh", "32", "24", "--start_end", "0", "3",
         "--encode_t", "--N_tau", "8", "--N_samples", "8",
         "--port", str(port)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True)
    base = f"http://127.0.0.1:{port}"
    try:
        # wait through the warmup compile
        deadline = time.time() + 600
        while True:
            try:
                status, _, body = _get(base + "/health", timeout=10)
                break
            except Exception:
                if proc.poll() is not None:
                    pytest.fail("server died:\n" + proc.stdout.read())
                if time.time() > deadline:
                    pytest.fail("server did not come up")
                time.sleep(5)
        assert status == 200 and json.loads(body)["status"] == "ok"

        status, _, body = _get(base + "/meta")
        meta = json.loads(body)
        assert meta["n_frames"] == 3 and meta["img_wh"] == [32, 24]
        assert np.asarray(meta["K"]).shape == (3, 3)
        poses = np.asarray(meta["poses"])
        assert poses.shape == (3, 3, 4)

        # PNG render of a training pose
        status, ctype, body = _post(base + "/render", {"t": 1})
        assert status == 200 and ctype == "image/png", body[:200]
        assert body[:8] == b"\x89PNG\r\n\x1a\n"
        import imageio.v2 as imageio

        img = imageio.imread(io.BytesIO(body))
        assert img.shape == (24, 32, 3) and img.dtype == np.uint8

        # custom pose (json format), must differ from the t=1 pose render
        status, ctype, body = _post(
            base + "/render?format=json",
            {"t": 1, "c2w": (poses[1] + np.array([[0, 0, 0, 0.05]] * 3)
                             ).tolist()})
        assert status == 200 and ctype == "application/json"
        out = json.loads(body)
        rgb2 = np.asarray(out["rgb"], np.uint8)
        depth = np.asarray(out["depth"])
        assert rgb2.shape == (24, 32, 3) and depth.shape == (24, 32)
        assert np.isfinite(depth).all()
        assert not np.array_equal(rgb2, np.asarray(img))

        # errors surface as 400s, not crashes
        status, _, body = _post(base + "/render", {"t": 99})
        assert status == 400 and b"error" in body
    finally:
        proc.terminate()
        proc.wait(timeout=30)
