"""AOT serving export (`tools/export_render.py`): a trained checkpoint
becomes a self-contained StableHLO artifact that deserializes and renders
with only `jax` — no framework code — matching the live renderer."""
import json
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    from tests.helpers_scene import make_synthetic_scene
    from nsff_pl_tpu.config import NSFFConfig
    from nsff_pl_tpu.training.trainer import NSFFSystem

    tmp = tmp_path_factory.mktemp("export")
    scene = str(tmp / "scene")
    make_synthetic_scene(scene, W=32, H=24, N=3)
    cfg = NSFFConfig(root_dir=scene, img_wh=(32, 24), start_end=(0, 3),
                     N_samples=8, batch_size=32, num_epochs=1,
                     encode_t=True, N_tau=8, lr_scheduler="const",
                     exp_name="export", log_dir=str(tmp / "logs"),
                     ckpt_dir=str(tmp / "ckpts"))
    sys_ = NSFFSystem(cfg)
    sys_.fit(log_every=1000, progress=False)
    ckpt = os.path.join(str(tmp / "ckpts"), "export",
                        f"step_{int(sys_.state.step)}")
    return ckpt, str(tmp)


def test_export_roundtrip(trained):
    from tools import export_render

    ckpt, tmp = trained
    out = os.path.join(tmp, "render.nsffx")
    args = export_render.get_opts([
        "--ckpt_path", ckpt, "--out", out, "--chunk", "64",
        "--img_wh", "32", "24", "--N_samples", "8", "--encode_t",
        "--N_tau", "8", "--N_frames", "3", "--check"])
    export_render.main(args)  # --check asserts artifact == live renderer

    assert os.path.exists(out)
    meta = json.load(open(out + ".json"))
    assert meta["inputs"]["rays"] == [64, 6]
    assert meta["outputs"] == ["rgb_fine", "depth_fine"]

    # the serving side: deserialize with ONLY jax and render a batch
    import jax
    import jax.numpy as jnp
    from jax import export as jexport

    rt = jexport.deserialize(open(out, "rb").read())
    key = jax.random.PRNGKey(3)
    rays = jnp.concatenate([
        (jax.random.uniform(key, (64, 3)) - 0.5).at[:, 2].set(-1.0),
        (jax.random.uniform(jax.random.PRNGKey(4), (64, 3)) * 0.1)
        .at[:, 2].set(2.0)], -1)
    ts = jnp.ones((64,), jnp.int32)
    rgb, depth = rt.call(rays, ts)
    assert rgb.shape == (64, 3) and depth.shape == (64,)
    assert np.isfinite(np.asarray(rgb)).all()
    assert (np.asarray(rgb) >= -1e-5).all() and (np.asarray(rgb) <= 1 + 1e-5).all()


def test_export_multi_platform(trained):
    """--platforms cpu tpu cross-lowers one artifact servable on both
    (exported here on the CPU host, still callable on CPU)."""
    from tools import export_render

    ckpt, tmp = trained
    out = os.path.join(tmp, "render_xplat.nsffx")
    export_render.main(export_render.get_opts([
        "--ckpt_path", ckpt, "--out", out, "--chunk", "32",
        "--img_wh", "32", "24", "--N_samples", "8", "--encode_t",
        "--N_tau", "8", "--N_frames", "3",
        "--platforms", "cpu", "tpu"]))
    meta = json.load(open(out + ".json"))
    assert set(meta["platforms"]) == {"cpu", "tpu"}

    import jax
    import jax.numpy as jnp
    from jax import export as jexport

    rt = jexport.deserialize(open(out, "rb").read())
    rgb, depth = rt.call(jnp.zeros((32, 6)).at[:, 2].set(-1.0)
                         .at[:, 5].set(2.0),
                         jnp.zeros((32,), jnp.int32))
    assert rgb.shape == (32, 3)
    assert np.isfinite(np.asarray(rgb)).all()
