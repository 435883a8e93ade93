"""eval.py CLI integration: render the test split and the space-time
interpolation split end-to-end on a synthetic scene (`eval.py:121-261`
behaviors: PNGs, video, metric tables)."""
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

    tmp = tmp_path_factory.mktemp("evalcli")
    scene = str(tmp / "scene")
    make_synthetic_scene(scene, W=32, H=24, N=3)
    cfg = NSFFConfig(root_dir=scene, img_wh=(32, 24), start_end=(0, 3),
                     N_samples=8, batch_size=32, num_epochs=1,
                     encode_t=True, N_tau=8, lr_scheduler="const",
                     exp_name="evalcli", log_dir=str(tmp / "logs"),
                     ckpt_dir=str(tmp / "ckpts"))
    sys_ = NSFFSystem(cfg)
    sys_.fit(log_every=1000, progress=False)
    ckpt = os.path.join(str(tmp / "ckpts"), "evalcli",
                        f"step_{int(sys_.state.step)}")
    return scene, ckpt, str(tmp)


def _run_eval(scene, ckpt, outdir, split, scene_name, extra=()):
    import eval as eval_cli

    argv = ["--root_dir", scene, "--ckpt_path", ckpt, "--img_wh", "32",
            "24", "--start_end", "0", "3", "--N_samples", "8",
            "--encode_t", "--N_tau", "8", "--split", split,
            "--scene_name", scene_name, "--video_format", "gif",
            "--chunk", "1024", *extra]
    cwd = os.getcwd()
    os.chdir(outdir)
    try:
        eval_cli.main(eval_cli.get_opts(argv))
    finally:
        os.chdir(cwd)
    return os.path.join(outdir, "results", "monocular", scene_name)


def test_eval_test_split(trained, capsys):
    scene, ckpt, tmp = trained
    out = _run_eval(scene, ckpt, tmp, "test", "t1", ("--save_depth",))
    for f in ("000.png", "002.png", "depth_000.png", "t1.gif",
              "psnr.npy", "ssim.npy", "lpips.npy"):
        assert os.path.exists(os.path.join(out, f)), f
    psnr = np.load(os.path.join(out, "psnr.npy"))
    assert psnr.shape == (3, 2)
    assert np.isfinite(psnr[:, 0]).all() and (psnr[:, 0] > 5).all()
    # LPIPS degrades gracefully without offline weights: an explicit
    # notice + 'n/a' in the table, never a bare nan (`metrics.py:35-49`)
    from nsff_pl_tpu.training import metrics as metrics_lib

    if metrics_lib.get_lpips_model() is None:
        stdout = capsys.readouterr().out
        assert "LPIPS unavailable" in stdout
        assert "n/a" in stdout
        assert "LPIPS \t nan" not in stdout


def test_eval_interp_split(trained):
    scene, ckpt, tmp = trained
    out = _run_eval(scene, ckpt, tmp, "test_fixview1_interp2", "t2")
    # dt = 0 and 0.5 per step (eval.py:206-216), last frame reuses t+1
    for f in ("000_000.png", "000_050.png", "001_000.png", "002_000.png",
              "t2.gif"):
        assert os.path.exists(os.path.join(out, f)), f


def test_eval_spiral_split(trained):
    """test_spiral renders 6*N_frames spiral poses with advancing time
    (monocular.py:199-204 semantics) and writes frames + video."""
    scene, ckpt, tmp = trained
    out = _run_eval(scene, ckpt, tmp, "test_spiral", "t3")
    for f in ("000.png", "017.png", "t3.gif"):
        assert os.path.exists(os.path.join(out, f)), f
    import numpy as np
    from PIL import Image

    img = np.asarray(Image.open(os.path.join(out, "000.png")))
    assert img.shape == (24, 32, 3) and img.dtype == np.uint8


def test_eval_spiral_fix_view_dir(trained, capsys):
    """--fix_view_dir embeds every spiral frame with pose-0 ray directions
    (the reference's commented-out intent, `eval.py:192-193`; opt-in)."""
    scene, ckpt, tmp = trained
    out = _run_eval(scene, ckpt, tmp, "test_spiral", "t4",
                    ("--fix_view_dir",))
    assert "fix_view_dir" in capsys.readouterr().out
    for f in ("000.png", "t4.gif"):
        assert os.path.exists(os.path.join(out, f)), f


def test_eval_dtype_flag(trained):
    """--dtype bfloat16 renders through the low-precision compute path
    (the TPU-recipe eval; the reference evaluates f32-only) and lands
    within bf16 resolution of the f32 metrics."""
    scene, ckpt, tmp = trained
    out32 = _run_eval(scene, ckpt, tmp, "test", "tdt32")
    out16 = _run_eval(scene, ckpt, tmp, "test", "tdt16",
                      ("--dtype", "bfloat16"))
    p32 = np.load(os.path.join(out32, "psnr.npy"))[:, 0]
    p16 = np.load(os.path.join(out16, "psnr.npy"))[:, 0]
    assert np.isfinite(p16).all()
    assert np.max(np.abs(p32 - p16)) < 0.5  # bf16 rounding only
