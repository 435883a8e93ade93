"""CLI-surface parity tests: every reference flag must parse with the
reference's default (`opt.py:3-114`, `eval.py:24-78`)."""
import argparse
import os

import pytest

from nsff_pl_tpu.config import NSFFConfig, add_train_args, config_from_args

# (flag, reference default) from the reference opt.py
REFERENCE_TRAIN_FLAGS = {
    "--cache_dir": "",
    "--dataset_name": "monocular",
    "--img_wh": [512, 288],
    "--start_end": [0, 100],
    "--use_viewdir": False,
    "--N_samples": 128,
    "--N_importance": 0,
    "--N_emb_xyz": 10,
    "--S_emb_xyz": 9.0,
    "--N_emb_dir": 4,
    "--S_emb_dir": 3.0,
    "--perturb": 1.0,
    "--noise_std": 1.0,
    "--encode_a": False,
    "--N_a": 48,
    "--encode_t": False,
    "--N_tau": 48,
    "--lambda_geo_init": 0.04,
    "--thickness": 1,
    "--flow_scale": 0.2,
    "--batch_size": 512,
    "--chunk": 32 * 1024,
    "--num_epochs": 16,
    "--hard_sampling": False,
    "--num_gpus": 1,
    "--num_nodes": 1,
    "--ckpt_path": None,
    "--prefixes_to_ignore": ["loss"],
    "--weight_path": None,
    "--optimizer": "adam",
    "--lr": 5e-4,
    "--topk": 1.0,
    "--momentum": 0.9,
    "--weight_decay": 0.0,
    "--lr_scheduler": "steplr",
    "--warmup_multiplier": 1.0,
    "--warmup_epochs": 0,
    "--decay_step": [20],
    "--decay_gamma": 0.1,
    "--poly_exp": 0.9,
    "--exp_name": "exp",
    "--refresh_every": 1,
    "--debug": False,
}


def _parse(argv):
    parser = argparse.ArgumentParser()
    add_train_args(parser)
    return parser.parse_args(argv)


def test_all_reference_flags_accepted_with_matching_defaults():
    args = _parse(["--root_dir", "/x"])
    for flag, default in REFERENCE_TRAIN_FLAGS.items():
        name = flag.lstrip("-")
        assert hasattr(args, name), f"missing flag {flag}"
        got = getattr(args, name)
        assert got == default, f"{flag}: default {got!r} != reference {default!r}"


def test_boolean_flags_are_store_true():
    args = _parse(["--root_dir", "/x", "--encode_t", "--encode_a",
                   "--use_viewdir", "--hard_sampling", "--debug"])
    assert args.encode_t and args.encode_a and args.use_viewdir
    assert args.hard_sampling and args.debug


def test_config_from_args_types():
    cfg = config_from_args(_parse(
        ["--root_dir", "/x", "--img_wh", "64", "48",
         "--start_end", "0", "5", "--decay_step", "10", "20"]))
    assert cfg.img_wh == (64, 48)
    assert cfg.start_end == (0, 5)
    assert cfg.decay_step == [10, 20]
    assert cfg.N_frames == 5
    assert cfg.in_channels_xyz == 63
    assert cfg.in_channels_dir == 27


def test_output_transient_follows_encode_t():
    assert NSFFConfig(encode_t=True).output_transient_flow == \
        ["fw", "bw", "disocc"]
    assert NSFFConfig(encode_t=False).output_transient_flow == []


def test_eval_cli_flags():
    import eval as eval_cli

    args = eval_cli.get_opts(
        ["--root_dir", "/x", "--ckpt_path", "/c", "--split",
         "test_fixview2_interp4", "--video_format", "gif", "--fps", "5",
         "--save_depth", "--output_transient"])
    assert args.split == "test_fixview2_interp4"
    assert args.fps == 5 and args.save_depth and args.output_transient
    # reference defaults (eval.py:24-78)
    d = eval_cli.get_opts(["--root_dir", "/x", "--ckpt_path", "/c"])
    assert d.N_samples == 128 and d.chunk == 32 * 1024
    assert d.video_format == "mp4" and d.fps == 10
    assert d.scene_name == "test" and d.depth_format == "png"


def test_preprocess_cli_flags():
    import preprocess

    args = preprocess.get_opts(["--root_dir", "/x", "--stages", "resize"])
    assert args.stages == ["resize"]
    assert args.max_w == 1280 and args.max_h == 720  # preprocess.py:27


def test_preprocess_resize_stage(tmp_path):
    """The resize stage runs for real (cv2 is in the image): frames
    capped at max_w x max_h with INTER_AREA, idempotent on re-run
    (`preprocess.py:27-52` behavior)."""
    import numpy as np
    from PIL import Image

    import preprocess

    root = str(tmp_path)
    os.makedirs(os.path.join(root, "frames"))
    big = (np.random.RandomState(0).rand(90, 160, 3) * 255).astype(np.uint8)
    for i in range(3):
        Image.fromarray(big).save(os.path.join(root, "frames",
                                               f"{i:05d}.png"))
    preprocess.resize_frames(root, max_w=80, max_h=45)
    out = sorted(os.listdir(os.path.join(root, "frames_resized")))
    assert len(out) == 3
    img = np.asarray(Image.open(
        os.path.join(root, "frames_resized", out[0])))
    assert img.shape[:2] == (45, 80)
    # idempotent: second run skips (no error, content unchanged)
    preprocess.resize_frames(root, max_w=80, max_h=45)


def test_masks_trivial_fallback(tmp_path):
    """scene.masks degrades: predict_masks raises a clear error without
    detectron2; trivial_masks writes all-static masks with the
    reference's .png.png naming (predict_mask.py:64)."""
    import numpy as np
    import pytest
    from PIL import Image

    from nsff_pl_tpu.scene import masks as masks_mod

    root = str(tmp_path)
    os.makedirs(os.path.join(root, "images"))
    img = (np.random.RandomState(0).rand(12, 16, 3) * 255).astype(np.uint8)
    for i in range(2):
        Image.fromarray(img).save(os.path.join(root, "images",
                                               f"{i:05d}.png"))
    try:
        import detectron2  # noqa: F401
        has_d2 = True
    except Exception:
        has_d2 = False
    if not has_d2:
        with pytest.raises(RuntimeError, match="detectron2"):
            masks_mod.predict_masks(root)
    n = masks_mod.trivial_masks(root)
    assert n == 2
    m = np.asarray(Image.open(os.path.join(root, "masks",
                                           "00000.png.png")))
    assert m.shape == (12, 16) and (m > 0).all()  # all static


def test_jax_cache_dir_populates(tmp_path):
    """--jax_cache_dir enables the persistent XLA compilation cache
    (utils/jaxcache.py): after a jitted program runs, the dir holds
    content-addressed executables that later processes load instead of
    recompiling."""
    import jax
    import jax.numpy as jnp

    from nsff_pl_tpu.utils.jaxcache import enable_compilation_cache

    cache = tmp_path / "xla_cache"
    enable_compilation_cache(str(cache))
    try:
        # unique shape so the entry is new even if other tests compiled
        x = jnp.ones((137, 61))
        float(jax.jit(lambda a: jnp.tanh(a @ a.T).sum())(x))
        assert cache.is_dir()
        assert jax.config.jax_compilation_cache_dir == str(cache)
        # min_compile_time_secs=0: even tiny programs get cached
        assert any(cache.iterdir())
    finally:
        jax.config.update("jax_compilation_cache_dir", None)

    # '' is a documented no-op (default)
    enable_compilation_cache("")
    assert jax.config.jax_compilation_cache_dir is None
