"""train.py CLI integration: the full command-line surface end-to-end on
a synthetic scene (flags -> config -> trainer -> checkpoint + logs), the
counterpart of tests/test_eval_cli.py for the training entry point
(reference `train.py:277-319`)."""
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_train_cli_end_to_end(tmp_path, capsys):
    from tests.helpers_scene import make_synthetic_scene

    import train as train_cli
    from nsff_pl_tpu.config import get_opts

    scene = str(tmp_path / "scene")
    make_synthetic_scene(scene, W=32, H=24, N=3)
    cwd = os.getcwd()
    os.chdir(str(tmp_path))
    try:
        cfg = get_opts([
            "--root_dir", scene, "--img_wh", "32", "24",
            "--start_end", "0", "3", "--encode_t", "--N_tau", "8",
            "--N_samples", "8", "--batch_size", "32", "--num_epochs", "1",
            "--lr", "5e-4", "--lr_scheduler", "cosine",
            "--exp_name", "clirun", "--scan_steps", "2",
            "--jax_cache_dir", str(tmp_path / "xla_cache")])
        train_cli.main(cfg)
    finally:
        os.chdir(cwd)

    out = capsys.readouterr().out
    assert "steps/epoch" in out and "val/psnr" in out
    # checkpoint + config echo written (trainer.save)
    ckpt_root = tmp_path / "ckpts" / "clirun"
    assert (ckpt_root / "config.json").exists()
    steps = [d for d in os.listdir(ckpt_root) if d.startswith("step_")]
    assert steps, os.listdir(ckpt_root)
    # logs written (TB or JSONL fallback)
    assert (tmp_path / "logs" / "clirun").exists()
    # the cache flag threads through (utils/jaxcache.py)
    assert (tmp_path / "xla_cache").is_dir()
    import jax

    jax.config.update("jax_compilation_cache_dir", None)
