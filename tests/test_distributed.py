"""Multi-process (multi-node) training: the `--num_nodes` path
(`parallel/distributed.py`) — the TPU-native equivalent of the reference's
Lightning multi-node DDP (`train.py:294-301`, flags `opt.py:63-66`).

Spawns REAL separate OS processes connected with `jax.distributed` (gloo
CPU collectives, 2 processes x 2 virtual devices) and asserts the
training trajectory equals a single-process run over the same 4-device
global mesh: the SPMD program is identical, only the process partitioning
of the mesh differs, so losses must match to float tolerance.
"""
import json
import os
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TRAIN_FLAGS = [
    "--img_wh", "32", "24", "--start_end", "0", "3",
    "--encode_t", "--N_tau", "8", "--N_samples", "8",
    "--batch_size", "32", "--num_epochs", "1",
    "--lr", "5e-4", "--lr_scheduler", "cosine",
    # maximal machinery: K-step scan dispatch + hard-example mining
    # (tmp_rgb buffer threading + Gumbel sampling + SSIM weight refresh)
    # all must behave identically under the multi-process mesh
    "--scan_steps", "2", "--hard_sampling",
]


def _env(n_devices: int) -> dict:
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)  # no TPU tunnel in subprocesses
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={n_devices}"
    # append (never override: the axon sitecustomize lives on PYTHONPATH)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    return env


def _train_cmd(scene: str, exp: str, extra) -> list:
    return ([sys.executable, os.path.join(REPO, "train.py"),
             "--root_dir", scene, "--exp_name", exp]
            + TRAIN_FLAGS + list(extra))


def _losses(workdir, exp):
    path = os.path.join(workdir, "logs", exp, "metrics.jsonl")
    with open(path) as f:
        rows = [json.loads(line) for line in f]
    return [(r["step"], r["train/loss"]) for r in rows if "train/loss" in r]


def _run_pair(tmp_path, extra_flags, port_offset=0):
    """One single-process 4-device run + one 2-process x 2-device run of
    the same training command; returns (sp_losses, mp_losses, mp_outs,
    mp_dir)."""
    from tests.helpers_scene import make_synthetic_scene

    scene = str(tmp_path / "scene")
    make_synthetic_scene(scene, W=32, H=24, N=3)

    # reference run: ONE process over a 4-device mesh
    single_dir = tmp_path / "single"
    single_dir.mkdir()
    out = subprocess.run(
        _train_cmd(scene, "sp", ["--num_gpus", "4"] + extra_flags),
        cwd=str(single_dir), env=_env(4), capture_output=True, text=True,
        timeout=900)
    assert out.returncode == 0, out.stdout + out.stderr

    # the same global mesh partitioned over 2 processes x 2 devices
    mp_dir = tmp_path / "mp"
    mp_dir.mkdir()
    port = 29800 + (os.getpid() + port_offset) % 100
    dist_flags = ["--num_gpus", "2", "--num_nodes", "2",
                  "--coordinator_address", f"localhost:{port}"]
    procs = [subprocess.Popen(
        _train_cmd(scene, "mp",
                   dist_flags + ["--node_rank", str(r)] + extra_flags),
        cwd=str(mp_dir), env=_env(2), stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT, text=True) for r in range(2)]
    outs = [p.communicate(timeout=900)[0] for p in procs]
    assert all(p.returncode == 0 for p in procs), "\n---\n".join(outs)

    sp = _losses(str(single_dir), "sp")
    mp = _losses(str(mp_dir), "mp")
    return sp, mp, outs, mp_dir


def test_multiprocess_training_matches_single_process(tmp_path):
    sp, mp, outs, mp_dir = _run_pair(tmp_path, [])
    scene = str(tmp_path / "scene")

    # identical SPMD program -> identical per-step losses
    assert len(sp) == len(mp) > 0
    np.testing.assert_allclose([v for _, v in mp], [v for _, v in sp],
                               rtol=1e-5, atol=1e-6)

    # process 0 owns the side effects: checkpoints + config echo written
    # once, progress prints only on rank 0
    ckpt_root = mp_dir / "ckpts" / "mp"
    assert (ckpt_root / "config.json").exists()
    assert any(d.startswith("step_") for d in os.listdir(ckpt_root))
    assert "steps/epoch" in outs[0] and "val/psnr" in outs[0]
    assert "steps/epoch" not in outs[1] and "val/psnr" not in outs[1]

    # the multi-process checkpoint restores in a plain single-process
    # system (resume-on-one-node after a multi-node run)
    step_dir = sorted(d for d in os.listdir(ckpt_root)
                      if d.startswith("step_"))[-1]
    code = (
        "from nsff_pl_tpu.config import get_opts\n"
        "from nsff_pl_tpu.training.trainer import NSFFSystem\n"
        f"cfg = get_opts({_train_cmd(scene, 'restore', [])[2:]!r}"
        f" + ['--ckpt_path', {str(ckpt_root / step_dir)!r}])\n"
        "s = NSFFSystem(cfg)\n"
        "assert int(s.state.step) > 0, int(s.state.step)\n"
        "print('restored at step', int(s.state.step))\n")
    out = subprocess.run([sys.executable, "-c", code], cwd=str(mp_dir),
                         env=_env(1), capture_output=True, text=True,
                         timeout=600)
    assert out.returncode == 0, out.stdout + out.stderr
    assert "restored at step" in out.stdout


def test_multiprocess_keeps_pallas_kernel_path(tmp_path):
    """The shard_map'ed Pallas train kernels survive a MULTI-PROCESS mesh
    (interpret mode on CPU): forcing --train_backend pallas, the
    2-process run must match the single-process 4-device run step for
    step. (The single-process sharded-vs-unsharded kernel equivalence is
    tests/test_sharding.py; this pins the cross-process case.)"""
    sp, mp, _, _ = _run_pair(
        tmp_path, ["--train_backend", "pallas", "--fused_train", "off"],
        port_offset=17)
    assert len(sp) == len(mp) > 0
    # pallas dW accumulators are f32 but block partitioning changes the
    # reduction order slightly between mesh layouts; same tolerance as
    # tests/test_sharding.py
    np.testing.assert_allclose([v for _, v in mp], [v for _, v in sp],
                               rtol=2e-4, atol=2e-5)
