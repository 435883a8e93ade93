"""End-to-end training smoke test: the full NSFFSystem on a synthetic
scene must run, learn (PSNR improves on a learnable target), checkpoint,
and resume (SURVEY.md §4 'integration tests mirroring BASELINE configs')."""
import os

import numpy as np
import pytest

from tests.helpers_scene import make_synthetic_scene


@pytest.fixture(scope="module")
def scene(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("scene"))
    make_synthetic_scene(root, W=32, H=24, N=3, seed=0)
    # overwrite images with a smooth learnable target (vertical gradient)
    from PIL import Image

    H, W = 24, 32
    grad = np.linspace(0, 255, H)[:, None, None]
    img = np.broadcast_to(grad, (H, W, 3)).astype(np.uint8)
    for i in range(3):
        Image.fromarray(img).save(f"{root}/images/{i:05d}.png")
    return root


def _cfg(scene, tmp, **kw):
    from nsff_pl_tpu.config import NSFFConfig

    base = dict(root_dir=scene, img_wh=(32, 24), start_end=(0, 3),
                N_samples=8, batch_size=64, num_epochs=25, lr=5e-3,
                lr_scheduler="const", exp_name="e2e",
                log_dir=os.path.join(tmp, "logs"),
                ckpt_dir=os.path.join(tmp, "ckpts"))
    base.update(kw)
    return NSFFConfig(**base)


def test_static_training_learns(scene, tmp_path):
    from nsff_pl_tpu.training.trainer import NSFFSystem

    sys_ = NSFFSystem(_cfg(scene, str(tmp_path)))
    log0 = sys_.validate(0)
    sys_.fit(log_every=1000, progress=False)
    log1 = sys_.validate(99)
    # a constant-gradient image is trivially learnable: PSNR must improve
    assert log1["psnr"] > log0["psnr"] + 1.0
    # checkpoints written
    assert os.path.isdir(os.path.join(str(tmp_path), "ckpts", "e2e"))


def test_full_nsff_training_runs(scene, tmp_path):
    from nsff_pl_tpu.training.trainer import NSFFSystem

    cfg = _cfg(scene, str(tmp_path), encode_t=True, use_viewdir=True,
               num_epochs=1, exp_name="e2e_full")
    sys_ = NSFFSystem(cfg)
    state = sys_.fit(log_every=1000, progress=False)
    assert int(state.step) == sys_.steps_per_epoch
    # resume continues from the checkpoint
    cfg2 = cfg.replace(num_epochs=2,
                       ckpt_path=os.path.join(str(tmp_path), "ckpts",
                                              "e2e_full",
                                              f"step_{int(state.step)}"))
    sys2 = NSFFSystem(cfg2)
    assert int(sys2.state.step) == sys_.steps_per_epoch
    state2 = sys2.fit(log_every=1000, progress=False)
    assert int(state2.step) == 2 * sys_.steps_per_epoch


def test_val_every_steps_cadence(scene, tmp_path, monkeypatch):
    """--val_every_steps N validates every N steps instead of per epoch
    (config.py val_every_steps)."""
    from nsff_pl_tpu.training.trainer import NSFFSystem

    cfg = _cfg(scene, str(tmp_path), num_epochs=2, val_every_steps=5,
               exp_name="e2e_ves")
    sys_ = NSFFSystem(cfg)
    calls = []
    monkeypatch.setattr(sys_, "validate", lambda epoch: calls.append(epoch))
    sys_.fit(log_every=1000, progress=False)
    # 2 epochs x steps_per_epoch steps; one validation per 5 steps
    total = 2 * sys_.steps_per_epoch
    assert len(calls) == total // 5


def test_full_nsff_soak_psnr_floor(scene, tmp_path):
    """Soak regression harness (round-1 verdict #6b, tightened per
    round-2 verdict #9): the FULL NSFF config — transient branch, fw/bw
    flow, all 8 loss terms with their schedules — trains 30 epochs on the
    learnable synthetic scene with the DEFAULT seed (42: training is
    fully deterministic given the seed) and must land within a band of
    the committed calibration value, so a subtle single-loss-term
    regression costing ~2 dB cannot slip under a loose absolute floor.

    Calibration: 19.20 dB on CPU/XLA at commit time (seed 43 lands
    20.04 — the band is wider than cross-seed spread to absorb legit
    XLA-version float drift). If this fails after an intentional
    numerics change or an XLA upgrade, re-measure and update
    CALIBRATED_PSNR, noting the cause in the commit."""
    from nsff_pl_tpu.training.trainer import NSFFSystem

    CALIBRATED_PSNR = 19.20
    BAND = 1.25

    cfg = _cfg(scene, str(tmp_path), encode_t=True, use_viewdir=True,
               N_tau=8, num_epochs=30, lr_scheduler="cosine",
               exp_name="e2e_soak", val_every_steps=10 ** 9)
    sys_ = NSFFSystem(cfg)
    sys_.fit(log_every=1000, progress=False)
    log = sys_.validate(30)
    assert abs(log["psnr"] - CALIBRATED_PSNR) < BAND, (
        f"soak PSNR {log['psnr']:.2f} dB left the calibrated band "
        f"{CALIBRATED_PSNR}±{BAND} dB — a loss-term/renderer regression, "
        f"or recalibrate if numerics changed intentionally")


def test_trainer_with_mesh(scene, tmp_path):
    """Trainer-level multichip integration: NSFFSystem with a 2-device
    mesh (the --num_gpus path in train.py) must train, validate and
    checkpoint — covers the mesh plumbing above the step-level sharding
    tests."""
    from nsff_pl_tpu.parallel import make_mesh
    from nsff_pl_tpu.training.trainer import NSFFSystem

    cfg = _cfg(scene, str(tmp_path), encode_t=True, num_epochs=1, N_tau=8,
               exp_name="e2e_mesh")
    sys_ = NSFFSystem(cfg, mesh=make_mesh(2))
    sys_.fit(log_every=1000, progress=False)
    assert int(sys_.state.step) == sys_.steps_per_epoch
    import numpy as np

    w = np.asarray(sys_.state.params["nerf_fine"]["static_xyz_0"]["w"])
    assert np.isfinite(w).all()


def test_hard_sampling_weight_refresh(scene, tmp_path):
    """--hard_sampling end-to-end: the training-render buffer feeds the
    per-epoch SSIM weight refresh (train.py:246-257 semantics) so the
    sampling distribution moves away from uniform."""
    import numpy as np

    from nsff_pl_tpu.training.trainer import NSFFSystem

    cfg = _cfg(scene, str(tmp_path), num_epochs=2, hard_sampling=True,
               exp_name="e2e_hard")
    sys_ = NSFFSystem(cfg)
    w0 = np.asarray(sys_.batcher.weights).copy()
    sys_.fit(log_every=1000, progress=False)
    w1 = np.asarray(sys_.batcher.weights)
    assert w1.shape == w0.shape
    assert not np.allclose(w0, w1), "sampling weights never refreshed"
    assert np.isfinite(w1).all() and (w1 >= 0).all()


def test_maximal_config_trains(scene, tmp_path):
    """The maximal model configuration — coarse-to-fine (N_importance>0,
    exercising both PDF resamplings and the rgb/depth_coarse loss terms),
    appearance embedding (encode_a) AND transient+flow — must train a
    full epoch and validate finite."""
    import numpy as np

    from nsff_pl_tpu.training.trainer import NSFFSystem

    cfg = _cfg(scene, str(tmp_path), encode_t=True, encode_a=True,
               use_viewdir=True, N_importance=4, N_tau=8, N_a=8,
               num_epochs=1, exp_name="e2e_max")
    sys_ = NSFFSystem(cfg)
    assert "nerf_coarse" in sys_.state.params
    assert "embedding_a" in sys_.state.params
    sys_.fit(log_every=1000, progress=False)
    log = sys_.validate(1)
    assert np.isfinite(log["psnr"])


def test_trainer_scan_steps(scene, tmp_path):
    """scan_steps > 1 (grouped lax.scan dispatch): the trainer must run
    full + remainder groups, respect epoch/validation boundaries, log
    every step's metrics, and maintain the hard-sampling buffer. With
    32x24 x 3 frames at batch 64 there are 36 steps/epoch; scan_steps=8
    leaves a 4-step remainder at each epoch end, exercising the clipped
    single-step path too."""
    import json

    from nsff_pl_tpu.training.trainer import NSFFSystem

    cfg = _cfg(scene, str(tmp_path), encode_t=True, use_viewdir=True,
               num_epochs=2, exp_name="e2e_scan", scan_steps=8,
               hard_sampling=True)
    sys_ = NSFFSystem(cfg)
    assert sys_.steps_per_epoch % cfg.scan_steps != 0  # remainder exists
    state = sys_.fit(log_every=10, progress=False)
    assert int(state.step) == 2 * sys_.steps_per_epoch
    # every step's train metrics were logged exactly once
    steps = set()
    with open(os.path.join(str(tmp_path), "logs", "e2e_scan",
                           "metrics.jsonl")) as f:
        for line in f:
            row = json.loads(line)
            if "train/loss" in row:
                assert row["step"] not in steps
                steps.add(row["step"])
    assert steps == set(range(2 * sys_.steps_per_epoch))
    # hard-sampling buffer received writes
    assert float(np.abs(np.asarray(sys_.tmp_rgb)).sum()) > 0


def test_trainer_tb_cadence(scene, tmp_path):
    """TensorBoard gets ONE point per log_every window at the window's
    last step — the reference's Lightning log_every_n_steps behavior
    (train.py:282) — even though the metric fetch is amortized over
    several scan groups (fetch_every = max(log_every, 8*scan_steps)),
    and the lr taxonomy point lands at the same steps (train.py:193)."""
    from nsff_pl_tpu.training.trainer import NSFFSystem

    # steps_per_epoch is 2 here (W*H*N//1000); 12 epochs = 24 steps with
    # scan_steps=2 -> scan-path groups, fetch windows of 16 steps
    cfg = _cfg(scene, str(tmp_path), encode_t=True, num_epochs=12,
               exp_name="e2e_tb", scan_steps=2)
    sys_ = NSFFSystem(cfg)
    assert sys_.steps_per_epoch == 2
    recorded = []
    orig = sys_.logger.scalar
    sys_.logger.scalar = (
        lambda tag, v, step, jsonl=True: (recorded.append((tag, step)),
                                          orig(tag, v, step, jsonl))[1])
    sys_.fit(log_every=5, progress=False)
    want = list(range(4, 24, 5))  # window-final steps 4, 9, 14, 19
    got_loss = [s for t, s in recorded if t == "train/loss"]
    got_lr = [s for t, s in recorded if t == "lr"]
    assert got_loss == want
    assert got_lr == want
    # the JSONL fallback still records EVERY step
    import json as _json
    sys_.logger.flush()
    rows = [_json.loads(l) for l in open(sys_.logger.jsonl.name)]
    steps = sorted(r["step"] for r in rows if "train/loss" in r)
    assert steps == list(range(24))


def test_time_budget_clean_exit_and_resume(scene, tmp_path):
    """--time_budget_s: fit() checkpoints and returns at the first group
    boundary past the budget (clean time-boxed exit), and the run resumes
    from that checkpoint to completion (config.py time_budget_s)."""
    import glob

    from nsff_pl_tpu.training.trainer import NSFFSystem

    cfg = _cfg(scene, str(tmp_path), encode_t=True, num_epochs=25,
               exp_name="e2e_budget", time_budget_s=1e-6)
    sys_ = NSFFSystem(cfg)
    state = sys_.fit(log_every=1000, progress=False)
    stopped = int(state.step)
    assert 0 < stopped < sys_.total_steps  # stopped early, not at the end
    ckpts = glob.glob(os.path.join(str(tmp_path), "ckpts", "e2e_budget",
                                   "step_*"))
    assert any(p.endswith(f"step_{stopped}") for p in ckpts)
    # resume (budget off) runs to completion from where it stopped
    cfg2 = cfg.replace(time_budget_s=0.0,
                       ckpt_path=os.path.join(str(tmp_path), "ckpts",
                                              "e2e_budget",
                                              f"step_{stopped}"))
    sys2 = NSFFSystem(cfg2)
    assert int(sys2.state.step) == stopped
    state2 = sys2.fit(log_every=1000, progress=False)
    assert int(state2.step) == sys2.total_steps
