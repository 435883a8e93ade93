"""Metric golden tests + LR-schedule behavior (`metrics.py`,
`utils/__init__.py:59-76`)."""
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from nsff_pl_tpu.config import NSFFConfig
from nsff_pl_tpu.training import metrics as M
from nsff_pl_tpu.training.optim import EPS, make_lr_schedule


def test_psnr_golden():
    a = jnp.zeros((4, 4, 3))
    b = jnp.full((4, 4, 3), 0.1)
    np.testing.assert_allclose(float(M.psnr(a, b)), 20.0, rtol=1e-5)


def test_psnr_identical_is_inf():
    a = jnp.full((4, 4, 3), 0.5)
    assert float(M.psnr(a, a)) == np.inf


def test_psnr_masked():
    a = jnp.zeros((4, 4, 3))
    b = a.at[0, 0].set(1.0)
    m = jnp.zeros((4, 4), bool).at[3, 3].set(True)
    assert float(M.psnr(a, b, m)) == np.inf  # masked region is identical


def test_ssim_identity():
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(24, 32, 3).astype(np.float32))
    # reference formula: 1 - clamp((1-ssim)/2) == 1.0 for identical images
    np.testing.assert_allclose(float(M.ssim(img, img)), 1.0, atol=1e-5)


def test_ssim_decreases_with_noise():
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(24, 32, 3).astype(np.float32))
    noisy = img + jnp.asarray(rng.randn(24, 32, 3).astype(np.float32)) * 0.2
    assert float(M.ssim(img, noisy)) < float(M.ssim(img, img)) - 0.05


def test_ssim_no_cancellation_on_smooth_bright_content():
    """Regression for the round-4 TPU eval bug: sigma = E[x²] − μ² cancels
    catastrophically when μ² ≫ σ² (smooth bright renders), under-reporting
    SSIM by up to 0.14 at accelerator matmul precision. The shifted-variance
    formulation + explicit highest-precision filtering must agree with an
    f64 NumPy computation of the same kornia-semantics SSIM
    (`/root/reference/metrics.py:19-32`)."""
    rng = np.random.RandomState(7)
    # bright smooth base + micro-texture + tiny prediction error:
    # variance ~1e-6 sits ~19 bits below μ² ~0.81
    base = 0.9 + 1e-3 * rng.randn(48, 64, 3)
    pred = base + 2e-2 * rng.randn(48, 64, 3)
    got = float(M.ssim(jnp.asarray(base.astype(np.float32)),
                       jnp.asarray(pred.astype(np.float32))))

    # independent f64 reference of the same formula
    k = np.asarray(M._gaussian_kernel1d(11, 1.5), np.float64)

    def filt(img):
        p = 5
        x = np.pad(img, ((p, p), (0, 0), (0, 0)), mode="reflect")
        x = np.stack([np.apply_along_axis(
            lambda v: np.convolve(v, k, mode="valid"), 0, x[..., c])
            for c in range(3)], -1)
        x = np.pad(x, ((0, 0), (p, p), (0, 0)), mode="reflect")
        return np.stack([np.apply_along_axis(
            lambda v: np.convolve(v, k, mode="valid"), 1, x[..., c])
            for c in range(3)], -1)

    mx, my = filt(base), filt(pred)
    sx = filt(base * base) - mx * mx
    sy = filt(pred * pred) - my * my
    sxy = filt(base * pred) - mx * my
    c1, c2 = 0.01 ** 2, 0.03 ** 2
    smap = ((2 * mx * my + c1) * (2 * sxy + c2)
            / ((mx * mx + my * my + c1) * (sx + sy + c2)))
    want = float(np.mean(1.0 - np.clip((1.0 - smap) / 2.0, 0.0, 1.0)))
    assert abs(got - want) < 2e-3, (got, want)
    # and the case is a real discriminator: the images differ enough that
    # a cancellation-broken sigma path would sit far from the truth
    assert want < 0.98


def test_lpips_gated_returns_none():
    # lpips package absent in this image -> model None, metric None
    model = M.get_lpips_model()
    if model is None:
        assert M.lpips(None, np.zeros((8, 8, 3)), np.zeros((8, 8, 3))) is None


def _lr_at_epochs(cfg, epochs, steps_per_epoch=10):
    sched = make_lr_schedule(cfg, steps_per_epoch)
    return [float(sched(e * steps_per_epoch)) for e in epochs]


def test_steplr_schedule():
    cfg = NSFFConfig(lr=1.0, lr_scheduler="steplr", decay_step=[2, 4],
                     decay_gamma=0.1)
    lrs = _lr_at_epochs(cfg, [0, 1, 2, 3, 4, 5])
    np.testing.assert_allclose(lrs, [1, 1, 0.1, 0.1, 0.01, 0.01], rtol=1e-6)


def test_cosine_schedule():
    cfg = NSFFConfig(lr=1.0, lr_scheduler="cosine", num_epochs=10)
    lrs = _lr_at_epochs(cfg, [0, 5, 10])
    np.testing.assert_allclose(lrs[0], 1.0, rtol=1e-6)
    np.testing.assert_allclose(lrs[1], 0.5 + 0.5 * EPS, rtol=1e-4)
    np.testing.assert_allclose(lrs[2], EPS, atol=1e-7)


def test_poly_schedule():
    cfg = NSFFConfig(lr=1.0, lr_scheduler="poly", num_epochs=10, poly_exp=0.9)
    lrs = _lr_at_epochs(cfg, [0, 5])
    np.testing.assert_allclose(lrs[0], 1.0)
    np.testing.assert_allclose(lrs[1], 0.5 ** 0.9, rtol=1e-5)


def test_const_schedule():
    cfg = NSFFConfig(lr=0.3, lr_scheduler="const")
    assert _lr_at_epochs(cfg, [0, 7]) == [0.3, 0.3]


def test_warmup_ramp():
    cfg = NSFFConfig(lr=1.0, lr_scheduler="const", warmup_epochs=4,
                     warmup_multiplier=2.0)
    lrs = _lr_at_epochs(cfg, [0, 2, 4])
    np.testing.assert_allclose(lrs, [1.0, 1.5, 2.0], rtol=1e-6)
    # const keeps base_lr * multiplier after the ramp
    # (warmup_scheduler.py:30)
    np.testing.assert_allclose(_lr_at_epochs(cfg, [5, 9]), [2.0, 2.0],
                               rtol=1e-6)


def test_warmup_cosine_golden():
    """Golden sequence vs the reference GradualWarmupScheduler semantics
    (warmup_scheduler.py:23-32): ramp over epochs 0..T inclusive, then the
    after-scheduler with its OWN epoch counter from 0 and base_lr*mult."""
    cfg = NSFFConfig(lr=1.0, lr_scheduler="cosine", num_epochs=10,
                     warmup_epochs=2, warmup_multiplier=2.0)
    lrs = _lr_at_epochs(cfg, [0, 1, 2, 3, 4, 8])

    def cos_after(e):  # CosineAnnealingLR at epoch e with base 2.0
        return EPS + (2.0 - EPS) * 0.5 * (1 + np.cos(np.pi * e / 10))

    expected = [1.0, 1.5, 2.0, cos_after(0), cos_after(1), cos_after(5)]
    np.testing.assert_allclose(lrs, expected, rtol=1e-5)


def test_warmup_steplr_golden():
    """MultiStepLR milestones are counted in the after-scheduler's own
    epoch counter (which starts when the warmup hands off)."""
    cfg = NSFFConfig(lr=1.0, lr_scheduler="steplr", decay_step=[1, 3],
                     decay_gamma=0.1, warmup_epochs=2, warmup_multiplier=2.0)
    # e=3 -> after(0)=2.0; e=4 -> after(1)=0.2; e=6 -> after(3)=0.02
    np.testing.assert_allclose(_lr_at_epochs(cfg, [0, 1, 2, 3, 4, 6]),
                               [1.0, 1.5, 2.0, 2.0, 0.2, 0.02], rtol=1e-5)


def test_warmup_skipped_for_radam_ranger():
    """utils/__init__.py:72 — radam/ranger never get the warmup wrap."""
    for opt in ("radam", "ranger"):
        cfg = NSFFConfig(lr=1.0, optimizer=opt, lr_scheduler="const",
                         warmup_epochs=4, warmup_multiplier=2.0)
        assert _lr_at_epochs(cfg, [0, 2, 6]) == [1.0, 1.0, 1.0]


# ---------------------------------------------------------------------------
# optimizer coverage (`utils/__init__.py:24-57`)
# ---------------------------------------------------------------------------

OPTIMIZERS = ["sgd", "adam", "radam", "ranger"]
SCHEDULERS = ["const", "steplr", "cosine", "poly"]


@pytest.mark.parametrize("optimizer", OPTIMIZERS)
@pytest.mark.parametrize("scheduler", SCHEDULERS)
def test_optimizer_scheduler_matrix(optimizer, scheduler):
    """Every optimizer x scheduler combo must step without error and
    actually move the parameters (the round-1 ranger crash regression)."""
    from nsff_pl_tpu.training.optim import make_optimizer

    cfg = NSFFConfig(lr=1e-2, optimizer=optimizer, lr_scheduler=scheduler,
                     num_epochs=4, decay_step=[2], warmup_epochs=1,
                     warmup_multiplier=2.0)
    tx = make_optimizer(cfg, steps_per_epoch=2)
    params = {"w": jnp.ones((4, 3)), "b": jnp.zeros((3,))}
    state = tx.init(params)
    for _ in range(7):  # crosses the ranger sync_period=6 boundary
        grads = {"w": jnp.full((4, 3), 0.5), "b": jnp.full((3,), 0.5)}
        updates, state = tx.update(grads, state, params)
        params = optax.apply_updates(params, updates)
    assert all(np.isfinite(np.asarray(v)).all() for v in params.values())
    assert not np.allclose(np.asarray(params["w"]), 1.0)


def test_lookahead_golden_sequence():
    """Hand-computed Lookahead(k=2, alpha=0.5) over SGD(lr=1), grad=1:
    fast steps -1 each inner update; every 2nd step snaps to the slow
    weights slow += 0.5*(fast-slow)."""
    from nsff_pl_tpu.training.optim import lookahead

    tx = lookahead(optax.sgd(1.0), sync_period=2, slow_step_size=0.5)
    p = {"w": jnp.zeros(())}
    state = tx.init(p)
    seq = []
    for _ in range(6):
        u, state = tx.update({"w": jnp.ones(())}, state, p)
        p = optax.apply_updates(p, u)
        seq.append(float(p["w"]))
    # fast: -1; sync: slow=0+0.5*(-2-0)=-1, fast:=-1; fast: -2;
    # sync: slow=-1+0.5*(-3+1)=-2 ...
    np.testing.assert_allclose(seq, [-1, -1, -2, -2, -3, -3], atol=1e-6)


def test_radam_weight_decay_is_decoupled_lr_scaled():
    """torch_optimizer.RAdam/Ranger (the reference's implementations,
    utils/__init__.py:48-53) apply DECOUPLED lr-scaled decay:
    p -= wd * lr * p after the adaptive step. With zero gradients the
    adaptive update vanishes, so one step must move params by exactly
    -lr*wd*p — a coupled-L2 formulation would route the decay through
    the second-moment denominator instead."""
    from nsff_pl_tpu.training.optim import make_optimizer

    cfg = NSFFConfig(lr=0.1, optimizer="radam", lr_scheduler="const",
                     weight_decay=0.01)
    tx = make_optimizer(cfg, steps_per_epoch=1)
    p = {"w": jnp.full((3,), 2.0)}
    state = tx.init(p)
    updates, _ = tx.update({"w": jnp.zeros(3)}, state, p)
    np.testing.assert_allclose(np.asarray(updates["w"]),
                               -0.1 * 0.01 * 2.0, rtol=1e-6)


def test_adam_weight_decay_is_coupled_l2():
    """torch.optim.Adam (utils/__init__.py:46-47) treats weight_decay as
    an L2 penalty on the gradient: with zero gradients the decay term
    enters the moments, so the first-step update is -lr * sign-ish of
    wd*p (adam normalizes magnitude to ~lr), NOT -lr*wd*p."""
    from nsff_pl_tpu.training.optim import make_optimizer

    cfg = NSFFConfig(lr=0.1, optimizer="adam", lr_scheduler="const",
                     weight_decay=0.01)
    tx = make_optimizer(cfg, steps_per_epoch=1)
    p = {"w": jnp.full((3,), 2.0)}
    state = tx.init(p)
    updates, _ = tx.update({"w": jnp.zeros(3)}, state, p)
    u = np.asarray(updates["w"])
    # adam's bias-corrected first step ~= -lr * g/|g| = -lr
    np.testing.assert_allclose(u, -0.1, rtol=1e-3)
