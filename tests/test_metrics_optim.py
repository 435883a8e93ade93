"""Metric golden tests + LR-schedule behavior (`metrics.py`,
`utils/__init__.py:59-76`)."""
import jax.numpy as jnp
import numpy as np
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
