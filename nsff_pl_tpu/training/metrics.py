"""Image quality metrics: MSE / PSNR / SSIM (pure JAX) and LPIPS (gated
torch wrapper).

Mirrors the reference `metrics.py:6-49`. The reference's `ssim` wraps
kornia's `ssim_loss` (gaussian window 11, sigma 1.5) and reports
`1 - loss` where `loss = clamp((1 - ssim_map)/2, 0, 1)` — i.e. the
returned score is `(1 + ssim)/2` clamped. We reproduce that formula
exactly so scores are comparable with the reference's published numbers.
All metrics accept a `valid_mask` for the dynamic-region-only variants
(`eval.py:236-240`).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def mse(image_gt, image_pred, valid_mask=None, reduction: str = "mean"):
    """`metrics.py:6-13`."""
    value = (image_gt - image_pred) ** 2
    if valid_mask is not None:
        value = value[valid_mask]
    if reduction == "mean":
        return jnp.mean(value)
    return value


def psnr(image_gt, image_pred, valid_mask=None, reduction: str = "mean"):
    """`metrics.py:15-16`: -10 log10(mse)."""
    return -10 * jnp.log10(mse(image_gt, image_pred, valid_mask, reduction))


def _gaussian_kernel1d(size: int, sigma: float) -> np.ndarray:
    x = np.arange(size) - (size - 1) / 2.0
    g = np.exp(-(x ** 2) / (2 * sigma ** 2))
    return (g / g.sum()).astype(np.float32)


def _filter2d_sep(img, k1d):
    """Separable 2D filtering of (H, W, C) with reflect padding (kornia's
    filter2d default border behavior)."""
    pad = (len(k1d) - 1) // 2
    k = jnp.asarray(k1d)
    x = jnp.pad(img, ((pad, pad), (0, 0), (0, 0)), mode="reflect")
    x = jax.vmap(lambda c: jnp.apply_along_axis(
        lambda v: jnp.convolve(v, k, mode="valid"), 0, c), in_axes=-1,
        out_axes=-1)(x)
    x = jnp.pad(x, ((0, 0), (pad, pad), (0, 0)), mode="reflect")
    x = jax.vmap(lambda c: jnp.apply_along_axis(
        lambda v: jnp.convolve(v, k, mode="valid"), 1, c), in_axes=-1,
        out_axes=-1)(x)
    return x


def ssim_map(image_gt, image_pred, window_size: int = 11,
             sigma: float = 1.5, max_val: float = 1.0):
    """Per-pixel SSIM of (H, W, C) images with a gaussian window —
    the computation underlying kornia's `ssim` used at `metrics.py:19-32`."""
    k = _gaussian_kernel1d(window_size, sigma)
    c1 = (0.01 * max_val) ** 2
    c2 = (0.03 * max_val) ** 2

    mu_x = _filter2d_sep(image_gt, k)
    mu_y = _filter2d_sep(image_pred, k)
    mu_xx = mu_x * mu_x
    mu_yy = mu_y * mu_y
    mu_xy = mu_x * mu_y
    sigma_x = _filter2d_sep(image_gt * image_gt, k) - mu_xx
    sigma_y = _filter2d_sep(image_pred * image_pred, k) - mu_yy
    sigma_xy = _filter2d_sep(image_gt * image_pred, k) - mu_xy

    num = (2 * mu_xy + c1) * (2 * sigma_xy + c2)
    den = (mu_xx + mu_yy + c1) * (sigma_x + sigma_y + c2)
    return num / den


def ssim(image_gt, image_pred, valid_mask=None, window_size: int = 11,
         reduction: str = "mean"):
    """`metrics.py:19-32`: returns 1 - clamp((1-ssim)/2, 0, 1) per pixel
    (mean over channels happens at call sites)."""
    loss = jnp.clip((1.0 - ssim_map(image_gt, image_pred, window_size)) / 2.0,
                    0.0, 1.0)
    value = 1.0 - loss
    if valid_mask is not None:
        value = value[valid_mask]
    if reduction == "mean":
        return jnp.mean(value)
    return value


# ---------------------------------------------------------------------------
# LPIPS — the reference uses an AlexNet LPIPS submodule
# (`third_party/lpips`, `metrics.py:35-49`). Torch runs CPU-side here; the
# wrapper is gated because pretrained weights may be unavailable offline.
# ---------------------------------------------------------------------------

_lpips_model = None
_lpips_failed = False


def get_lpips_model():
    """Try to build an AlexNet LPIPS model (returns None if unavailable)."""
    global _lpips_model, _lpips_failed
    if _lpips_model is not None or _lpips_failed:
        return _lpips_model
    try:
        import lpips as lpips_pkg  # optional dependency

        _lpips_model = lpips_pkg.LPIPS(net="alex", spatial=True)
    except Exception:
        _lpips_failed = True
        _lpips_model = None
    return _lpips_model


def lpips(lpips_model, image_gt, image_pred, valid_mask=None,
          reduction: str = "mean") -> Optional[float]:
    """`metrics.py:35-49`. Inputs (H, W, 3) in [0, 1]; returns a float, or
    None when no LPIPS model is available."""
    if lpips_model is None:
        return None
    import torch

    with torch.no_grad():
        a = torch.from_numpy(np.asarray(image_gt)).permute(2, 0, 1)[None].float()
        b = torch.from_numpy(np.asarray(image_pred)).permute(2, 0, 1)[None].float()
        value = lpips_model(a, b, normalize=True).squeeze()
    value = value.numpy()
    if valid_mask is not None:
        value = value[np.asarray(valid_mask)]
    if reduction == "mean":
        return float(value.mean())
    return value
