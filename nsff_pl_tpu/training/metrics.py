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
    # precision='highest': on TPU the convolution lowers to dots whose
    # default operand precision is bf16 — enough mantissa loss to shift
    # SSIM by >0.1 on smooth content (observed in the round-4 parity
    # eval). Metrics must not depend on the accelerator's matmul default.
    conv = lambda v: jnp.convolve(v, k, mode="valid", precision="highest")
    x = jnp.pad(img, ((pad, pad), (0, 0), (0, 0)), mode="reflect")
    x = jax.vmap(lambda c: jnp.apply_along_axis(conv, 0, c), in_axes=-1,
                 out_axes=-1)(x)
    x = jnp.pad(x, ((0, 0), (pad, pad), (0, 0)), mode="reflect")
    x = jax.vmap(lambda c: jnp.apply_along_axis(conv, 1, c), in_axes=-1,
                 out_axes=-1)(x)
    return x


def ssim_map(image_gt, image_pred, window_size: int = 11,
             sigma: float = 1.5, max_val: float = 1.0):
    """Per-pixel SSIM of (H, W, C) images with a gaussian window —
    the computation underlying kornia's `ssim` used at `metrics.py:19-32`."""
    k = _gaussian_kernel1d(window_size, sigma)
    c1 = (0.01 * max_val) ** 2
    c2 = (0.03 * max_val) ** 2

    # Variance/covariance are invariant to constant shifts, so compute
    # them on globally mean-centered images: E[x²]−μ² cancels
    # catastrophically when μ² ≫ σ² (smooth bright content), which
    # under-reported SSIM by up to 0.14 in the round-4 TPU eval. The
    # luminance means are recovered exactly by adding the shifts back.
    cx = jnp.mean(image_gt)
    cy = jnp.mean(image_pred)
    xs = image_gt - cx
    ys = image_pred - cy
    mu_xs = _filter2d_sep(xs, k)
    mu_ys = _filter2d_sep(ys, k)
    mu_x = mu_xs + cx
    mu_y = mu_ys + cy
    mu_xx = mu_x * mu_x
    mu_yy = mu_y * mu_y
    mu_xy = mu_x * mu_y
    sigma_x = _filter2d_sep(xs * xs, k) - mu_xs * mu_xs
    sigma_y = _filter2d_sep(ys * ys, k) - mu_ys * mu_ys
    sigma_xy = _filter2d_sep(xs * ys, k) - mu_xs * mu_ys

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
# `JaxLPIPS` is the escape hatch (VERDICT r2 #5): drop the `lpips`
# package's full AlexNet state dict (torch.save(LPIPS(net='alex')
# .state_dict())) anywhere on disk and pass it via eval.py
# --lpips_weights — the table then prints real numbers with no code
# change and no network access.
# ---------------------------------------------------------------------------

# torchvision AlexNet `features` layout used by lpips (conv index,
# stride, padding, maxpool-before-this-conv); feature taps are after each
# conv's ReLU, channels (64, 192, 384, 256, 256)
_ALEX_CONVS = (
    ("0", 4, 2, False),
    ("3", 1, 2, True),
    ("6", 1, 1, True),
    ("8", 1, 1, False),
    ("10", 1, 1, False),
)
_ALEX_SLICES = ("slice1", "slice2", "slice3", "slice4", "slice5")
# lpips ScalingLayer constants (fixed buffers in the package)
_LPIPS_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_LPIPS_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def _lpips_features(params, x):
    taps = []
    for (w, b), (_, stride, pad, pool) in zip(params["convs"], _ALEX_CONVS):
        if pool:
            x = jax.lax.reduce_window(
                x, -jnp.inf, jax.lax.max, (1, 1, 3, 3), (1, 1, 2, 2),
                "VALID")
        x = jax.lax.conv_general_dilated(
            x, w, (stride, stride), [(pad, pad), (pad, pad)],
            dimension_numbers=("NCHW", "OIHW", "NCHW"))
        x = jax.nn.relu(x + b.reshape(1, -1, 1, 1))
        taps.append(x)
    return taps


def _lpips_distance(params, a, b):
    """a, b: (1, 3, H, W) in [0, 1] -> (H, W) spatial LPIPS map."""
    H, W = a.shape[-2:]
    # normalize=True maps [0,1] -> [-1,1], then the scaling layer
    a = (2.0 * a - 1.0 - params["shift"]) / params["scale"]
    b = (2.0 * b - 1.0 - params["shift"]) / params["scale"]
    total = jnp.zeros((H, W), jnp.float32)
    for fa, fb, lin in zip(_lpips_features(params, a),
                           _lpips_features(params, b), params["lins"]):
        na = fa * jax.lax.rsqrt(jnp.sum(fa * fa, 1, keepdims=True) + 1e-10)
        nb = fb * jax.lax.rsqrt(jnp.sum(fb * fb, 1, keepdims=True) + 1e-10)
        d = (na - nb) ** 2
        m = jnp.sum(d * lin.reshape(1, -1, 1, 1), 1)  # (1, h, w)
        total = total + jax.image.resize(m[0], (H, W), "bilinear")
    return total


class JaxLPIPS:
    """AlexNet-LPIPS (spatial variant) in pure JAX from a user-supplied
    state dict — the architecture of the reference's `third_party/lpips`
    AlexNet model (`metrics.py:35-49`): scale inputs, run the 5 AlexNet
    conv taps, unit-normalize each tap along channels, squared
    difference, 1x1 linear head per tap, bilinear-upsample the 5 maps to
    the input size and sum."""

    def __init__(self, weights: dict):
        # the ~2.4M AlexNet params ride as jit ARGUMENTS (device buffers),
        # never as baked closure constants — a captured weight set would
        # be re-serialized into every compiled program (the tunneled
        # remote-compile POST has a size limit; see CLAUDE.md)
        self.params = {
            "convs": [(jnp.asarray(w), jnp.asarray(b))
                      for w, b in weights["convs"]],
            "lins": [jnp.asarray(w) for w in weights["lins"]],
            "shift": jnp.asarray(weights["shift"]).reshape(1, 3, 1, 1),
            "scale": jnp.asarray(weights["scale"]).reshape(1, 3, 1, 1),
        }
        self._fn = jax.jit(_lpips_distance)

    def __call__(self, image_gt, image_pred):
        """(H, W, 3) in [0, 1] each -> (H, W) numpy LPIPS map."""
        a = jnp.asarray(np.asarray(image_gt), jnp.float32) \
            .transpose(2, 0, 1)[None]
        b = jnp.asarray(np.asarray(image_pred), jnp.float32) \
            .transpose(2, 0, 1)[None]
        return np.asarray(self._fn(self.params, a, b))


def load_lpips_weights(path: str) -> "JaxLPIPS":
    """Load a torch state dict of the `lpips` package's
    `LPIPS(net='alex')` module (keys `scaling_layer.{shift,scale}`,
    `net.sliceK.I.{weight,bias}`, `linK.model.1.weight` — `lins.K...`
    also accepted) into a `JaxLPIPS`."""
    import torch

    sd = torch.load(path, map_location="cpu")
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    sd = {k: np.asarray(v, np.float32) for k, v in sd.items()
          if hasattr(v, "__array__") or hasattr(v, "numpy")}

    convs = []
    for sl, (idx, *_rest) in zip(_ALEX_SLICES, _ALEX_CONVS):
        wk, bk = f"net.{sl}.{idx}.weight", f"net.{sl}.{idx}.bias"
        if wk not in sd:
            raise ValueError(
                f"--lpips_weights: missing {wk!r}; expected the full "
                f"AlexNet-LPIPS state dict "
                f"(torch.save(lpips.LPIPS(net='alex').state_dict(), ...)) "
                f"— the 6 kB linear-only alex.pth is not enough offline")
        convs.append((sd[wk], sd[bk]))
    lins = []
    for i in range(5):
        for k in (f"lin{i}.model.1.weight", f"lins.{i}.model.1.weight",
                  f"lin{i}.weight"):
            if k in sd:
                lins.append(sd[k].reshape(-1))
                break
        else:
            raise ValueError(f"--lpips_weights: missing lin{i} weight")
    shift = sd.get("scaling_layer.shift", _LPIPS_SHIFT)
    scale = sd.get("scaling_layer.scale", _LPIPS_SCALE)
    return JaxLPIPS({"convs": convs, "lins": lins,
                     "shift": np.asarray(shift).reshape(-1),
                     "scale": np.asarray(scale).reshape(-1)})


_lpips_model = None
_lpips_failed = False


def get_lpips_model(weights_path: Optional[str] = None):
    """Build an AlexNet LPIPS model: from a user-supplied state dict when
    `weights_path` is given (pure-JAX `JaxLPIPS`), else the torch `lpips`
    package if importable; returns None if unavailable."""
    global _lpips_model, _lpips_failed
    if weights_path:
        return load_lpips_weights(weights_path)
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
    if isinstance(lpips_model, JaxLPIPS):
        value = lpips_model(image_gt, image_pred)
    else:
        import torch

        with torch.no_grad():
            a = torch.from_numpy(np.asarray(image_gt)) \
                .permute(2, 0, 1)[None].float()
            b = torch.from_numpy(np.asarray(image_pred)) \
                .permute(2, 0, 1)[None].float()
            value = lpips_model(a, b, normalize=True).squeeze()
        value = value.numpy()
    if valid_mask is not None:
        value = value[np.asarray(valid_mask)]
    if reduction == "mean":
        return float(value.mean())
    return value
