"""Depth sampling along rays: stratified coarse samples and inverse-CDF
hierarchical ("importance") resampling.

Equivalent to the reference's z generation (`models/rendering.py:313-324`)
and `sample_pdf` (`models/rendering.py:10-49`), expressed with
`jnp.searchsorted` + `take_along_axis` so everything stays static-shaped
and jit-friendly.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def stratified_zs(rng, n_rays: int, n_samples: int, perturb: float,
                  dtype=jnp.float32):
    """Coarse sample depths in NDC z in [0, 1].

    Matches `rendering.py:314-324`: linspace z, then (if perturb > 0)
    jitter each z uniformly inside its interval
    `z = lower + (upper - lower) * perturb * U[0,1)`.

    Returns (zs, zs_mid) with shapes (n_rays, n_samples) and
    (n_rays, n_samples-1).
    """
    zs = jnp.linspace(0.0, 1.0, n_samples, dtype=dtype)
    zs = jnp.broadcast_to(zs, (n_rays, n_samples))
    zs_mid = 0.5 * (zs[:, :-1] + zs[:, 1:])
    if perturb > 0:
        upper = jnp.concatenate([zs_mid, zs[:, -1:]], -1)
        lower = jnp.concatenate([zs[:, :1], zs_mid], -1)
        u = jax.random.uniform(rng, (n_rays, n_samples), dtype=dtype)
        zs = lower + (upper - lower) * perturb * u
    return zs, zs_mid


def sample_pdf(rng, bins, weights, n_importance: int, det: bool = False,
               eps: float = 1e-5):
    """Draw `n_importance` samples from the piecewise-constant PDF given by
    `weights` over `bins`.

    Matches `rendering.py:10-49`:
        bins: (N_rays, M+1) bin edges, weights: (N_rays, M)
    `det=True` uses evenly spaced u (the reference's behavior when
    perturb == 0); otherwise uniform random u.
    """
    n_rays, m = weights.shape
    weights = weights + eps
    pdf = weights / jnp.sum(weights, -1, keepdims=True)
    cdf = jnp.cumsum(pdf, -1)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[:, :1]), cdf], -1)  # (N, M+1)

    if det:
        u = jnp.linspace(0.0, 1.0, n_importance, dtype=cdf.dtype)
        u = jnp.broadcast_to(u, (n_rays, n_importance))
    else:
        u = jax.random.uniform(rng, (n_rays, n_importance), dtype=cdf.dtype)

    inds = jax.vmap(lambda c, uu: jnp.searchsorted(c, uu, side="right"))(cdf, u)
    below = jnp.clip(inds - 1, 0, m)
    above = jnp.clip(inds, 0, m)

    cdf_below = jnp.take_along_axis(cdf, below, -1)
    cdf_above = jnp.take_along_axis(cdf, above, -1)
    bins_below = jnp.take_along_axis(bins, below, -1)
    bins_above = jnp.take_along_axis(bins, above, -1)

    denom = cdf_above - cdf_below
    denom = jnp.where(denom < eps, 1.0, denom)
    return bins_below + (u - cdf_below) / denom * (bins_above - bins_below)
