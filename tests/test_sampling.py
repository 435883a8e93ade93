"""Sampling tests: stratified z generation and inverse-CDF importance
sampling (`models/rendering.py:10-49,313-324`)."""
import jax
import jax.numpy as jnp
import numpy as np

from nsff_pl_tpu.ops.sampling import sample_pdf, stratified_zs


def test_stratified_no_perturb():
    zs, zs_mid = stratified_zs(jax.random.PRNGKey(0), 3, 8, perturb=0.0)
    expected = np.linspace(0, 1, 8)
    np.testing.assert_allclose(np.asarray(zs), np.tile(expected, (3, 1)),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(zs_mid),
                               np.tile(0.5 * (expected[:-1] + expected[1:]),
                                       (3, 1)), atol=1e-6)


def test_stratified_perturb_stays_in_intervals():
    n = 64
    zs, _ = stratified_zs(jax.random.PRNGKey(1), 16, n, perturb=1.0)
    zs = np.asarray(zs)
    base = np.linspace(0, 1, n)
    mids = 0.5 * (base[:-1] + base[1:])
    lower = np.concatenate([[base[0]], mids])
    upper = np.concatenate([mids, [base[-1]]])
    assert np.all(zs >= lower - 1e-6)
    assert np.all(zs <= upper + 1e-6)
    # monotone along each ray
    assert np.all(np.diff(zs, axis=-1) > -1e-6)


def test_sample_pdf_det_uniform_weights():
    """Uniform weights + det=True -> evenly spaced samples across bins."""
    bins = jnp.broadcast_to(jnp.linspace(0.0, 1.0, 9), (4, 9))
    weights = jnp.ones((4, 8))
    s = np.asarray(sample_pdf(jax.random.PRNGKey(0), bins, weights, 16, det=True))
    assert s.shape == (4, 16)
    np.testing.assert_allclose(s[0], np.linspace(0, 1, 16), atol=1e-4)


def test_sample_pdf_concentrates_on_heavy_bin():
    bins = jnp.broadcast_to(jnp.linspace(0.0, 1.0, 11), (1, 11))
    weights = jnp.zeros((1, 10)).at[0, 4].set(100.0)
    s = np.asarray(sample_pdf(jax.random.PRNGKey(2), bins, weights, 64,
                              det=False))
    frac_in_bin = np.mean((s >= 0.4) & (s <= 0.5))
    assert frac_in_bin > 0.95


def test_sample_pdf_random_in_range():
    bins = jnp.broadcast_to(jnp.linspace(0.2, 0.8, 7), (5, 7))
    weights = jax.random.uniform(jax.random.PRNGKey(3), (5, 6)) + 0.1
    s = np.asarray(sample_pdf(jax.random.PRNGKey(4), bins, weights, 32))
    assert np.all(s >= 0.2 - 1e-5) and np.all(s <= 0.8 + 1e-5)
