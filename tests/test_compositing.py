"""Compositing golden tests vs hand-computed alpha/transmittance values
(`models/rendering.py:202-248`)."""
import jax.numpy as jnp
import numpy as np

from nsff_pl_tpu.ops import compositing as cp


def test_deltas_padding():
    zs = jnp.array([[0.0, 0.1, 0.3, 1.0]])
    s, t = cp.deltas_from_zs(zs)
    np.testing.assert_allclose(np.asarray(s)[0], [0.1, 0.2, 0.7, 100.0],
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(t)[0], [0.1, 0.2, 0.7, 1e-3],
                               atol=1e-6)


def test_transmittance_exclusive_cumprod():
    alphas = jnp.array([[0.5, 0.5, 0.5]])
    T = np.asarray(cp.transmittance(alphas))
    np.testing.assert_allclose(T[0], [1.0, 0.5, 0.25], atol=1e-6)


def test_single_field_weights_sum_below_one():
    alphas = jnp.array([[0.3, 0.9, 0.2, 0.99]])
    w = np.asarray(cp.composite_one_field(alphas))
    assert w.sum() <= 1.0 + 1e-6
    # first weight is alpha itself
    np.testing.assert_allclose(w[0, 0], 0.3, atol=1e-6)


def test_two_field_additive_composition():
    """alpha = 1-(1-a_s)(1-a_t); weights split proportionally with the
    SHARED transmittance (`rendering.py:215,234-248`)."""
    a_s = jnp.array([[0.4, 0.2]])
    a_t = jnp.array([[0.1, 0.5]])
    ws, wt, w, T = cp.composite_two_fields(a_s, a_t)
    alpha = 1 - (1 - np.asarray(a_s)) * (1 - np.asarray(a_t))
    np.testing.assert_allclose(np.asarray(T)[0], [1.0, 1 - alpha[0, 0]],
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(w), alpha * np.asarray(T), atol=1e-6)
    np.testing.assert_allclose(np.asarray(ws), np.asarray(a_s) * np.asarray(T),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(wt), np.asarray(a_t) * np.asarray(T),
                               atol=1e-6)


def test_opaque_sample_blocks_rest():
    a = jnp.array([[1.0, 0.5]])
    w = np.asarray(cp.composite_one_field(a))
    np.testing.assert_allclose(w[0], [1.0, 0.0], atol=1e-6)


def test_weighted_sum_shapes():
    w = jnp.ones((2, 4)) / 4
    v3 = jnp.ones((2, 4, 3)) * 2
    v1 = jnp.arange(8.0).reshape(2, 4)
    assert cp.weighted_sum(w, v3).shape == (2, 3)
    np.testing.assert_allclose(np.asarray(cp.weighted_sum(w, v3)), 2.0)
    np.testing.assert_allclose(np.asarray(cp.weighted_sum(w, v1)),
                               v1.mean(-1), atol=1e-6)


def test_transmittance_from_taus_matches_cumprod():
    """exp(-excl_cumsum(tau)) == cumprod(1 - alpha) with alpha =
    1-exp(-tau), including saturated (alpha == 1) samples."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from nsff_pl_tpu.ops import compositing as cp

    taus = jnp.abs(jax.random.normal(jax.random.PRNGKey(0), (7, 33))) * 2
    taus = taus.at[2, 5].set(120.0)  # alpha == 1.0 exactly in f32
    ref = cp.transmittance(1.0 - jnp.exp(-taus))
    out = cp.transmittance_from_taus(taus)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=1e-30)
    # gradients stay finite where cumprod's do
    g = jax.grad(lambda t: jnp.sum(cp.transmittance_from_taus(t) ** 2))(taus)
    assert np.isfinite(np.asarray(g)).all()
