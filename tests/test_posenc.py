"""Positional-encoding golden tests vs the reference contract
(`models/nerf.py:4-30`): output layout [x, sin(f0 x), cos(f0 x), ...]."""
import jax.numpy as jnp
import numpy as np

from nsff_pl_tpu.ops.posenc import posenc, posenc_dim, posenc_freqs


def test_freqs_logscale():
    freqs = posenc_freqs(9, 10)
    np.testing.assert_allclose(freqs, 2.0 ** np.linspace(0, 9, 10))


def test_freqs_linear():
    freqs = posenc_freqs(3, 4, logscale=False)
    np.testing.assert_allclose(freqs, np.linspace(1, 8, 4))


def test_output_layout_and_values():
    x = np.array([[0.1, -0.5, 2.0]], dtype=np.float32)
    n_freqs, max_log = 4, 3.0
    out = np.asarray(posenc(jnp.asarray(x), max_log, n_freqs))
    assert out.shape == (1, 3 * (1 + 2 * n_freqs))
    np.testing.assert_allclose(out[:, :3], x)
    freqs = 2.0 ** np.linspace(0, max_log, n_freqs)
    expected = [x]
    for f in freqs:
        expected += [np.sin(f * x), np.cos(f * x)]
    expected = np.concatenate(expected, -1)
    np.testing.assert_allclose(out, expected, atol=1e-6)


def test_dim_helper():
    assert posenc_dim(3, 10) == 63  # in_channels_xyz (train.py:66)
    assert posenc_dim(3, 4) == 27  # in_channels_dir (train.py:68)


def test_batched_shapes():
    x = jnp.ones((7, 5, 3))
    out = posenc(x, 9, 10)
    assert out.shape == (7, 5, 63)
