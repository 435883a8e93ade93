"""Softmax-splatting tests: forward golden values vs a dense NumPy
reference, gradient checks vs finite differences (the reference implements
these gradients by hand in CUDA, `models/softsplat.py:46-146`)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nsff_pl_tpu.ops.softsplat import softsplat, softsplat_batched, softsplat_sum


def numpy_splat_sum(image, flow):
    """Dense reference implementation: per-pixel bilinear scatter."""
    H, W, C = image.shape
    out = np.zeros_like(image)
    for y in range(H):
        for x in range(W):
            ox = x + flow[y, x, 0]
            oy = y + flow[y, x, 1]
            x0, y0 = int(np.floor(ox)), int(np.floor(oy))
            for (yy, xx, wgt) in [
                (y0, x0, (x0 + 1 - ox) * (y0 + 1 - oy)),
                (y0, x0 + 1, (ox - x0) * (y0 + 1 - oy)),
                (y0 + 1, x0, (x0 + 1 - ox) * (oy - y0)),
                (y0 + 1, x0 + 1, (ox - x0) * (oy - y0)),
            ]:
                if 0 <= xx < W and 0 <= yy < H:
                    out[yy, xx] += image[y, x] * wgt
    return out


def test_zero_flow_identity():
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 1, (6, 8, 3)).astype(np.float32)
    out = np.asarray(softsplat_sum(jnp.asarray(img), jnp.zeros((6, 8, 2))))
    np.testing.assert_allclose(out, img, atol=1e-6)


def test_integer_shift():
    img = np.zeros((5, 5, 1), np.float32)
    img[2, 2, 0] = 1.0
    flow = np.zeros((5, 5, 2), np.float32)
    flow[2, 2] = [1.0, -1.0]  # move right 1, up 1
    out = np.asarray(softsplat_sum(jnp.asarray(img), jnp.asarray(flow)))
    assert out[1, 3, 0] == pytest.approx(1.0)
    assert out[2, 2, 0] == pytest.approx(0.0)


def test_fractional_flow_matches_numpy_reference():
    rng = np.random.default_rng(1)
    img = rng.uniform(0, 1, (7, 9, 2)).astype(np.float32)
    flow = rng.uniform(-2, 2, (7, 9, 2)).astype(np.float32)
    out = np.asarray(softsplat_sum(jnp.asarray(img), jnp.asarray(flow)))
    np.testing.assert_allclose(out, numpy_splat_sum(img, flow), atol=1e-5)


def test_out_of_bounds_dropped():
    img = np.ones((4, 4, 1), np.float32)
    flow = np.full((4, 4, 2), 10.0, np.float32)  # everything off-grid
    out = np.asarray(softsplat_sum(jnp.asarray(img), jnp.asarray(flow)))
    np.testing.assert_allclose(out, 0.0)


def test_average_mode_preserves_constant_images():
    """Average mode divides by the splatted ones channel: a constant image
    stays constant wherever any mass lands (softsplat.py:307-308,318-327)."""
    img = np.full((6, 6, 3), 0.7, np.float32)
    rng = np.random.default_rng(2)
    flow = rng.uniform(-0.9, 0.9, (6, 6, 2)).astype(np.float32)
    out = np.asarray(softsplat(jnp.asarray(img), jnp.asarray(flow),
                               mode="average"))
    covered = out.sum(-1) > 0
    np.testing.assert_allclose(out[covered], 0.7, atol=1e-5)


def test_softmax_mode_prefers_high_metric():
    """Two pixels splat to the same target; softmax weighting should favor
    the one with the (much) larger metric."""
    img = np.zeros((1, 4, 1), np.float32)
    img[0, 0, 0] = 1.0  # source A value 1
    img[0, 2, 0] = 0.0  # source B value 0
    flow = np.zeros((1, 4, 2), np.float32)
    flow[0, 0, 0] = 1.0  # A -> x=1
    flow[0, 2, 0] = -1.0  # B -> x=1
    metric = np.zeros((1, 4, 1), np.float32)
    metric[0, 0, 0] = 10.0  # strongly prefer A
    out = np.asarray(softsplat(jnp.asarray(img), jnp.asarray(flow),
                               jnp.asarray(metric), "softmax"))
    assert out[0, 1, 0] > 0.99


def test_grad_input_matches_fd():
    """d(loss)/d(image) — the reference's updateGradInput gather
    (softsplat.py:46-88) must equal autodiff of our scatter."""
    rng = np.random.default_rng(3)
    img = jnp.asarray(rng.uniform(0, 1, (4, 5, 1)).astype(np.float32))
    flow = jnp.asarray(rng.uniform(-1, 1, (4, 5, 2)).astype(np.float32))
    g = jnp.asarray(rng.uniform(0, 1, (4, 5, 1)).astype(np.float32))

    loss = lambda im: jnp.sum(softsplat_sum(im, flow) * g)  # noqa: E731
    grad = np.asarray(jax.grad(loss)(img))

    eps = 1e-3
    for (y, x) in [(0, 0), (2, 3), (3, 4)]:
        e = jnp.zeros_like(img).at[y, x, 0].set(eps)
        fd = (loss(img + e) - loss(img - e)) / (2 * eps)
        np.testing.assert_allclose(grad[y, x, 0], float(fd), atol=1e-2)


def test_grad_flow_matches_fd():
    """d(loss)/d(flow) — the reference's updateGradFlow
    (softsplat.py:90-146) via d(bilinear weight)/d(flow)."""
    rng = np.random.default_rng(4)
    img = jnp.asarray(rng.uniform(0.5, 1, (4, 5, 2)).astype(np.float32))
    # keep flows away from integer crossings where the gradient is
    # discontinuous (floor changes corners)
    flow = jnp.asarray((rng.uniform(-0.8, 0.8, (4, 5, 2)) + 0.35)
                       .astype(np.float32))
    g = jnp.asarray(rng.uniform(0, 1, (4, 5, 2)).astype(np.float32))

    loss = lambda fl: jnp.sum(softsplat_sum(img, fl) * g)  # noqa: E731
    grad = np.asarray(jax.grad(loss)(flow))

    eps = 1e-3
    for (y, x, c) in [(1, 1, 0), (2, 2, 1), (0, 4, 0)]:
        e = jnp.zeros_like(flow).at[y, x, c].set(eps)
        fd = (loss(flow + e) - loss(flow - e)) / (2 * eps)
        np.testing.assert_allclose(grad[y, x, c], float(fd), atol=5e-2,
                                   rtol=5e-2)


def test_batched_matches_single():
    rng = np.random.default_rng(5)
    imgs = jnp.asarray(rng.uniform(0, 1, (3, 4, 5, 2)).astype(np.float32))
    flows = jnp.asarray(rng.uniform(-1, 1, (3, 4, 5, 2)).astype(np.float32))
    out_b = np.asarray(softsplat_batched(imgs, flows, None, "average"))
    for s in range(3):
        out_s = np.asarray(softsplat(imgs[s], flows[s], mode="average"))
        np.testing.assert_allclose(out_b[s], out_s, atol=1e-6)


def test_invalid_mode_raises():
    with pytest.raises(ValueError):
        softsplat(jnp.zeros((2, 2, 1)), jnp.zeros((2, 2, 2)), mode="nope")
    with pytest.raises(ValueError):
        softsplat(jnp.zeros((2, 2, 1)), jnp.zeros((2, 2, 2)), mode="linear")
