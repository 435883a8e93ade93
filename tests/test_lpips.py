"""LPIPS escape-hatch plumbing (VERDICT r2 #5).

Builds a random-weight torch state dict with the exact key layout of the
`lpips` package's `LPIPS(net='alex')` module (the reference's LPIPS model,
`metrics.py:35-49`), loads it through `--lpips_weights` plumbing, and
cross-checks the pure-JAX forward against an independent torch
implementation of the published architecture.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

_CONV_SHAPES = [(64, 3, 11, 11), (192, 64, 5, 5), (384, 192, 3, 3),
                (256, 384, 3, 3), (256, 256, 3, 3)]
_SLICE_IDX = [("slice1", "0"), ("slice2", "3"), ("slice3", "6"),
              ("slice4", "8"), ("slice5", "10")]
_STRIDES = [4, 1, 1, 1, 1]
_PADS = [2, 2, 1, 1, 1]
_POOL_BEFORE = [False, True, True, False, False]


def _random_state_dict(seed=0):
    g = torch.Generator().manual_seed(seed)
    sd = {}
    for (sl, idx), shp in zip(_SLICE_IDX, _CONV_SHAPES):
        sd[f"net.{sl}.{idx}.weight"] = 0.1 * torch.randn(shp, generator=g)
        sd[f"net.{sl}.{idx}.bias"] = 0.1 * torch.randn(shp[0], generator=g)
    for i, shp in enumerate(_CONV_SHAPES):
        sd[f"lin{i}.model.1.weight"] = torch.rand(
            (1, shp[0], 1, 1), generator=g)
    sd["scaling_layer.shift"] = torch.tensor(
        [-0.030, -0.088, -0.188]).view(1, 3, 1, 1)
    sd["scaling_layer.scale"] = torch.tensor(
        [0.458, 0.448, 0.450]).view(1, 3, 1, 1)
    return sd


def _torch_lpips(sd, a, b):
    """Independent torch forward of AlexNet-LPIPS (spatial)."""
    import torch.nn.functional as F

    def feats(x):
        x = (2 * x - 1 - sd["scaling_layer.shift"]) \
            / sd["scaling_layer.scale"]
        taps = []
        for k, ((sl, idx), st, pd, pool) in enumerate(
                zip(_SLICE_IDX, _STRIDES, _PADS, _POOL_BEFORE)):
            if pool:
                x = F.max_pool2d(x, 3, 2)
            x = F.conv2d(x, sd[f"net.{sl}.{idx}.weight"],
                         sd[f"net.{sl}.{idx}.bias"], stride=st, padding=pd)
            x = F.relu(x)
            taps.append(x)
        return taps

    H, W = a.shape[-2:]
    total = torch.zeros(H, W)
    for fa, fb, i in zip(feats(a), feats(b), range(5)):
        na = fa / torch.sqrt(torch.sum(fa ** 2, 1, keepdim=True) + 1e-10)
        nb = fb / torch.sqrt(torch.sum(fb ** 2, 1, keepdim=True) + 1e-10)
        d = (na - nb) ** 2
        m = torch.sum(d * sd[f"lin{i}.model.1.weight"], 1, keepdim=True)
        total = total + F.interpolate(
            m, size=(H, W), mode="bilinear", align_corners=False)[0, 0]
    return total


def test_jax_lpips_matches_torch_reference(tmp_path):
    from nsff_pl_tpu.training import metrics as metrics_lib

    sd = _random_state_dict()
    path = tmp_path / "alex_lpips.pth"
    torch.save(sd, path)

    model = metrics_lib.get_lpips_model(str(path))
    assert isinstance(model, metrics_lib.JaxLPIPS)

    rng = np.random.RandomState(0)
    H, W = 65, 97  # odd sizes exercise pool/upsample edge behavior
    img_a = rng.rand(H, W, 3).astype(np.float32)
    img_b = np.clip(img_a + 0.1 * rng.randn(H, W, 3), 0, 1) \
        .astype(np.float32)

    got = metrics_lib.lpips(model, img_a, img_b, reduction="none")
    with torch.no_grad():
        want = _torch_lpips(
            sd,
            torch.from_numpy(img_a).permute(2, 0, 1)[None],
            torch.from_numpy(img_b).permute(2, 0, 1)[None]).numpy()
    assert got.shape == (H, W)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-5)

    # identical images -> 0; masked mean plumbing
    zero = metrics_lib.lpips(model, img_a, img_a)
    assert abs(zero) < 1e-6
    mask = np.zeros((H, W), bool)
    mask[: H // 2] = True
    masked = metrics_lib.lpips(model, img_a, img_b, valid_mask=mask)
    np.testing.assert_allclose(masked, want[: H // 2].mean(), rtol=1e-3)


def test_lpips_loader_rejects_linear_only_dict(tmp_path):
    from nsff_pl_tpu.training import metrics as metrics_lib

    sd = {f"lin{i}.model.1.weight": torch.rand(1, c, 1, 1)
          for i, c in enumerate([64, 192, 384, 256, 256])}
    path = tmp_path / "lin_only.pth"
    torch.save(sd, path)
    with pytest.raises(ValueError, match="full AlexNet-LPIPS"):
        metrics_lib.load_lpips_weights(str(path))
