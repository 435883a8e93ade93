"""Loss-suite golden tests with hand-computed values (`losses.py:8-171`)."""
import jax.numpy as jnp
import numpy as np
import pytest

from nsff_pl_tpu.training.loss import (LossConfig, _dilate_along_samples,
                                       compute_losses,
                                       shiftscale_invariant_depthloss,
                                       total_loss)


def test_shiftscale_invariant_depthloss_golden():
    """Median/MAD normalization of both signals (`losses.py:8-28`)."""
    depth = jnp.array([1.0, 2.0, 3.0, 4.0, 5.0])
    disp = jnp.array([-1.0, -2.0, -3.0, -4.0, -5.0])  # -disp == depth
    # identical after normalization -> zero loss
    np.testing.assert_allclose(
        np.asarray(shiftscale_invariant_depthloss(depth, disp)), 0, atol=1e-6)

    # affine transforms of depth are invariant
    loss = shiftscale_invariant_depthloss(10 * depth + 3, disp)
    np.testing.assert_allclose(np.asarray(loss), 0, atol=1e-5)


def test_depthloss_nonzero_for_disagreement():
    depth = jnp.array([1.0, 2.0, 3.0, 4.0])
    disp = jnp.array([-1.0, -3.0, -2.0, -4.0])  # scrambled
    assert float(jnp.sum(shiftscale_invariant_depthloss(depth, disp))) > 0.1


def test_dilate_identity_for_thickness_1():
    w = jnp.arange(12.0).reshape(2, 6)
    np.testing.assert_allclose(np.asarray(_dilate_along_samples(w, 1)),
                               np.asarray(w))


def test_dilate_thickness_3():
    w = jnp.zeros((1, 5)).at[0, 2].set(1.0)
    out = np.asarray(_dilate_along_samples(w, 3))
    np.testing.assert_allclose(out[0], [0, 1, 1, 1, 0], atol=1e-6)


def _static_batch_and_results(n=8):
    rng = np.random.RandomState(0)
    results = {
        "rgb_fine": jnp.asarray(rng.rand(n, 3).astype(np.float32)),
        "depth_fine": jnp.asarray(rng.rand(n).astype(np.float32)),
    }
    batch = {
        "rgbs": jnp.asarray(rng.rand(n, 3).astype(np.float32)),
        "disps": jnp.asarray(rng.rand(n).astype(np.float32)),
    }
    return results, batch


def test_col_l_golden():
    results, batch = _static_batch_and_results()
    out = compute_losses(results, batch, LossConfig(), epoch=0,
                         output_transient_flow=())
    expected = float(jnp.mean((results["rgb_fine"] - batch["rgbs"]) ** 2))
    np.testing.assert_allclose(float(out["col_l"]), expected, rtol=1e-6)
    assert set(out) == {"col_l", "disp_l"}


def test_coarse_adds_tenth_weight():
    results, batch = _static_batch_and_results()
    out1 = compute_losses(results, batch, LossConfig(), epoch=0,
                          output_transient_flow=())
    results2 = dict(results)
    results2["rgb_coarse"] = results["rgb_fine"]  # same error again
    results2["depth_coarse"] = results["depth_fine"]
    out2 = compute_losses(results2, batch, LossConfig(), epoch=0,
                          output_transient_flow=())
    np.testing.assert_allclose(float(out2["col_l"]),
                               1.1 * float(out1["col_l"]), rtol=1e-5)


def test_lambda_geo_epoch_decay():
    """lambda_geo decays x0.1 every 10 epochs (train.py:174-176)."""
    results, batch = _static_batch_and_results()
    outs = [compute_losses(results, batch, LossConfig(), epoch=e,
                           output_transient_flow=())["disp_l"]
            for e in (0, 9, 10, 20)]
    np.testing.assert_allclose(float(outs[1]), float(outs[0]), rtol=1e-6)
    np.testing.assert_allclose(float(outs[2]), 0.1 * float(outs[0]), rtol=1e-5)
    np.testing.assert_allclose(float(outs[3]), 0.01 * float(outs[0]), rtol=1e-5)


def _flow_results_and_batch(n=6, s=8, n_frames=5, ts_val=2):
    rng = np.random.RandomState(1)
    r = lambda *shape: jnp.asarray(rng.rand(*shape).astype(np.float32))
    results = {
        "rgb_fine": r(n, 3), "depth_fine": r(n),
        "transient_weights_fine": r(n, s) * 0.1,
        "static_weights_fine": r(n, s) * 0.1,
        "xyz_fw": r(n, 3) * 0.5, "xyz_bw": r(n, 3) * 0.5,
        "rgb_fw": r(n, 3), "rgb_bw": r(n, 3),
        "disocc_fw": r(n, 1) * 0.5 + 0.5, "disocc_bw": r(n, 1) * 0.5 + 0.5,
        "disoccs_fw": r(n, s, 1) * 0.5 + 0.5,
        "disoccs_bw": r(n, s, 1) * 0.5 + 0.5,
        "xyzs_fine": r(n, s, 3) * 0.5, "xyzs_fw_bw": r(n, s, 3) * 0.5,
        "xyzs_bw_fw": r(n, s, 3) * 0.5,
        "xyzs_fw": r(n, s, 3) * 0.5, "xyzs_bw": r(n, s, 3) * 0.5,
    }
    batch = {
        "rgbs": r(n, 3), "disps": r(n),
        "ts": jnp.full((n,), ts_val, jnp.int32),
        "cam_ids": jnp.zeros((n,), jnp.int32),
        "uv_fw": r(n, 2) * 50, "uv_bw": r(n, 2) * 50,
    }
    K = np.array([[[100.0, 0, 32], [0, 100, 24], [0, 0, 1]]], np.float32)
    # projection flips "right up back" world coords to "right down forward"
    # (monocular.py:131) so points in front of the camera get z > 0
    rt = np.diag([1.0, -1.0, -1.0]) @ np.eye(3, 4)
    Ps = np.tile((K[0] @ rt).astype(np.float32), (1, n_frames, 1, 1))
    return results, batch, jnp.asarray(K), jnp.asarray(Ps)


def test_full_loss_has_all_terms():
    results, batch, Ks, Ps = _flow_results_and_batch()
    out = compute_losses(results, batch, LossConfig(max_t=4), epoch=0,
                         output_transient_flow=("fw", "bw", "disocc"),
                         Ks=Ks, Ps=Ps)
    assert set(out) == {"col_l", "disp_l", "entropy_l", "cross_entropy_l",
                        "flow_fw_l", "flow_bw_l", "pho_l", "cyc_l",
                        "reg_temp_sm_l", "reg_min_l", "reg_sp_sm_l"}
    assert np.isfinite(float(total_loss(out)))


def test_flow_loss_masked_at_sequence_ends():
    """ts == max_t disables the forward term; ts == 0 the backward term
    (losses.py:113-116)."""
    results, batch, Ks, Ps = _flow_results_and_batch(ts_val=4)  # == max_t
    out = compute_losses(results, batch, LossConfig(max_t=4), epoch=0,
                         output_transient_flow=("fw", "bw"), Ks=Ks, Ps=Ps)
    assert float(out["flow_fw_l"]) == 0.0
    assert float(out["flow_bw_l"]) > 0.0

    results, batch, Ks, Ps = _flow_results_and_batch(ts_val=0)
    out = compute_losses(results, batch, LossConfig(max_t=4), epoch=0,
                         output_transient_flow=("fw", "bw"), Ks=Ks, Ps=Ps)
    assert float(out["flow_bw_l"]) == 0.0
    assert float(out["flow_fw_l"]) > 0.0


def test_cross_entropy_ramp():
    """Weight ramps 0 -> lambda_ent/5 over 10 epochs (losses.py:89-90)."""
    results, batch, Ks, Ps = _flow_results_and_batch()
    outs = [compute_losses(results, batch, LossConfig(max_t=4), epoch=e,
                           output_transient_flow=("fw", "bw"), Ks=Ks, Ps=Ps)
            for e in (0, 5, 10, 20)]
    assert float(outs[0]["cross_entropy_l"]) == 0.0
    np.testing.assert_allclose(float(outs[1]["cross_entropy_l"]),
                               0.5 * float(outs[2]["cross_entropy_l"]),
                               rtol=1e-5)
    np.testing.assert_allclose(float(outs[3]["cross_entropy_l"]),
                               float(outs[2]["cross_entropy_l"]), rtol=1e-6)


def test_entropy_term_golden():
    results, batch, Ks, Ps = _flow_results_and_batch()
    out = compute_losses(results, batch, LossConfig(max_t=4), epoch=0,
                         output_transient_flow=("fw", "bw"), Ks=Ks, Ps=Ps)
    tw = np.asarray(results["transient_weights_fine"])
    expected = 1e-3 * np.mean(np.sum(-tw * np.log(tw + 1e-8), -1))
    np.testing.assert_allclose(float(out["entropy_l"]), expected, rtol=1e-5)


def test_topk_selects_hardest():
    """topk keeps only the largest per-ray losses (losses.py:165-167)."""
    results, batch = _static_batch_and_results(n=8)
    # make one ray catastrophically wrong
    bad = dict(results)
    bad["rgb_fine"] = results["rgb_fine"].at[0].set(10.0)
    out_all = compute_losses(bad, batch, LossConfig(topk=1.0), epoch=0,
                             output_transient_flow=())
    out_topk = compute_losses(bad, batch, LossConfig(topk=0.25), epoch=0,
                              output_transient_flow=())
    assert float(out_topk["col_l"]) > float(out_all["col_l"])


def test_priority_weights_scale_loss():
    results, batch = _static_batch_and_results()
    out1 = compute_losses(results, batch, LossConfig(), epoch=0,
                          output_transient_flow=())
    out2 = compute_losses(results, batch, LossConfig(), epoch=0,
                          output_transient_flow=(),
                          weights=2 * jnp.ones(8))
    np.testing.assert_allclose(float(out2["col_l"]),
                               2 * float(out1["col_l"]), rtol=1e-6)


def test_dilate_matches_kornia_padding_even_and_odd():
    """Golden check of _dilate_along_samples vs kornia filter2d semantics
    (losses.py:63,92-95): _compute_padding pads front=(t-1)//2, rear=t//2
    and correlates with a ones window — for even AND odd thickness."""
    rng = np.random.RandomState(3)
    w = rng.rand(2, 9).astype(np.float32)
    for t in (2, 3, 4, 5):
        pad_front, pad_rear = (t - 1) // 2, t // 2
        wp = np.pad(w, ((0, 0), (pad_front, pad_rear)))
        expected = np.stack([wp[:, i:i + t].sum(1) for i in range(9)], 1)
        out = np.asarray(_dilate_along_samples(jnp.asarray(w), t))
        np.testing.assert_allclose(out, expected, rtol=1e-6, err_msg=f"t={t}")
