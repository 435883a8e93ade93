#!/usr/bin/env python
"""Benchmark: NSFF training throughput (rays/sec/chip) on the kid-running
workload shape.

Measures the FULL training step — device-side batch gather, rendering with
3-frame scene-flow warping (the fine MLP evaluated 3x per sample:
current + fw-warped + bw-warped, `models/rendering.py:169-175,217-229` in
the reference), all 8 loss terms, backward, Adam update — on a synthetic
ray table with the kid-running geometry (30 frames x 512x288, N_samples
128, no coarse model: the reference's headline recipe, README.md:227-234).

Baseline: the reference publishes NO throughput numbers (BASELINE.md).
We estimate an A100 running the reference PyTorch code at 15,000 rays/s:
    per-ray cost ~= 128 samples x [static+transient fwd (2.2 MFLOP/pt)
    + 2 warped transient fwds (2.0 MFLOP/pt)] x 3 (fwd+bwd) ~= 1.6 GFLOP
    A100 TF32 w/ realistic ~15% MFU for chunked 32k-point batches
    => ~15k rays/s. (2080Ti measured anecdotes are ~2-4k rays/s.)
`vs_baseline` = ours / 15000.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
from __future__ import annotations

import json
import os
import time

BASELINE_A100_RAYS_PER_SEC = 15000.0


def build(batch_size: int, n_samples: int = 128, dtype: str = "bfloat16",
          fused_train: str = "auto", scan_steps: int = 1,
          warp_subsample: int = 1, n_importance: int = 0,
          warp_importance: float = 0.0, hard_sampling: bool = False,
          topk: float = 1.0):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from nsff_pl_tpu.config import NSFFConfig
    from nsff_pl_tpu.models import nerf as nerf_m
    from nsff_pl_tpu.models.rendering import RenderConfig
    from nsff_pl_tpu.training.loss import LossConfig
    from nsff_pl_tpu.training.optim import make_optimizer
    from nsff_pl_tpu.training.step import TrainState, make_train_step

    n_frames, w, h = 30, 512, 288
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 4)
    params = {
        "nerf_fine": nerf_m.init_nerf_params(
            ks[0], "fine", use_viewdir=True, encode_appearance=False,
            encode_transient=True, in_channels_t=48, output_flow=True),
        "embedding_t": nerf_m.init_embedding(ks[1], n_frames, 48),
    }
    if n_importance > 0:
        params["nerf_coarse"] = nerf_m.init_nerf_params(
            ks[2], "coarse", use_viewdir=True, encode_appearance=False,
            encode_transient=True, in_channels_t=48)
    rcfg = RenderConfig(N_samples=n_samples, N_importance=n_importance,
                        perturb=1.0,
                        noise_std=1.0, use_viewdir=True, encode_a=False,
                        encode_t=True, max_t=n_frames - 1, img_wh=(w, h),
                        compute_dtype=dtype, fused_train=fused_train,
                        warp_subsample=warp_subsample,
                        warp_importance=warp_importance)
    # tiny lr: the synthetic random table makes the flow losses huge, and
    # the reference lr diverges to NaN within ~20 steps; NaN params change
    # kernel timing, so keep the numerics sane for the benchmark
    ncfg = NSFFConfig(optimizer="adam", lr=1e-6, lr_scheduler="cosine",
                      num_epochs=50)
    steps_per_epoch = w * h * n_frames // 1000
    tx = make_optimizer(ncfg, steps_per_epoch)
    state = TrainState(params, tx.init(params), jnp.zeros((), jnp.int32))
    lcfg = LossConfig(max_t=n_frames - 1, topk=topk)

    rng = np.random.RandomState(0)
    table = rng.rand(n_frames, w * h, 16).astype(np.float32)
    # NDC-like rays (o_z ~= -1, d_z = 1 - o_z as get_ndc_rays produces for
    # a camera at the near plane) so xyz_z stays in [-1, 1]; fully random
    # rays put samples at xyz_z ~= 1 where ndc2world's 1/(z-1) blows up and
    # inf*exp(-inf) => NaN in the smoothness loss
    table[..., 0:2] = table[..., 0:2] * 2 - 1  # o_xy in [-1, 1]
    table[..., 2] = -1.0 + 0.1 * table[..., 2]  # o_z in [-1, -0.9]
    table[..., 3:5] = (table[..., 3:5] - 0.5) * 0.4  # d_xy small
    table[..., 5] = 1.0 - table[..., 2]  # d_z = 1 - o_z
    table[..., 9] = np.arange(n_frames, dtype=np.float32)[:, None]
    f = 500.0 * w / 960
    Ks = np.array([[[f, 0, w / 2], [0, f, h / 2], [0, 0, 1]]], np.float32)
    Ps = np.tile(np.eye(3, 4, dtype=np.float32), (1, n_frames, 1, 1))

    step = make_train_step(
        rcfg, lcfg, tx,
        output_transient=True, output_transient_flow=("fw", "bw", "disocc"),
        steps_per_epoch=steps_per_epoch, batch_size=batch_size,
        scan_steps=scan_steps, hard_sampling=hard_sampling)
    return step, state, (jnp.asarray(table),
                         jnp.ones((n_frames, w * h), jnp.float32),
                         jnp.asarray(Ks), jnp.asarray(Ps))


def measure(batch_size: int, iters: int = 60, dtype: str = "bfloat16",
            scan_steps: int = 0, warp_subsample: int = 1,
            n_importance: int = 0, warp_importance: float = 0.0,
            hard_sampling: bool = False, topk: float = 1.0):
    """Chained-step throughput. NOTE: on the tunneled (axon) backend
    `block_until_ready` does not reliably await remote execution — a value
    fetch does. We force completion by pulling the final loss, so the
    measurement covers all the chained steps + one scalar round trip.

    Small batches dispatch `scan_steps` train steps per device call
    (lax.scan; per-step semantics unchanged, tests/test_pipeline.py) —
    the trainer exposes the same via --scan_steps. At batch 512 the
    device step is ~8.4 ms but each host round trip costs ~2 ms, a ~20%
    cliff this amortizes away (VERDICT r2 #2)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    if scan_steps <= 0:  # default: ~16k rays per dispatch
        scan_steps = max(1, 16384 // batch_size)
    step, state, (table, weights, Ks, Ps) = build(
        batch_size, dtype=dtype, scan_steps=scan_steps,
        warp_subsample=warp_subsample, n_importance=n_importance,
        warp_importance=warp_importance, hard_sampling=hard_sampling,
        topk=topk)
    key = jax.random.PRNGKey(0)
    # enough dispatches that the single final value-fetch round trip
    # (~30 ms over the tunnel) stays <3% of the measured window
    n_dispatch = max(8, iters // scan_steps) if scan_steps > 1 else iters

    if scan_steps == 1:
        state, m, _ = step(state, table, weights, Ks, Ps, key,
                           jnp.asarray(0))
        float(m["loss"])  # warmup / compile (forced)
        t0 = time.perf_counter()
        for i in range(iters):
            key, k = jax.random.split(key)
            state, m, _ = step(state, table, weights, Ks, Ps, k,
                               jnp.asarray(i % 30))
        loss = float(m["loss"])  # forces the whole chain
        dt = time.perf_counter() - t0
        return batch_size * iters / dt, loss

    # hard_sampling scans write the rendered rgb into the per-pixel
    # buffer (train.py:184-185 semantics) — give it the real shape
    tmp = (jnp.zeros((table.shape[0], table.shape[1], 3))
           if hard_sampling else jnp.zeros((1, 1, 3)))
    ts = jnp.asarray(np.arange(scan_steps) % 30)
    state, tmp, m = step(state, tmp, table, weights, Ks, Ps, key, ts)
    float(m["loss"][-1])  # warmup / compile (forced)
    t0 = time.perf_counter()
    for _ in range(n_dispatch):
        key, k = jax.random.split(key)
        state, tmp, m = step(state, tmp, table, weights, Ks, Ps, k, ts)
    loss = float(m["loss"][-1])
    dt = time.perf_counter() - t0
    return batch_size * scan_steps * n_dispatch / dt, loss


RENDER_GFLOP_PER_RAY = 0.310  # 1-evaluation test path at S=128: one
# static (630,016 MACs/pt) + one transient (582,144 MACs/pt) tower pass,
# 2*(1.212M MACs)*128 samples = 0.310 GFLOP/ray (no backward, no warps;
# counted from the actual (fan_in, fan_out) param shapes)


def measure_render(n_rays: int = 8192, n_samples: int = 128,
                   iters: int = 20) -> float:
    """Test-time full-image render throughput (fused Pallas kernel path)."""
    import jax
    import jax.numpy as jnp

    from nsff_pl_tpu.models import nerf as nerf_m
    from nsff_pl_tpu.models.rendering import RenderConfig, render_rays

    key = jax.random.PRNGKey(0)
    params = {"fine": nerf_m.init_nerf_params(
        key, "fine", use_viewdir=True, encode_transient=True,
        in_channels_t=48, output_flow=True)}
    emb = {"t": nerf_m.init_embedding(key, 30, 48)}
    rays = jnp.concatenate([
        (jax.random.uniform(key, (n_rays, 3)) * 0.5).at[:, 2].set(-1.0),
        (jax.random.uniform(jax.random.PRNGKey(1), (n_rays, 3)) * 0.1)
        .at[:, 2].set(2.0)], -1)
    ts = jnp.zeros((n_rays,), jnp.int32)
    cfg = RenderConfig(N_samples=n_samples, use_viewdir=True, encode_t=True,
                       max_t=29, compute_dtype="bfloat16")
    # chunk loop scanned inside one dispatch — the shape the eval CLI
    # actually runs (training/step.py::render_full_image(scan_chunks=True),
    # round-5 render-floor work)
    G = 8
    rays_g = jnp.stack([rays] * G)
    ts_g = jnp.stack([ts] * G)

    @jax.jit
    def scanned(rays_g, ts_g):
        def body(_, rt):
            # keys=('rgb_fine',): the eval CLI's key filter — routes the
            # planar eval through the composited kernel (compositing
            # in-kernel, one (N, M) maps write; round-5 render-floor work)
            return None, render_rays(
                params, emb, rt[0], rt[1], key, cfg, test_time=True,
                output_transient=True, keys=("rgb_fine",))["rgb_fine"]
        _, outs = jax.lax.scan(body, None, (rays_g, ts_g))
        return outs

    out = scanned(rays_g, ts_g)
    float(jnp.sum(out))
    t0 = time.perf_counter()
    n_disp = max(2, iters // G)
    for _ in range(n_disp):
        out = scanned(rays_g, ts_g)
    float(jnp.sum(out))
    return n_rays * G * n_disp / (time.perf_counter() - t0)


def measure_render_frame(w: int = 512, h: int = 288, chunk: int = 32768,
                         iters: int = 5,
                         output_transient: bool = True) -> float:
    """Seconds per full test-image render (w*h rays) through the SAME
    chunked path `apps/evaluate.py` uses (`make_render_fn` +
    `render_full_image`, eval-default chunk). The reference renders
    full frames via per-chunk `.cpu()` round trips
    (`/root/reference/eval.py:81-110`). `output_transient=False` is the
    eval CLI's default test protocol (static tower only,
    `/root/reference/eval.py:61,140`) — half the tower FLOPs/sample."""
    import jax
    import jax.numpy as jnp

    from nsff_pl_tpu.models import nerf as nerf_m
    from nsff_pl_tpu.models.rendering import RenderConfig
    from nsff_pl_tpu.training.step import make_render_fn, render_full_image

    key = jax.random.PRNGKey(0)
    params = {
        "nerf_fine": nerf_m.init_nerf_params(
            key, "fine", use_viewdir=True, encode_transient=True,
            in_channels_t=48, output_flow=True),
        "embedding_t": nerf_m.init_embedding(key, 30, 48),
    }
    n = w * h
    rays = jnp.concatenate([
        (jax.random.uniform(key, (n, 3)) * 0.5).at[:, 2].set(-1.0),
        (jax.random.uniform(jax.random.PRNGKey(1), (n, 3)) * 0.1)
        .at[:, 2].set(2.0)], -1)
    ts = jnp.zeros((n,), jnp.int32)
    cfg = RenderConfig(N_samples=128, use_viewdir=True, encode_t=True,
                       max_t=29, img_wh=(w, h), compute_dtype="bfloat16")
    render = make_render_fn(cfg, output_transient=output_transient,
                            keys=("rgb_fine", "depth_fine"))
    out = render_full_image(render, params, rays, ts, key, chunk=chunk,
                            scan_chunks=True)
    float(jnp.sum(out["rgb_fine"]))  # warmup / compile (forced)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = render_full_image(render, params, rays, ts, key, chunk=chunk,
                                scan_chunks=True)
    float(jnp.sum(out["rgb_fine"]))
    return (time.perf_counter() - t0) / iters


def _retry(fn, attempts: int = 3, tag: str = ""):
    """The tunneled (axon) backend intermittently fails remote compiles
    with HTTP 500s; retry before giving up so one flake can't zero the
    recorded benchmark."""
    for i in range(attempts):
        try:
            return fn()
        except Exception as e:
            print(f"# {tag} attempt {i+1}/{attempts} failed: "
                  f"{type(e).__name__}", flush=True)
            if i == attempts - 1:
                raise
            time.sleep(5)


def _stage_main(stage: str):
    """Child-process entry: run ONE measurement and print its result as
    the last stdout line (`STAGE_RESULT {...}`)."""
    import warnings

    warnings.filterwarnings("ignore")
    try:  # persistent XLA cache: repeat stages skip the 30s-8min compiles
        from nsff_pl_tpu.utils.jaxcache import enable_compilation_cache
        enable_compilation_cache("/tmp/jaxcache_bench")
    except Exception:
        pass
    if stage == "render":
        rps = _retry(measure_render, tag="render")
        print(f"STAGE_RESULT {json.dumps({'rays_per_sec': rps})}", flush=True)
    elif stage == "render_frame":
        spf = _retry(measure_render_frame, tag="render_frame")
        print(f"STAGE_RESULT {json.dumps({'s_per_frame': spf})}", flush=True)
    elif stage == "render_frame_static":
        spf = _retry(lambda: measure_render_frame(output_transient=False),
                     tag="render_frame_static")
        print(f"STAGE_RESULT {json.dumps({'s_per_frame': spf})}", flush=True)
    elif stage == "interp":
        # full-scale MPI interpolation (512x288, 128 planes, fw+bw
        # average-mode splats — `/root/reference/models/rendering.py:
        # 439-449` semantics) + its bytes-moved roofline floor ledger
        # (VERDICT r4 #8). tools/bench_interp.py builds the measurement;
        # its module globals carry the floor dict + steady-state rate.
        import runpy
        g = _retry(lambda: runpy.run_path(
            os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "tools", "bench_interp.py")), tag="interp")
        print(f"STAGE_RESULT {json.dumps({'s_per_frame': g['steady_s'], 'floor': g['floor']})}",
              flush=True)
    elif stage.startswith("batch:"):
        parts = stage.split(":")
        bs = int(parts[1])
        ws, ni, wi, mining = 1, 0, 0.0, False
        for p in parts[2:]:  # "ws2" / "c2f64" / "wi50" / "mining" suffixes
            if p.startswith("ws"):
                ws = int(p[2:])
            elif p.startswith("c2f"):
                ni = int(p[3:])
            elif p.startswith("wi"):
                wi = int(p[2:]) / 100.0
            elif p == "mining":
                mining = True
        rays_s, loss = _retry(
            lambda: measure(bs, warp_subsample=ws, n_importance=ni,
                            warp_importance=wi, hard_sampling=mining,
                            topk=0.6 if mining else 1.0),
            tag=f"batch={bs} ws={ws} ni={ni} wi={wi} mining={mining}")
        print(f"STAGE_RESULT "
              f"{json.dumps({'rays_per_sec': rays_s, 'loss': loss})}",
              flush=True)
    else:
        raise SystemExit(f"unknown stage {stage!r}")


def _run_stage(stage: str, timeout_s: int = 1500):
    """Run one measurement in a subprocess with a hard timeout.

    The axon tunnel can HANG (not fail) at first device use — e.g. when a
    previous session's grant has not been released — and an in-process
    hang is uninterruptible (the fetch blocks in C). Subprocess isolation
    keeps one wedged stage from zeroing every other measurement; JAX is
    only imported in children, so the parent cannot hang."""
    import subprocess
    import sys

    argv = [sys.executable, os.path.abspath(__file__), "--stage", stage]
    if os.environ.get("NSFF_BENCH_STAGE_CMD"):  # harness self-test hook
        argv = [sys.executable, "-c", os.environ["NSFF_BENCH_STAGE_CMD"]]
    try:
        p = subprocess.run(argv, capture_output=True, text=True,
                           timeout=timeout_s)
    except subprocess.TimeoutExpired:
        print(f"# stage {stage}: TIMED OUT after {timeout_s}s "
              f"(wedged TPU tunnel?)", flush=True)
        return None
    for line in p.stdout.splitlines():
        if not line.startswith("STAGE_RESULT "):
            if line.strip():
                print(line, flush=True)
            continue
        return json.loads(line[len("STAGE_RESULT "):])
    tail = (p.stderr or "").strip().splitlines()
    print(f"# stage {stage}: failed rc={p.returncode} "
          f"({tail[-1][:200] if tail else 'no stderr'})", flush=True)
    return None


def main():
    render_rows = {}
    r = _run_stage("render")
    if r is not None:
        print(f"# render (test-time, pallas auto): "
              f"{r['rays_per_sec']:,.0f} rays/s", flush=True)
        render_rows["render_rays_per_sec"] = round(r["rays_per_sec"], 1)
    r = _run_stage("render_frame")
    if r is not None:
        print(f"# render full 512x288 frame (147,456 rays, eval chunked "
              f"path): {r['s_per_frame']:.3f} s/frame", flush=True)
        render_rows["render_s_per_frame_512x288"] = round(
            r["s_per_frame"], 4)
    r = _run_stage("render_frame_static")
    if r is not None:
        print(f"# render full 512x288 frame, static-only (the eval-CLI "
              f"default protocol): {r['s_per_frame']:.3f} s/frame",
              flush=True)
        render_rows["render_s_per_frame_512x288_static"] = round(
            r["s_per_frame"], 4)
    r = _run_stage("interp")
    if r is not None:
        print(f"# interpolate (512x288x128-plane MPI frame, fw+bw "
              f"splats): {r['s_per_frame']:.3f} s/frame "
              f"({r['floor'].get('pct_of_floor', '?')}% of bytes-moved "
              f"floor)", flush=True)
        render_rows["interp_s_per_frame"] = round(r["s_per_frame"], 4)
        render_rows["interp_floor"] = r["floor"]
    best = 0.0
    best_cfg = None
    rows = {}
    for bs in (512, 2048, 8192):
        r = _run_stage(f"batch:{bs}")
        if r is None:
            continue
        rays_s, loss = r["rays_per_sec"], r["loss"]
        print(f"# batch={bs}: {rays_s:,.0f} rays/s (loss {loss:.3f})",
              flush=True)
        rows[f"batch{bs}_rays_per_sec"] = round(rays_s, 1)
        if rays_s > best:
            best, best_cfg = rays_s, bs
    # --warp_subsample 2: one warp-direction evaluation per ray instead of
    # two (models/raymarch.py; the pho/cyc losses keep the exact batch
    # expectation). OPT-IN, not headline-eligible: the gradient estimator
    # is unbiased but the 50-epoch A/B at reference scale measured
    # -0.50 dB vs the exact path (docs/ROADMAP.md round 4).
    for bs in (512, 8192):
        r = _run_stage(f"batch:{bs}:ws2")
        if r is None:
            continue
        rays_s, loss = r["rays_per_sec"], r["loss"]
        print(f"# batch={bs} warp_subsample=2: {rays_s:,.0f} rays/s "
              f"(loss {loss:.3f})", flush=True)
        rows[f"batch{bs}_ws2_rays_per_sec"] = round(rays_s, 1)
    # --warp_importance 0.5: both warp directions on an importance-drawn
    # half of the rays with unbiased HT loss weighting (same FLOP cut as
    # ws2, keeps the per-ray fw/bw pairing on transient-heavy rays).
    # Learning equivalence vs exact: tools/learning_equiv.py --mode
    # warp_imp (multi-seed A/B; see docs/ROADMAP.md round 5).
    for bs in (512, 8192):
        r = _run_stage(f"batch:{bs}:wi50")
        if r is None:
            continue
        rays_s, loss = r["rays_per_sec"], r["loss"]
        print(f"# batch={bs} warp_importance=0.5: {rays_s:,.0f} rays/s "
              f"(loss {loss:.3f})", flush=True)
        rows[f"batch{bs}_wi50_rays_per_sec"] = round(rays_s, 1)
    # the mining-on recipe (the exact PARITY_RUN config: --hard_sampling
    # + --topk 0.6): device-side weighted 4.4M-entry draw + per-step
    # top-k + the scan's tmp_rgb buffer writes — the machinery the
    # quality numbers train with (`/root/reference/datasets/
    # monocular.py:234-241`, `losses.py:162-169`). The epoch-boundary
    # SSIM refresh is outside the steady-state step and not in this row.
    r = _run_stage("batch:512:mining")
    if r is not None:
        rays_s, loss = r["rays_per_sec"], r["loss"]
        print(f"# batch=512 hard_sampling+topk0.6 (mining recipe): "
              f"{rays_s:,.0f} rays/s (loss {loss:.3f})", flush=True)
        rows["batch512_mining_rays_per_sec"] = round(rays_s, 1)
    # coarse-to-fine (--N_importance 64): the planar envelope covers the
    # PDF-resampled fine pass (S = 128 + 2*64 = 256) since round 4; the
    # step evaluates ~2.3x the flagship FLOPs/ray (coarse dual-tower pass
    # + 3 tower passes at S=256), so this row is NOT the headline — it
    # quantifies the c2f recipe (`rendering.py:326-348` semantics)
    r = _run_stage("batch:512:c2f64")
    if r is not None:
        print(f"# batch=512 N_importance=64 (planar c2f, fine S=256): "
              f"{r['rays_per_sec']:,.0f} rays/s (loss {r['loss']:.3f})",
              flush=True)
        rows["batch512_c2f64_rays_per_sec"] = round(r["rays_per_sec"], 1)
        # c2f floor (VERDICT r4 #4), same ledger as the flagship floor:
        #   coarse dual-tower fwd+bwd at S=128: the coarse model is
        #     1.2122M MACs/pt (counted from param shapes) => fwd
        #     2*1.2122M*128 = 0.3103 GFLOP/ray; the planar train path's
        #     measured total/fwd ratio is 4.155 (recompute-in-bwd + dW +
        #     dX; flagship 2.53 total over 0.609 fwd) => 1.289 GFLOP/ray
        #   fine 3-evaluation fwd+bwd at S=256: the flagship ledger
        #     (2.53 GFLOP/ray at S=128) scaled by S => 5.06 GFLOP/ray
        #   PDF resampling + sort: XLA glue, ~0 MXU FLOPs (excluded)
        c2f_gflop = 6.35
        c2f_floor_rps = 177.8e12 / (c2f_gflop * 1e9)
        out_c2f = {
            "gflop_per_ray": c2f_gflop,
            "chain_rate_tflops": 177.8,
            "floor_rays_per_sec": round(c2f_floor_rps, 1),
            "pct_of_floor": round(
                100 * r["rays_per_sec"] / c2f_floor_rps, 1),
        }
        rows["c2f_floor"] = out_c2f
    # The headline is the best DEFAULT-ELIGIBLE configuration: exact warp
    # semantics (warp_subsample=1, the config.py default). ws2 rows stay
    # in the artifact as a labeled opt-in speed/quality trade — the
    # round-4 50-epoch A/B measured it at -0.50 dB vs exact (14x the
    # seed band; docs/ROADMAP.md round 4), so it is NOT
    # learning-equivalent and must not carry the headline.
    headline, hl_cfg = best, best_cfg
    hl_note = "exact warp semantics"
    # warp_importance=0.5 may carry the headline ONLY with committed
    # multi-seed learning-equivalence evidence at the 30-frame parity
    # scale (VERDICT r4 #1 done-bar: >=3 seeds, 50 epochs, 512x288x30;
    # bar = mean delta >= -0.1 dB, i.e. no quality LOSS vs exact — a
    # positive delta is a win, not a miss; the signed per-seed table is
    # in the evidence object). tools/ab_campaign.py writes the table;
    # docs/AB_WI_30F.json is committed only if the bar is met.
    ab_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "docs", "AB_WI_30F.json")
    if os.path.exists(ab_path):
        try:
            ab = json.load(open(ab_path))
        except Exception:
            ab = None
        wi_rates = [rows.get(f"batch{b}_wi50_rays_per_sec", 0)
                    for b in (512, 8192)]
        if (ab and ab.get("bar_met") and max(wi_rates) > headline):
            headline = max(wi_rates)
            hl_cfg = 512 if wi_rates[0] >= wi_rates[1] else 8192
            hl_note = (
                "warp_importance=0.5 (HT importance-concentrated warp "
                f"estimator; learning-equiv: {ab['n_seeds']}-seed 50-epoch "
                f"A/B at 512x288x30, mean delta {ab['mean_delta_db']:+.3f} "
                "dB vs exact, docs/AB_WI_30F.json)")
    out = {
        "metric": "train_rays_per_sec_per_chip",
        "value": round(headline, 1),
        "unit": f"rays/s (full NSFF train step, batch={hl_cfg}, "
                f"N_samples=128, bf16, planar fused Pallas fwd+bwd kernels, "
                f"scan-dispatched, {hl_note})",
        "vs_baseline": round(headline / BASELINE_A100_RAYS_PER_SEC, 3),
    }
    out.update(rows)
    out.update(render_rows)
    if "render_rays_per_sec" in render_rows:
        # same rigor as the train floor (VERDICT r3 #5): the test path is
        # ONE dual-tower forward per sample, 0.310 GFLOP/ray at S=128
        # (counted from the param shapes, see RENDER_GFLOP_PER_RAY), so
        # the chain-rate floor bounds any implementation of the
        # 1-evaluation test semantics
        rps = render_rows["render_rays_per_sec"]
        floor_rps = 177.8e12 / (RENDER_GFLOP_PER_RAY * 1e9)
        out["render_floor"] = {
            "gflop_per_ray": RENDER_GFLOP_PER_RAY,
            "chain_rate_tflops": 177.8,
            "floor_rays_per_sec": round(floor_rps, 1),
            "pct_of_floor": round(100 * rps / floor_rps, 1),
            # round-5 attribution (tools/probe_render_floor.py, real v5e):
            # the dual-tower eval KERNEL alone scan-dispatches at 86.2%
            # of this floor (494k rays/s; fwd blocks re-swept 4096->2048
            # = +11%, chunk loop scanned in-jit = +4%); the rest is the
            # kernel's 8 (N,S) output-plane writes + per-chunk XLA
            # prelude. Closing it needs compositing inside the raymarch
            # kernel (fewer output planes), not schedule tuning.
            "kernel_only_scan_pct_of_floor": 86.2,
        }
    if not best:
        # value 0 means the TPU was unreachable, not a perf collapse —
        # say so in the recorded artifact (the axon tunnel can wedge at
        # PJRT client init when a previous session's grant is unreleased)
        out["error"] = ("all train stages failed or timed out — TPU "
                        "unreachable (wedged tunnel?); see prior "
                        "BENCH_r*.json for last measured numbers")
        # the most recent REAL v5e measurements of this tree, taken
        # before the outage (reproduction commands in docs/ROADMAP.md
        # round-3 entries) — labeled as such, NOT this run's values
        out["last_measured_v5e"] = {
            "note": "measured on real v5e before the tunnel outage "
                    "(docs/ROADMAP.md 'Done (round 3)'); this run could "
                    "not reach the TPU",
            "batch8192_rays_per_sec": 64100.0,
            "batch512_rays_per_sec": 60300.0,
            "train_py_end_to_end_batch512_rays_per_sec": 58100.0,
            "vs_baseline": 4.27,
            "interp_s_per_frame": 0.36,
        }
    # speed-of-light context (measured in docs/ARCHITECTURE.md; VERDICT r2
    # asked for the floor + baseline derivation to ride with the number):
    # the step's per-ray work is fixed by the reference's 3x-evaluation
    # algorithm (models/rendering.py:169-229 there), so the kernels-only
    # FLOP floor bounds any implementation of the same semantics.
    if best:
        out["floor"] = {
            "chain_rate_tflops": 177.8,  # measured 256-wide bf16 matmul
            # chain on this v5e (bf16 peak 197)
            "step_flops_per_ray_gflop": 2.53,  # 3 tower evals fwd +
            # (recompute + dW + dh) bwd at S=128; ~20.7 TFLOP at batch 8192
            "kernel_floor_ms_batch8192": 121.0,  # kernels-only floor incl.
            # in-kernel plane bridges (docs/ARCHITECTURE.md profile)
            "a100_baseline_rays_per_sec": BASELINE_A100_RAYS_PER_SEC,
            "a100_baseline_derivation": (
                "reference publishes no throughput numbers (BASELINE.md); "
                "estimate: ~1.6 GFLOP/ray fwd+bwd at 15% TF32 MFU on A100 "
                "for the reference's chunked torch pipeline => ~15k rays/s "
                "(2080Ti anecdotes run 2-4k)"),
        }
        # floor comparison only makes sense at the batch the floor was
        # profiled at — omit rather than mislabel if that stage failed
        if "batch8192_rays_per_sec" in rows:
            dev_ms = 8192 / rows["batch8192_rays_per_sec"] * 1000
            out["floor"]["measured_device_ms_batch8192"] = round(dev_ms, 1)
            out["floor"]["pct_of_kernel_floor"] = round(
                100 * 121.0 / dev_ms, 1)
        if "batch8192_ws2_rays_per_sec" in rows:
            # warp_subsample=2 removes one transient warp pass; its share
            # of the 121 ms kernels-only floor is the measured warp
            # fwd+bwd kernel floor (8.3 + 22.6 ms at ~95% chain rate,
            # docs/ARCHITECTURE.md profile) => ~91.6 ms floor, ~1.92
            # GFLOP/ray
            dev_ms = 8192 / rows["batch8192_ws2_rays_per_sec"] * 1000
            out["floor"]["ws2_step_flops_per_ray_gflop"] = 1.92
            out["floor"]["ws2_kernel_floor_ms_batch8192"] = 91.6
            out["floor"]["ws2_measured_device_ms_batch8192"] = round(
                dev_ms, 1)
            out["floor"]["ws2_pct_of_kernel_floor"] = round(
                100 * 91.6 / dev_ms, 1)
    print(json.dumps(out))


if __name__ == "__main__":
    import sys

    if len(sys.argv) >= 3 and sys.argv[1] == "--stage":
        _stage_main(sys.argv[2])
    else:
        main()
