"""Training orchestration — the reference's `NSFFSystem` + Lightning
`Trainer` (`train.py:35-303`) as a plain loop around one jitted step.

Responsibilities mapped from the reference:
- model/embedding construction + partial weight loading (train.py:46-92)
- per-epoch lambda_geo decay (train.py:174-176) — folded into the loss
  (it depends only on `epoch = step // steps_per_epoch`)
- training step + scalar logging (train.py:178-198)
- validation on the middle frame with image grids (train.py:200-259)
- hard-example mining: tmp_rgb buffer + SSIM-derived sampling weights
  (train.py:140-143,184-185,246-257)
- per-epoch checkpoints incl. optimizer state AND sampling weights — the
  reference forgets the latter (monocular.py:235 TODO)
"""
from __future__ import annotations

import os
import time
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from nsff_pl_tpu.config import NSFFConfig
from nsff_pl_tpu.data.pipeline import FrameScheduler, RayBatcher
from nsff_pl_tpu.models import nerf as nerf_m
from nsff_pl_tpu.models.rendering import RenderConfig
from nsff_pl_tpu.scene import scene_dict
from nsff_pl_tpu.training import checkpoint as ckpt_lib
from nsff_pl_tpu.training import metrics as metrics_lib
from nsff_pl_tpu.training.loss import LossConfig
from nsff_pl_tpu.training.optim import make_optimizer
from nsff_pl_tpu.training.step import (TrainState, make_render_fn,
                                       make_train_step, render_full_image)
from nsff_pl_tpu.utils import visualization as viz


class TensorBoardLogger:
    """Thin wrapper over torch's SummaryWriter (the reference logs through
    TestTubeLogger -> TensorBoard, `train.py:282-286`); falls back to a
    JSONL file when tensorboard is unavailable."""

    def __init__(self, log_dir: str):
        os.makedirs(log_dir, exist_ok=True)
        try:
            from torch.utils.tensorboard import SummaryWriter

            self.writer = SummaryWriter(log_dir)
        except Exception:
            self.writer = None
        self.jsonl = open(os.path.join(log_dir, "metrics.jsonl"), "a")

    def scalar(self, tag: str, value, step: int, jsonl: bool = True):
        v = float(value)
        if self.writer is not None:
            self.writer.add_scalar(tag, v, step)
        if jsonl:
            self.jsonl.write(f'{{"step": {step}, "{tag}": {v}}}\n')

    def row_jsonl(self, metrics: dict, step: int):
        """Per-step metrics to the JSONL only (no TensorBoard): one
        buffered file write. The reference's Lightning logger emits ONE
        TB point per log_every_n_steps=50 window (train.py:282-286
        defaults), and `SummaryWriter.add_scalar` costs ~1 ms each — at
        13 metrics x 50 steps per window that throttled training ~25%."""
        vals = ", ".join(f'"{t}": {float(v)}' for t, v in metrics.items())
        self.jsonl.write(f'{{"step": {step}, {vals}}}\n')

    def image(self, tag: str, img_hwc: np.ndarray, step: int):
        if self.writer is not None:
            self.writer.add_image(tag, np.asarray(img_hwc), step,
                                  dataformats="HWC")

    def flush(self):
        if self.writer is not None:
            self.writer.flush()
        self.jsonl.flush()


class _NullLogger:
    """Logger for non-primary processes: every sink is a no-op."""

    def scalar(self, *a, **k):
        pass

    def row_jsonl(self, *a, **k):
        pass

    def image(self, *a, **k):
        pass

    def flush(self):
        pass


def build_params(cfg: NSFFConfig, rng) -> Dict:
    """Initialize the full parameter pytree (train.py:46-92)."""
    keys = jax.random.split(rng, 4)
    flow = cfg.output_transient_flow
    params = {
        "nerf_fine": nerf_m.init_nerf_params(
            keys[0], "fine",
            in_channels_xyz=cfg.in_channels_xyz,
            use_viewdir=cfg.use_viewdir,
            in_channels_dir=cfg.in_channels_dir,
            encode_appearance=cfg.encode_a, in_channels_a=cfg.N_a,
            encode_transient=cfg.encode_t, in_channels_t=cfg.N_tau,
            output_flow=len(flow) > 0)
    }
    if cfg.N_importance > 0:
        params["nerf_coarse"] = nerf_m.init_nerf_params(
            keys[1], "coarse",
            in_channels_xyz=cfg.in_channels_xyz,
            use_viewdir=cfg.use_viewdir,
            in_channels_dir=cfg.in_channels_dir,
            encode_transient=cfg.encode_t, in_channels_t=cfg.N_tau)
    if cfg.encode_a:
        params["embedding_a"] = nerf_m.init_embedding(keys[2], cfg.N_frames,
                                                      cfg.N_a)
    if cfg.encode_t:
        params["embedding_t"] = nerf_m.init_embedding(keys[3], cfg.N_frames,
                                                      cfg.N_tau)
    return params


def render_config(cfg: NSFFConfig) -> RenderConfig:
    return RenderConfig(
        N_samples=cfg.N_samples, N_importance=cfg.N_importance,
        perturb=cfg.perturb, noise_std=cfg.noise_std,
        use_viewdir=cfg.use_viewdir, encode_a=cfg.encode_a,
        encode_t=cfg.encode_t, flow_scale=cfg.flow_scale,
        max_t=cfg.N_frames - 1,
        N_emb_xyz=cfg.N_emb_xyz, S_emb_xyz=cfg.S_emb_xyz,
        N_emb_dir=cfg.N_emb_dir, S_emb_dir=cfg.S_emb_dir,
        img_wh=tuple(cfg.img_wh), compute_dtype=cfg.dtype,
        mlp_backend=cfg.mlp_backend, train_backend=cfg.train_backend,
        fused_train=cfg.fused_train, N_tau=cfg.N_tau, N_a=cfg.N_a,
        warp_subsample=cfg.warp_subsample,
        warp_importance=cfg.warp_importance, planar_eval=cfg.planar_eval)


class NSFFSystem:
    """End-to-end training system."""

    def __init__(self, cfg: NSFFConfig, mesh=None):
        self.cfg = cfg
        self.mesh = mesh
        self.rng = jax.random.PRNGKey(cfg.seed)

        scene_cls = scene_dict[cfg.dataset_name]
        kwargs = dict(root_dir=cfg.root_dir, img_wh=tuple(cfg.img_wh),
                      start_end=tuple(cfg.start_end),
                      cache_dir=cfg.cache_dir or None,
                      hard_sampling=cfg.hard_sampling)
        self.train_scene = scene_cls(split="train", **kwargs)
        self.val_scene = scene_cls(split="val", **kwargs)
        # frame count may have been clamped by available files
        if self.train_scene.N_frames != cfg.N_frames:
            cfg = cfg.replace(start_end=(cfg.start_end[0],
                                         cfg.start_end[0]
                                         + self.train_scene.N_frames))
            self.cfg = cfg

        self.steps_per_epoch = len(self.train_scene)
        self.total_steps = self.steps_per_epoch * cfg.num_epochs

        self.render_cfg = render_config(cfg)
        self.loss_cfg = LossConfig(
            lambda_geo_init=cfg.lambda_geo_init, thickness=cfg.thickness,
            topk=cfg.topk, max_t=cfg.N_frames - 1)

        # params (+ optional warm start, train.py:55-59,76-77,87-88)
        self.rng, k = jax.random.split(self.rng)
        params = build_params(cfg, k)
        if cfg.weight_path:
            loaded = self._load_weights(cfg.weight_path)
            params = ckpt_lib.merge_params(params, loaded)
        self.tx = make_optimizer(cfg, self.steps_per_epoch)
        from nsff_pl_tpu.training.optim import make_lr_schedule

        self.lr_schedule = make_lr_schedule(cfg, self.steps_per_epoch)
        self.state = TrainState(params, self.tx.init(params),
                                jnp.zeros((), jnp.int32))

        # device-side data
        self.batcher = RayBatcher(self.train_scene.rays, cfg.batch_size,
                                  hard_sampling=cfg.hard_sampling)
        self.scheduler = FrameScheduler(cfg.N_frames, seed=cfg.seed)
        self.Ks = jnp.asarray(self.train_scene.Ks)
        self.Ps = jnp.asarray(self.train_scene.Ps)

        # multi-process: every persistent device operand becomes a GLOBAL
        # fully-replicated array over the mesh (process-local arrays can't
        # cross into the multi-host SPMD program; parallel/distributed.py).
        # Each process built identical values from the same seed/files.
        from nsff_pl_tpu.parallel import distributed as dist

        self._dist = dist
        self._multiprocess = dist.multiprocess()
        if self._multiprocess:
            assert mesh is not None, \
                "multi-process training requires the global mesh"
            (self.state, self.Ks, self.Ps, self.batcher.table,
             self.batcher.weights) = dist.replicate(
                (self.state, self.Ks, self.Ps, self.batcher.table,
                 self.batcher.weights), mesh)

        flow = tuple(cfg.output_transient_flow)
        self._step_kwargs = dict(
            output_transient=cfg.output_transient,
            output_transient_flow=flow,
            steps_per_epoch=self.steps_per_epoch,
            batch_size=cfg.batch_size,
            hard_sampling=cfg.hard_sampling,
            mesh=mesh)
        # K-step dispatch (scan_steps > 1) amortizes per-step host
        # round trips; profiling wants per-step dispatch boundaries
        self.scan_steps = max(cfg.scan_steps, 1) if not cfg.profile_dir \
            else 1
        self.train_step = make_train_step(
            self.render_cfg, self.loss_cfg, self.tx,
            scan_steps=self.scan_steps, **self._step_kwargs)
        self._single_step = self.train_step if self.scan_steps == 1 \
            else None  # built lazily for remainder groups
        self.val_render = make_render_fn(
            self.render_cfg, test_time=True,
            output_transient=cfg.output_transient,
            output_transient_flow=(),
            keys=("rgb_fine", "depth_fine", "transient_alpha_fine",
                  "_static_rgb_fine", "_static_depth_fine"),
            mesh=mesh)

        # process 0 owns the side effects (the reference's Lightning
        # loggers are rank-zero-only too)
        self.logger = TensorBoardLogger(
            os.path.join(cfg.log_dir, cfg.exp_name)) \
            if self._dist.is_primary() else _NullLogger()
        self.ckpt_dir = os.path.join(cfg.ckpt_dir, cfg.exp_name)

        if cfg.hard_sampling:
            w, h = cfg.img_wh
            self.tmp_rgb = jnp.zeros((cfg.N_frames, h * w, 3))
            if self._multiprocess:
                self.tmp_rgb = self._dist.replicate(self.tmp_rgb, mesh)

        if cfg.ckpt_path:  # full resume (train.py:290)
            self.restore(cfg.ckpt_path)

    # ------------------------------------------------------------------
    def _load_weights(self, path: str):
        if path.endswith(".ckpt"):
            return ckpt_lib.import_pl_checkpoint(
                path, self.cfg.prefixes_to_ignore)
        abstract = {"params": self.state.params} if hasattr(self, "state") \
            else None
        loaded = ckpt_lib.restore_checkpoint(path, abstract)
        return loaded["params"]

    def restore(self, path: str):
        abstract = {"state": self.state,
                    "sampling_weights": np.asarray(self.batcher.weights)}
        restored = ckpt_lib.restore_checkpoint(path, abstract)
        self.state = TrainState(*restored["state"])
        weights = restored["sampling_weights"]
        self.batcher.weights = self._dist.replicate(weights, self.mesh) \
            if self._multiprocess else jnp.asarray(weights)

    def save(self):
        """Checkpoint state + sampling weights; echo the config next to it
        (the reference pickles hparams into the ckpt, train.py:38)."""
        import dataclasses
        import json

        step = int(self.state.step)
        # every process calls save — Orbax coordinates multi-host writes
        # (the primary persists replicated arrays, all ranks barrier)
        path = ckpt_lib.save_checkpoint(
            self.ckpt_dir, step,
            {"state": self.state,
             "sampling_weights": np.asarray(self.batcher.weights)})
        if self._dist.is_primary():
            with open(os.path.join(self.ckpt_dir, "config.json"), "w") as f:
                json.dump(dataclasses.asdict(self.cfg), f, indent=2,
                          default=str)
        return path

    def _remainder_step(self):
        """Single-step variant for groups clipped by a boundary (only ever
        compiled when scan_steps doesn't divide an epoch / val cadence)."""
        if self._single_step is None:
            self._single_step = make_train_step(
                self.render_cfg, self.loss_cfg, self.tx,
                scan_steps=1, **self._step_kwargs)
        return self._single_step

    def _tb_points(self, rows):
        """TensorBoard points for fetched train-metrics rows — the
        reference's Lightning log_every_n_steps cadence (train.py:282);
        per-step rows go to the JSONL instead. The lr values (device
        scalars on an accelerator) are pulled in ONE fetch so a flush
        costs a single extra round trip, not one per point."""
        lrs = jax.device_get([self.lr_schedule(s) for _, s in rows])
        for (row, at_step), lr in zip(rows, lrs):
            for name, v in row.items():
                self.logger.scalar(f"train/{name}", float(v), at_step,
                                   jsonl=False)
            # lr taxonomy parity (train.py:193)
            self.logger.scalar("lr", float(lr), at_step)

    # ------------------------------------------------------------------
    def fit(self, log_every: int = 50, progress: bool = True):
        """The training loop (Trainer.fit, train.py:303).

        Steps run in groups of `scan_steps` per device dispatch (one
        lax.scan program; identical per-step semantics), clipped so a
        group never crosses an epoch end / validation boundary."""
        cfg = self.cfg
        start_step = int(self.state.step)
        # pending log rows: (first_step, n_steps, metrics) where metrics
        # values are (n,)-stacked for grouped dispatches, scalars for n=1
        pending = []
        n_pending = 0
        # `ready` holds a full fetch window whose device_get is deferred
        # until right AFTER the next group is dispatched: the fetch (a
        # ~50 ms round trip over a tunneled backend) and the JSONL/TB
        # row processing then overlap with the in-flight group instead
        # of idling the device (VERDICT r3 #7). TB points re-emit at the
        # reference's log_every cadence (Lightning log_every_n_steps,
        # train.py:282) from the fetched rows; the JSONL still gets
        # every step.
        ready = []
        fetch_every = max(log_every, 8 * self.scan_steps)

        def drain(rows, at_step):
            nonlocal t0
            if not rows:
                return
            fetched = jax.device_get([m for *_, m in rows])
            last = None
            tb_rows = []
            for (s0, n, _), m in zip(rows, fetched):
                for i in range(n):
                    row = {name: (v[i] if n > 1 else v)
                           for name, v in m.items()}
                    self.logger.row_jsonl(
                        {f"train/{k}": v for k, v in row.items()}, s0 + i)
                    last = row
                    if (s0 + i) % log_every == log_every - 1:
                        tb_rows.append((row, s0 + i))
            if at_step == self.total_steps and not tb_rows:
                # short runs / trailing windows still get a point
                tb_rows.append((last, at_step - 1))
            self._tb_points(tb_rows)
            if progress and self._dist.is_primary():
                dt = time.time() - t0
                n_rows = sum(n for _, n, _ in rows)
                rays_s = cfg.batch_size * n_rows / max(dt, 1e-9)
                print(f"step {at_step}/{self.total_steps} "
                      f"loss={float(last['loss']):.4f} "
                      f"psnr={float(last['psnr']):.2f} "
                      f"({rays_s:,.0f} rays/s)", flush=True)
            t0 = time.time()
        t0 = time.time()
        t_fit0 = time.time()
        profiling = False
        tmp_dummy = jnp.zeros((1, 1, 3))  # carried (donated) when
        # hard_sampling is off; the scan threads it through untouched
        if self._multiprocess:
            tmp_dummy = self._dist.replicate(tmp_dummy, self.mesh)
        # per-dispatch operands must be host (numpy) values under a
        # multi-process mesh so pjit treats them as replicated global
        # values; single-process keeps device arrays (no sync point)
        as_operand = self._dist.host_array if self._multiprocess \
            else (lambda x: x)
        step = start_step
        while step < self.total_steps:
            if cfg.profile_dir:  # jax.profiler trace of steps 10-15
                # (scan_steps is forced to 1 while profiling)
                if step == start_step + 10 and not profiling:
                    jax.profiler.start_trace(cfg.profile_dir)
                    profiling = True
                elif step >= start_step + 15 and profiling:
                    jax.profiler.stop_trace()
                    profiling = False
                    print(f"profile trace written to {cfg.profile_dir}",
                          flush=True)
            # group size: never cross total/epoch/validation boundaries
            g = min(self.scan_steps, self.total_steps - step)
            g = min(g, self.steps_per_epoch - step % self.steps_per_epoch)
            if cfg.val_every_steps > 0:
                g = min(g, cfg.val_every_steps - step % cfg.val_every_steps)
            self.rng, k = jax.random.split(self.rng)
            if g == self.scan_steps and g > 1:
                ts = np.fromiter(
                    (self.scheduler.next() for _ in range(g)), np.int32, g)
                tmp = self.tmp_rgb if cfg.hard_sampling else tmp_dummy
                self.state, tmp, metrics = self.train_step(
                    self.state, tmp, self.batcher.table,
                    self.batcher.weights, self.Ks, self.Ps, as_operand(k),
                    ts)
                if cfg.hard_sampling:
                    self.tmp_rgb = tmp
                else:
                    tmp_dummy = tmp  # the input buffer was donated
                pending.append((step, g, metrics))
            else:
                single = self.train_step if self.scan_steps == 1 \
                    else self._remainder_step()
                for i in range(g):
                    if i > 0:
                        self.rng, k = jax.random.split(self.rng)
                    t = self.scheduler.next()
                    self.state, metrics, aux = single(
                        self.state, self.batcher.table,
                        self.batcher.weights, self.Ks, self.Ps,
                        as_operand(k), np.int32(t))
                    if cfg.hard_sampling:
                        self.tmp_rgb = self.tmp_rgb.at[
                            aux["t"], aux["rand_idx"]].set(aux["rgb_fine"])
                    pending.append((step + i, 1, metrics))
            step += g
            n_pending += g

            if ready:
                # fetch the previous window while the group dispatched
                # above is still executing (one bulk device_get instead
                # of per-scalar fetches — each fetch is a full round
                # trip on a tunneled backend)
                drain(ready, step - g)
                ready = []
            if step == self.total_steps:
                drain(pending, step)  # nothing left to overlap with
                pending = []
                n_pending = 0
            elif n_pending >= fetch_every:
                ready = pending  # device_get right after the next dispatch
                pending = []
                n_pending = 0

            # validation cadence: every val_every_steps steps when set,
            # otherwise once per epoch (the reference's Lightning default)
            if cfg.val_every_steps > 0 and step % cfg.val_every_steps == 0:
                self.validate(step / self.steps_per_epoch)
            if step % self.steps_per_epoch == 0:
                epoch = step // self.steps_per_epoch
                if cfg.val_every_steps <= 0:
                    self.validate(epoch)
                self.save()
            if (cfg.time_budget_s > 0 and step < self.total_steps
                    and time.time() - t_fit0 > cfg.time_budget_s):
                # clean time-boxed exit: drain the metric pipeline,
                # checkpoint, and return — resumable via --ckpt_path
                drain(ready + pending, step)
                ready, pending, n_pending = [], [], 0
                if step % self.steps_per_epoch != 0:  # epoch end saved above
                    self.save()
                if progress and self._dist.is_primary():
                    print(f"time budget ({cfg.time_budget_s:.0f}s) reached "
                          f"at step {step}/{self.total_steps}; "
                          f"checkpointed and exiting cleanly", flush=True)
                break
        if profiling:  # loop shorter than the trace window
            jax.profiler.stop_trace()
        self.logger.flush()
        return self.state

    # ------------------------------------------------------------------
    def validate(self, epoch: int) -> Dict[str, float]:
        """Validation on the middle frame + TB image grids
        (train.py:200-259)."""
        cfg = self.cfg
        w, h = cfg.img_wh
        item = self.val_scene.test_item(0)
        if self._multiprocess:
            # host arrays cross into the multi-process render as
            # replicated global values (render_full_image keeps numpy
            # chunks numpy)
            rays, ts = np.asarray(item["rays"]), np.asarray(item["ts"])
        else:
            rays, ts = jnp.asarray(item["rays"]), jnp.asarray(item["ts"])
        self.rng, k = jax.random.split(self.rng)
        chunk = min(max(cfg.chunk // 4, 1024), rays.shape[0])
        if self.mesh is not None:  # chunks shard over the mesh's chips
            n = self.mesh.devices.size
            chunk = max(n, chunk - chunk % n)
        if self._multiprocess:
            k = self._dist.host_array(k)
        out = render_full_image(self.val_render, self.state.params, rays, ts,
                                k, chunk=chunk)
        step = int(self.state.step)

        img = np.clip(np.asarray(out["rgb_fine"]).reshape(h, w, 3), 0, 1)
        img_gt = np.asarray(item["rgbs"]).reshape(h, w, 3)
        mask = np.asarray(item["mask"]).reshape(h, w)

        rmse_map = np.sqrt(((img_gt - img) ** 2).mean(-1))
        ssim_full = np.asarray(metrics_lib.ssim(
            jnp.asarray(img_gt), jnp.asarray(img), reduction="none"))
        ssim_pix = ssim_full.mean(-1)

        log = {
            "psnr": float(metrics_lib.psnr(jnp.asarray(img_gt),
                                           jnp.asarray(img))),
            "ssim": float(ssim_pix.mean()),
        }
        if cfg.output_transient and (mask == 0).any():
            vm = jnp.asarray(mask == 0)
            log["psnr_mask"] = float(metrics_lib.psnr(
                jnp.asarray(img_gt), jnp.asarray(img), vm))
            log["ssim_mask"] = float(ssim_pix[mask == 0].mean())

        for name, v in log.items():
            self.logger.scalar(f"val/{name}", v, step)

        # decomposition grid (train.py:225-233)
        imgs = [img_gt, img, viz.visualize_depth(
            np.asarray(out["depth_fine"]).reshape(h, w))]
        if cfg.output_transient:
            imgs.append(viz.visualize_mask(
                np.asarray(out["transient_alpha_fine"]).reshape(h, w)))
            imgs.append(np.clip(
                np.asarray(out["_static_rgb_fine"]).reshape(h, w, 3), 0, 1))
            imgs.append(viz.visualize_depth(
                np.asarray(out["_static_depth_fine"]).reshape(h, w)))
        imgs.append(viz.visualize_mask(1 - mask))
        imgs.append(viz.visualize_depth(-np.asarray(item["disp"]).reshape(h, w)))
        self.logger.image("reconstruction/decomposition",
                          viz.make_grid(imgs, nrow=3), step)
        self.logger.image("error_map/rmse",
                          viz.blend_images(img, viz.visualize_depth(-rmse_map),
                                           0.5), step)
        self.logger.image("error_map/ssim",
                          viz.blend_images(img, viz.visualize_depth(-ssim_pix),
                                           0.5), step)

        # hard-sampling weight refresh from the training-render buffer
        # (train.py:246-257): weight = 1 - SSIM(tmp_rgb, gt)
        if cfg.hard_sampling:
            gt_all = self.train_scene.rays[:, :, 6:9]  # (N, h*w, 3)
            tmp = np.asarray(self.tmp_rgb)
            for i in range(cfg.N_frames):
                sm = np.asarray(metrics_lib.ssim(
                    jnp.asarray(gt_all[i].reshape(h, w, 3)),
                    jnp.asarray(np.clip(tmp[i].reshape(h, w, 3), 0, 1)),
                    reduction="none")).mean(-1)
                self.batcher.update_weights(i, (1 - sm).reshape(-1))
            mid = cfg.N_frames // 2
            blend = viz.blend_images(
                np.clip(tmp[mid].reshape(h, w, 3), 0, 1),
                viz.visualize_depth(-np.asarray(metrics_lib.ssim(
                    jnp.asarray(gt_all[mid].reshape(h, w, 3)),
                    jnp.asarray(np.clip(tmp[mid].reshape(h, w, 3), 0, 1)),
                    reduction="none")).mean(-1)), 0.5)
            self.logger.image("misc/moving_ssim", blend, step)

        self.logger.flush()
        if self._dist.is_primary():
            print(f"epoch {epoch}: " + " ".join(
                f"val/{k}={v:.4f}" for k, v in log.items()), flush=True)
        return log
