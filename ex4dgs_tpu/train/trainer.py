"""Host-side training loop — the reference's train.py:42-282 rebuilt around a
jitted device step.

Division of labor:
  * every-step work (render, loss, backward, RAdam, stat accumulation) is one
    jitted graph (train/step.py) with traced timestamp/iteration/duration —
    no recompiles across the whole schedule;
  * rare events (densify/prune/extract/expand, checkpointing) pull the state
    to host (models/density.py), run in numpy, and push back with bucketed
    capacities (a capacity change is the only recompile trigger);
  * images stream through a threaded prefetcher overlapping decode with the
    device step.
"""
from __future__ import annotations

import os
import random
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..data.scene import ImagePrefetcher, Scene
from ..io.checkpoint import save_checkpoint
from ..kernel_config import KernelConfig, configure as configure_kernel, current as current_kernel
from ..io.model_ply import save_model_ply
from ..models import density as D
from ..models.config import ModelConfig, OptimizationConfig
from ..models.state import GaussianModel, create_from_pcd, round_capacity
from ..models.optimizer import RAdamState, init_state
from ..rendering import default_capacity
from .step import StepOutputs, StepStatics, train_step


class ErrorTracker:
    """Per-timestamp-window loss bookkeeping
    (c_gaussian_model.py:1299-1328)."""

    def __init__(self, interval: int):
        self.interval = interval
        self.errors: dict[int, tuple[float, int]] = {}

    def mark(self, loss: float, timestamp: float) -> None:
        t_idx = int(timestamp // self.interval)
        s, c = self.errors.get(t_idx, (0.0, 0))
        self.errors[t_idx] = (s + loss, c + 1)

    def pop_worst(self):
        if not self.errors:
            return None
        max_count = max(c for _, c in self.errors.values())
        best_idx, best_loss = None, 0.0
        for t_idx, (s, c) in self.errors.items():
            if s / c > best_loss and c > max_count * 0.1:
                best_loss = s / c
                best_idx = t_idx
        if best_idx is None or best_loss == 0.0:
            return None
        del self.errors[best_idx]
        return (best_idx + 0.5) * self.interval


class Trainer:
    def __init__(
        self,
        cfg: ModelConfig,
        opt: OptimizationConfig,
        scene: Scene,
        model: GaussianModel | None = None,
        opt_state: RAdamState | None = None,
        seed: int = 0,
        capacity: int | None = None,
        max_per_tile: int | None = None,
        backend: str | None = None,
        log_every: int = 50,
        mesh=None,
        test_iterations: tuple = (),
        metrics_path: str | None = None,
        debug_snapshot_dir: str | None = None,
        kernel: "KernelConfig | None" = None,
        gui=None,
    ):
        """mesh: optional jax.sharding.Mesh with (data, gauss) axes — enables
        the SPMD step (parallel/step_dp.py): `data` cameras are consumed per
        iteration with pmean'd gradients, the per-Gaussian preprocess is
        sharded over `gauss`. The reference is strictly single-GPU; with
        data=1, gauss=1 this reproduces it exactly."""
        self.cfg = cfg
        self.opt = opt
        self.scene = scene
        self.rng = np.random.default_rng(seed)
        self.pyrng = random.Random(seed)
        self.log_every = log_every

        if model is None:
            pc = scene.info.point_cloud
            model = create_from_pcd(
                pc.points, pc.colors, cfg,
                duration=max(cfg.start_duration, 1),
            )
        self.model = model
        self.opt_state = opt_state if opt_state is not None else init_state(model.params)
        self.error_tracker = ErrorTracker(cfg.time_interval)
        self.prefetcher = ImagePrefetcher()

        cam0 = scene.train_cameras[0] if scene.train_cameras else None
        w = cam0.width if cam0 else 128
        h = cam0.height if cam0 else 128
        n_pts = model.static_capacity + model.dynamic_capacity
        self.capacity = capacity or default_capacity(n_pts, w, h)
        # bound the portable path's per-tile sweep; the pallas path walks true
        # per-tile lengths and ignores this
        self.max_per_tile = max_per_tile if max_per_tile is not None else min(
            self.capacity, 4096)
        self.backend = backend
        # Kernel knobs: validate + install up front so a misconfiguration
        # fails here with a message, not inside Mosaic (VERDICT r2 #5).
        self.kernel = configure_kernel(kernel) if kernel is not None else (
            current_kernel())
        self.overflow_count = 0
        self.mesh = mesh
        self._sharded_step = None
        self._sharded_statics = None
        self.test_iterations = set(test_iterations)
        self._metrics_file = open(metrics_path, "a") if metrics_path else None
        self.debug_snapshot_dir = debug_snapshot_dir
        # Optional live network viewer (viewer.NetworkViewer), polled once per
        # iteration like the reference's network_gui hook (train.py:93-106).
        self.gui = gui

        # schedule state (train.py:77-86)
        self.sample_len = float(cfg.start_duration)
        self.mark_extract = False
        self.need_extract = True
        self.mark_last = False
        self.prune_inv = False
        self.e_count = opt.extract_every
        self.iteration = 0
        self.last_vis: np.ndarray | None = None

        scene.apply_timepad(cfg.time_pad, cfg.time_pad_type)
        scene.set_sampling_len(cfg.start_duration, sample_every=cfg.sample_every)
        # Keyframe capacity for the FULL scene duration up front: progressive
        # growth then never reshapes the motion arrays (a reshape = a full
        # step recompile, minutes on the remote TPU compile service).
        from ..models.state import required_keyframes

        self._kf_floor = required_keyframes(
            scene.duration + cfg.time_shift, cfg)
        self._host_event(lambda hm: D.expand_duration(hm, cfg, cfg.start_duration))

    # ------------------------------------------------------------------
    def _statics(self) -> StepStatics:
        return StepStatics(
            cfg=self.cfg,
            opt=self.opt,
            spatial_lr_scale=self.scene.cameras_extent,
            capacity=self.capacity,
            max_per_tile=self.max_per_tile,
            backend=self.backend,
            kernel=self.kernel,
        )

    def _get_sharded_step(self, statics: StepStatics):
        if self._sharded_step is None or self._sharded_statics != statics:
            from ..parallel.step_dp import make_sharded_train_step

            self._sharded_step = make_sharded_train_step(statics, self.mesh)
            self._sharded_statics = statics
        return self._sharded_step

    def _host_event(self, fn) -> None:
        """Pull -> mutate on host -> push with bucketed capacities.

        Capacity policy minimizes recompiles (each capacity change retraces
        the whole step, and this stack's remote TPU compile costs minutes):
        static capacity grows GEOMETRICALLY (at least 2x) when exceeded, and
        keyframe capacity is pre-allocated for the full scene duration at
        construction (see __init__) so progressive duration growth never
        reshapes the motion arrays — padding keyframes are masked by
        keyframe_num exactly like padding rows."""
        hm = D.pull(self.model, self.opt_state)
        fn(hm)
        sc = self.model.static_capacity
        if round_capacity(hm.n_static) > sc:
            sc = max(round_capacity(hm.n_static), round_capacity(2 * sc))
        # shrink if utilization dropped far below capacity
        if hm.n_static < self.model.static_capacity // 4:
            sc = round_capacity(hm.n_static)
        dc = self.model.dynamic_capacity
        if hm.n_dynamic > dc:
            dc = max(round_capacity(hm.n_dynamic, 1024),
                     round_capacity(2 * dc, 1024) if dc else 0)
        kf_needed = max(hm.keyframe_num, hm.params["motion_xyz"].shape[1],
                        self._kf_floor)
        self.model, self.opt_state = D.push(
            hm, self.cfg, static_capacity=sc, dynamic_capacity=dc,
            keyframe_capacity=kf_needed,
        )

    # ------------------------------------------------------------------
    def train(self, iterations: int | None = None, progress=None) -> dict:
        """Run the training loop.

        The loop is PIPELINED one step deep (EX4DGS_PIPELINE=0 disables):
        step k+1 is dispatched before step k's scalars (loss / psnr /
        binning_total / nan_flag) are pulled to host, so the per-iteration
        device->host sync — a full round trip through the remote TPU tunnel,
        which dominated quality-run wall time (0.6 s/iter at a 0.03 s/step
        bench cost, _r4c_chain3.log) — overlaps the next step's device
        compute instead of serializing with it. Semantics vs the serial
        loop: identical device math (steps chain on model futures exactly as
        before); the only host-visible lags are (a) ErrorTracker marks land
        one iteration late (extraction candidates average hundreds of
        marks), and (b) a binning overflow is detected one iteration late —
        the overflowed step was already a device-side no-op, and its camera
        is re-run after capacity growth just like the serial path (the one
        trailing step launched in between trained on the unchanged model, so
        this is a camera-order swap, not a lost step). Before any host event
        that reads or mutates the model (densify/extract/growth/eval) the
        pipeline is drained, restoring exact reference ordering there.
        """
        cfg, opt = self.cfg, self.opt
        iterations = iterations or opt.iterations
        cam_iter = None
        bg_const = jnp.asarray(
            [1.0, 1.0, 1.0] if cfg.white_background else [0.0, 0.0, 0.0]
        )
        metrics = {"loss": [], "psnr": []}
        t_start = time.time()
        pipeline = os.environ.get("EX4DGS_PIPELINE", "1") != "0"
        pending = None  # (it, out, relaunch, launch_capacity, timestamps)

        def finalize(p):
            it_p, out, relaunch, cap_p, ts_list = p
            total = int(out.binning_total)
            if total > cap_p:
                # The gated step was a no-op on device; grow capacity and
                # re-run the same camera(s) (reference never trains on a
                # truncated instance list, rasterizer_impl.cu:298-299).
                for _attempt in range(4):
                    self.overflow_count += 1
                    self.capacity = round_capacity(
                        max(total * 5 // 4, self.capacity * 2), 65536)
                    out = relaunch()
                    total = int(out.binning_total)
                    if total <= self.capacity:
                        break
                else:
                    import warnings

                    warnings.warn(
                        f"iteration {it_p}: binning overflow persisted "
                        f"through all capacity-growth retries (last total "
                        f"{total}); this step's update was skipped and its "
                        "logged metrics come from a truncated instance list"
                    )
                # adopt the retried step as the live state
                self.model, self.opt_state = out.model, out.opt_state
                if hasattr(out, "visibility"):
                    self.last_vis = out.visibility
            loss = float(out.loss)
            for ts in ts_list:
                self.error_tracker.mark(loss, ts)
            metrics["loss"].append(loss)
            metrics["psnr"].append(float(out.psnr))
            if progress and it_p % self.log_every == 0:
                progress(it_p, loss, float(out.psnr))
            if self._metrics_file and it_p % self.log_every == 0:
                import json

                self._metrics_file.write(json.dumps({
                    "iteration": it_p, "loss": loss,
                    "psnr": float(out.psnr),
                    "n_static": int(self.model.n_static()),
                    "n_dynamic": int(self.model.n_dynamic()),
                }) + "\n")
                self._metrics_file.flush()
            if bool(out.nan_flag):
                self._dump_debug_snapshot()
                self._host_event(D.prune_nan)

        while self.iteration < iterations:
            self.iteration += 1
            it = self.iteration

            if self.gui is not None:
                # serve viewer requests between steps (train.py:93-106)
                self.gui.poll(self._gui_render, self.cfg.source_path or "",
                              training_active=self.iteration < iterations)

            if it % 1000 == 0:
                self.model = self.model._replace(
                    active_sh_degree=jnp.minimum(
                        self.model.active_sh_degree + 1, cfg.sh_degree
                    )
                )

            # next camera — a new shuffled epoch refills WITHIN the same
            # iteration, like the reference's viewpoint-stack pop
            # (train.py:117-125): every iteration trains, and scheduled
            # events can never be skipped by an epoch boundary
            while True:
                if cam_iter is None:
                    cams = self.scene.sampled_train_cameras()
                    if not cams:
                        raise RuntimeError("no train cameras in sampling window")
                    cam_iter = self.prefetcher.epoch(cams, shuffle=True,
                                                     rng=self.pyrng)
                    if it > opt.prune_invisible_interval:
                        self.prune_inv = True
                try:
                    cam, gt = next(cam_iter)
                    break
                except StopIteration:
                    cam_iter = None

            if self.mark_last and cam.timestamp >= self.sample_len - cfg.time_interval:
                self.mark_extract = True
                self.mark_last = False

            bg = (
                jnp.asarray(self.rng.uniform(size=3).astype(np.float32))
                if opt.random_background
                else bg_const
            )

            if self.mesh is not None:
                data_size = self.mesh.shape["data"]
                batch = [(cam, gt)]
                while len(batch) < data_size and cam_iter is not None:
                    try:
                        batch.append(next(cam_iter))
                    except StopIteration:
                        cam_iter = None
                while len(batch) < data_size:
                    batch.append(batch[-1])  # epoch boundary: pad with repeats
                cams_b = jax.tree.map(
                    lambda *xs: jnp.stack(xs),
                    *[c.render_camera() for c, _ in batch],
                )
                gts = jnp.stack([jnp.asarray(g) for _, g in batch])
                ts = jnp.asarray([c.timestamp for c, _ in batch], jnp.float32)

                def run(statics, _it=it):
                    step = self._get_sharded_step(statics)
                    return step(self.model, self.opt_state, cams_b, gts, ts,
                                bg, jnp.asarray(_it, jnp.int32))

                ts_list = [c.timestamp for c, _ in batch]
            else:
                cam_dev = cam.render_camera()
                gt_dev = jnp.asarray(gt)
                t_dev = jnp.asarray(cam.timestamp, jnp.float32)

                def run(statics, _it=it):
                    return train_step(
                        self.model, self.opt_state, cam_dev, gt_dev, t_dev,
                        bg, jnp.asarray(_it, jnp.int32), statics,
                    )

                ts_list = [cam.timestamp]

            # Dispatch step `it`; its scalars are pulled lazily in finalize()
            # (one iteration later under pipelining) so the device->host
            # round trip overlaps the next step's compute.
            cap_launch = self.capacity
            out = run(self._statics())
            self.model, self.opt_state = out.model, out.opt_state
            self.last_cam = cam
            if self.mesh is not None:
                self.last_vis = None  # per-camera visibility folded into stats
            else:
                # kept ON DEVICE: only extraction events read it (_do_extract),
                # so the [capacity]-sized D2H transfer (~1 MB/iter through the
                # remote TPU tunnel) happens once per extracton_interval, not
                # every step
                self.last_vis = out.visibility

            if pending is not None:
                finalize(pending)  # overlaps step `it` executing on device
            pending = (it, out, lambda: run(self._statics()), cap_launch,
                       ts_list)

            # Drain before anything that reads/mutates host-visible state:
            # host events (densify/extract/growth/prune), in-training eval,
            # the final iteration — or every iteration when pipelining is off.
            if (not pipeline or it >= iterations or it in self.test_iterations
                    or self._events_due(it)):
                finalize(pending)
                pending = None

            if it in self.test_iterations:
                report = self.evaluate_test_set()
                metrics.setdefault("test_reports", []).append((it, report))
                if self._metrics_file:
                    import json

                    self._metrics_file.write(json.dumps(
                        {"iteration": it, "test": report}) + "\n")
                    self._metrics_file.flush()

            self._scheduled_events(it)

        if pending is not None:
            finalize(pending)
        metrics["wall_time"] = time.time() - t_start
        return metrics

    def _events_due(self, it: int) -> bool:
        """Mirror of every _scheduled_events branch that runs a host event
        (pulls/mutates the model): the pipelined loop drains before these so
        event ordering matches the serial loop exactly. Flag-only branches
        (mark_last bookkeeping) don't need a drain. Conservative — returning
        True merely costs the overlap for that iteration."""
        opt = self.opt
        if it < opt.densify_until_iter:
            if it > opt.densify_from_iter and it % opt.densification_interval == 0:
                return True
            if (it > opt.extract_from_iter and it % opt.extracton_interval == 0
                    and hasattr(self, "last_cam")):
                return True
        if (it % (opt.densification_interval * 4) == 0
                and it < opt.densify_until_iter - 3000):
            return True
        if self.prune_inv and it < opt.iterations and it > 3000:
            return True
        if (it > opt.extract_from_iter
                and it % opt.progressive_growing_steps == 0
                and it > opt.progressive_growing_steps):
            return True
        if self.mark_extract and hasattr(self, "last_cam"):
            return True
        return False

    # ------------------------------------------------------------------
    def _scheduled_events(self, it: int) -> None:
        cfg, opt = self.cfg, self.opt
        # densify / extract (train.py:203-234)
        if it < opt.densify_until_iter:
            if it > opt.densify_from_iter and it % opt.densification_interval == 0:
                use_err = it > opt.error_base_prune_steps
                s_max_ssim = (
                    opt.s_max_ssim
                    if use_err and it % (opt.densification_interval * opt.ssim_prune_every) == 0
                    else 0.0
                )
                s_l1 = (
                    opt.s_l1_thres
                    if use_err and it % (opt.densification_interval * opt.l1_prune_every) == 0
                    else 100.0
                )
                d_max_ssim = (
                    opt.d_max_ssim
                    if use_err and it % (opt.densification_interval * opt.ssim_prune_every) == 0
                    else 0.0
                )
                d_l1 = (
                    opt.d_l1_thres
                    if use_err and it % (opt.densification_interval * opt.l1_prune_every) == 0
                    else 100.0
                )
                self._host_event(lambda hm: D.densify_and_prune(
                    hm, cfg, opt, self.scene.cameras_extent, self.rng,
                    s_max_ssim=s_max_ssim, s_l1_thres=s_l1,
                    d_max_ssim=d_max_ssim, d_l1_thres=d_l1,
                ))
            elif (
                it > opt.extract_from_iter
                and it % opt.extracton_interval == 0
                and hasattr(self, "last_cam")
            ):
                candidate = self.error_tracker.pop_worst()
                if candidate is not None:
                    self._do_extract(candidate)
        if (
            it % (opt.densification_interval * 4) == 0
            and it < opt.densify_until_iter - 3000
        ):
            self._host_event(lambda hm: D.adjust_temp_opa(hm, cfg,
                                                          max_dur=self.sample_len))

        if self.prune_inv and it < opt.iterations and it > 3000:
            self._host_event(D.prune_invisible)
            if opt.l1_accum:
                self._host_event(D.prune_small)
            self.prune_inv = False

        # NaN watchdog: folded into the step graph (StepOutputs.nan_flag,
        # checked in finalize) — the host-side isnan + bool() here cost a
        # blocking device round trip EVERY iteration. _host_event_if_nan
        # remains for host-event-path callers.

        # progressive growth (train.py:257-274)
        if (
            it > opt.extract_from_iter
            and it % opt.progressive_growing_steps == opt.make_dynamic_interval
            and self.need_extract
        ):
            self.mark_last = True
            self.need_extract = False

        if (
            it > opt.extract_from_iter
            and it % opt.progressive_growing_steps == 0
            and it > opt.progressive_growing_steps
        ):
            self.sample_len = min(
                self.scene.duration + cfg.time_shift,
                cfg.time_interval * cfg.progressive_step + self.scene.sample_len,
            )
            self.scene.set_sampling_len(self.sample_len, sample_every=cfg.sample_every)
            expanded = [False]

            def do_expand(hm):
                expanded[0] = D.expand_duration(
                    hm, cfg,
                    min(self.scene.duration + cfg.time_shift, self.sample_len),
                )

            self._host_event(do_expand)
            if expanded[0]:
                self.e_count += 1
                if self.e_count >= opt.extract_every:
                    self.mark_last = True
                    self.need_extract = True
                    self.e_count = 0

        if self.mark_extract and hasattr(self, "last_cam"):
            self._do_extract(self.last_cam.timestamp)
            self.mark_extract = False

    def _host_event_if_nan(self) -> None:
        xyz = self.model.params["xyz"]
        if bool(jnp.isnan(xyz).any()) or (
            self.model.dynamic_capacity
            and bool(jnp.isnan(self.model.params["motion_xyz"]).any())
        ):
            self._dump_debug_snapshot()
            self._host_event(D.prune_nan)

    def _dump_debug_snapshot(self) -> None:
        """Arg-dump-on-failure (the reference's debug snapshot mechanism,
        diff_gaussian_rasterization_df/__init__.py:92-99,152-159): when the
        step produced NaNs, persist the full pre-prune state + the camera that
        triggered it for offline reproduction."""
        if not self.debug_snapshot_dir:
            return
        os.makedirs(self.debug_snapshot_dir, exist_ok=True)
        payload = {f"param:{k}": np.asarray(v)
                   for k, v in self.model.params.items()}
        payload["iteration"] = np.asarray(self.iteration)
        if getattr(self, "last_cam", None) is not None:
            rc = self.last_cam.render_camera()
            payload["cam_view"] = np.asarray(rc.view)
            payload["cam_proj"] = np.asarray(rc.proj)
            payload["cam_timestamp"] = np.asarray(self.last_cam.timestamp)
        path = os.path.join(self.debug_snapshot_dir,
                            f"nan_snapshot_{self.iteration}.npz")
        np.savez(path, **payload)
        print(f"[debug] NaN detected; state dumped to {path}", flush=True)

    def _do_extract(self, timestamp: float) -> None:
        vis = (np.asarray(self.last_vis)
               if self.last_vis is not None else None)
        loc = np.asarray(self.last_cam.T, np.float32)
        self._host_event(lambda hm: D.extract_dynamic_from_static(
            hm, self.cfg, loc, timestamp,
            vis[: hm.n_static] if vis is not None else np.ones(hm.n_static, bool),
            self.scene.cameras_extent,
            percentile=self.opt.extract_percentile,
            max_dur=self.sample_len,
        ))

    def evaluate_test_set(self, max_frames: int = 8) -> dict:
        """In-training validation (training_report, train.py:306-368): render
        a slice of the test cameras at their timestamps, report mean PSNR."""
        from ..ops.losses import psnr as psnr_fn

        cams = self.scene.sampled_test_cameras()[:max_frames]
        if not cams:
            return {"n_frames": 0}
        # same background as training (training_report uses the configured bg)
        bg = jnp.asarray(
            [1.0, 1.0, 1.0] if self.cfg.white_background else [0.0, 0.0, 0.0]
        )
        vals = []
        for cam, gt in self.prefetcher.epoch(cams, shuffle=False):
            from ..rendering import render

            img = render(cam.render_camera(), self.model, self.cfg,
                         t=jnp.asarray(cam.timestamp, jnp.float32),
                         bg=bg, capacity=self.capacity,
                         max_per_tile=self.max_per_tile,
                         backend=self.backend).render
            vals.append(float(psnr_fn(jnp.clip(img, 0, 1), jnp.asarray(gt))))
        return {"n_frames": len(vals), "psnr": float(np.mean(vals))}

    # ------------------------------------------------------------------
    def _gui_render(self, req) -> np.ndarray:
        """Render the live model for a viewer request (network_gui analog —
        the viewer drives timestamp/scaling; gaussian_renderer serves it)."""
        from ..rendering import render

        res = render(
            req.camera, self.model, self.cfg,
            t=jnp.asarray(req.timestamp, jnp.float32),
            bg=jnp.zeros(3, jnp.float32), capacity=self.capacity,
            max_per_tile=self.max_per_tile,
            scaling_modifier=req.scaling_modifier, backend=self.backend,
            track_idx=False,  # the wire carries RGB only; dominant-idx
            # bookkeeping costs ~5 ms/frame at N3V scale (renderprobe)
        )
        return np.asarray(res.render)

    def save(self, model_path: str, iteration: int | None = None) -> None:
        it = iteration or self.iteration
        hm = D.pull(self.model, self.opt_state)
        pc_dir = os.path.join(model_path, "point_cloud", f"iteration_{it}")
        os.makedirs(pc_dir, exist_ok=True)
        save_model_ply(hm, os.path.join(pc_dir, "point_cloud.ply"))
        save_checkpoint(
            os.path.join(model_path, f"chkpnt{it}.npz"), hm, it,
            extra={"sample_len": self.sample_len,
                   "kernel_config": self.kernel.to_json()},
        )
