"""Incremental mapping pipeline: colored points + posed images -> 3DGS map.

The TPU-side driver corresponding to the reference's `optimize_vis` training
thread plus `gsPointCloudUpdate` (src/liw/lioOptimization.cpp:1201-1316,
1492-1847), decoupled from ROS/ESIKF per SURVEY §7: the front-end (or a
dataset reader) feeds (points_world, image, camera) frames.

Per frame (gsPointCloudUpdate):
  1. GpMap.divide_points — voxel bookkeeping + PCA surface test (CPU)
  2. gp_forward — batched voxel GP regression (device, one jit)
  3. colorize — project GP gaussians into the frame image
  4. append to the GaussianParams model (+ hash->index registry), growing
     capacity by doubling as needed
  5. collect loss anchors (converged-cell hits + reopened-voxel GP samples)

Training (optimize_vis): keyframe gating by pose delta
(compareStatesImageAdd, lioOptimization.cpp:1181-1199), sliding-window
camera sampling (get_random_indices:1860-1913), train_step with image +
simi + delta-depth losses, status metrics every call.
"""

from __future__ import annotations

import dataclasses
import functools
import queue as _queue
import threading
import time as _time
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .config import Config
from .frontend.gpmap import GpMap
from .models import gaussian_model as gm
from .models import training
from .models.cameras import Camera
from .ops import gp3d
from .ops import losses as loss_ops
from .ops.rasterize import RasterizeSettings


def _pad_rows(a: np.ndarray, n: int) -> np.ndarray:
    """Zero-pad the leading axis of a to n rows."""
    out = np.zeros((n,) + a.shape[1:], a.dtype)
    out[: a.shape[0]] = a
    return out


class Frame(NamedTuple):
    """One synchronized rendering frame from the front-end."""

    points_world: np.ndarray      # [N, 3] new colored map points
    image: np.ndarray             # [H, W, 3] RGB uint8
    camera: Camera                # posed camera for this frame
    cam_projection: gp3d.CameraProjection  # world->cam for colorization


@dataclasses.dataclass
class MapperState:
    params: gm.GaussianParams
    opt_state: object
    started: bool = False


class IncrementalMapper:
    def __init__(
        self,
        config: Config = Config(),
        initial_capacity: int = 2**14,
        settings: RasterizeSettings = RasterizeSettings(),
        bootstrap_points: int = 1000,
        seed: int = 0,
    ):
        self.cfg = config
        self.settings = settings
        self.bootstrap_points = bootstrap_points
        self.gpmap = GpMap(config.gp)
        self.registry = gm.HashIndexRegistry()
        self.optimizer = training.make_optimizer(config.gs)
        self.params = gm.create_empty(initial_capacity, config.model.sh_degree)
        self.opt_state = self.optimizer.init(self.params)
        self.started = False
        self.iter = 0
        self.rng = np.random.default_rng(seed)

        self.cameras: list[Camera] = []
        self.gt_images: list[np.ndarray] = []
        self._gt_device: list[jax.Array] = []  # device-staged GT images
        # per-keyframe (mu2, sigma2_sq) SSIM reference stats, device-resident
        self._gt_stats: list[tuple[jax.Array, jax.Array]] = []
        self._ref_stats_jit = jax.jit(loss_ops.ssim_ref_stats)
        self._last_key_pose: tuple[np.ndarray, np.ndarray] | None = None
        # round-robin visited sets (selected_indices_curr/_hist,
        # lioOptimization.cpp:1571-1590)
        self._used_curr: set[int] = set()
        self._used_hist: set[int] = set()

        # binning-overflow watchdog (the TPU analog of the CUDA rasterizer's
        # dynamic buffer resize callback, rasterize_points.cu:36-44): on a
        # sustained overflow streak, double settings.max_instances — a
        # host-side recompile at the next train_step, never silent truncation
        self.last_overflow = 0
        self._overflow_streak = 0
        self.overflow_escalations = 0
        # feedback budget auto-fit (the analog of CUDA's exact num_rendered
        # allocation, rasterizer_impl.cu:277): every instance-space op
        # scales with max_instances, so once the measured expansion is known
        # the loose default budget is SHRUNK to the scene (+ margin) —
        # bounded to one recompile per budget_fit_window steps, with the
        # overflow escalation above as the safety net if the scene densifies
        self.budget_fit_window = 50
        self.budget_refits = 0
        self._fit_inst: list[int] = []
        self._fit_chunks: list[int] = []
        self._fit_walked: list[int] = []
        self._overflowed_at = 0  # largest budget that ever overflowed:
        # never shrink back to it (prevents shrink->overflow->double cycles)
        # Budget feedback is ingested in BATCHES of feedback_interval steps:
        # reading a step's overflow scalar forces a device round trip, and
        # a per-iteration sync serializes host and device (on a remote-
        # tunneled chip the round trip alone is ~100 ms — the r4 "host-
        # bound iteration" diagnosis). Batching keeps the device pipeline
        # feedback_interval steps deep; escalation lags by at most
        # 2*feedback_interval iterations.
        self.feedback_interval = 8
        self._pending_feedback: list = []
        self._feedback_hot = True  # per-step feedback while budgets are
        # unproven (startup) or known-broken (overflow); the first CLEAN
        # step switches to batched mode

        # loss anchors: voxel hash -> [k, 3] points (latest wins, like the
        # reference's GsForLosses merge, lioOptimization.cpp:459-476)
        self.loss_anchors: dict[int, np.ndarray] = {}
        # deferred-colorization pool: voxel hash -> [means [16,3],
        # covs [16,3,3], age] for GP voxels no camera has fully seen yet
        # (see GpParams.pending_colorize_max_age)
        self._pending_color: dict[int, list] = {}
        # SimiInputs assembly is cached between train iterations: the
        # anchor->gaussian join is a Python loop over thousands of voxels
        # (~100 ms/iter at production scale — the r4 host-bound iteration
        # diagnosis) whose inputs only change when add_frame ingests new
        # anchors/registry rows or prune_map remaps the registry
        self._simi_cache: training.SimiInputs | None = None

        self._bg = jnp.ones((3,), jnp.float32)
        # donate params/Adam buffers on accelerators (halves parameter HBM
        # traffic per step); CPU ignores donation with a warning, so keep
        # the non-donating entry there
        self._train_step = (training.train_step_donating
                            if jax.default_backend() == "tpu"
                            else training.train_step)

    # ------------------------------------------------------------------
    # Map growth (gsPointCloudUpdate)
    # ------------------------------------------------------------------

    def add_frame(self, frame: Frame) -> dict:
        div = self.gpmap.divide_points(frame.points_world)
        res = gp3d.gp_forward(div.batch, self.cfg.gp)
        # ONE pipelined device_get for every GP output the host consumes:
        # device_get starts all copies async before blocking, so the reads
        # cost ~one round trip instead of six serial ones (~25 ms each on
        # a remote-tunneled chip, tools/profile_ingest.py)
        means, covs, reopen, error, upd_var, lp = jax.device_get(
            (res.means, res.covs, res.reopen, res.error,
             res.update_variance, res.loss_points))
        self.gpmap.update_variance(div.hashes, reopen, upd_var)

        vmask = np.asarray(div.batch.mask) & ~error

        # converged-cell LiDAR hits -> loss anchors (map.cpp:17-25)
        for h in np.unique(div.loss_hashes):
            pts = div.loss_points[div.loss_hashes == h]
            self.loss_anchors[int(h)] = pts
        # reopened-voxel GP samples -> loss anchors (gpprocess.cu:783-800)
        for i in np.nonzero(reopen & vmask)[0]:
            self.loss_anchors[int(div.hashes[i])] = lp[i]

        # queue fresh GP voxels into the deferred-colorization pool (latest
        # GP result wins for a reopened-while-pending voxel); registry
        # membership is the added_final_gs_sample dedup (gpprocess.cu:806-812)
        for i in np.nonzero(vmask)[0]:
            h = int(div.hashes[i])
            # not-yet-inserted voxels take the newest GP result; once any
            # subset is inserted the voxel is registered and the remaining
            # pool entry keeps ITS generation (no mixing)
            if self.registry.lookup(h) is None:
                self._pending_color[h] = [
                    means[i], covs[i], 0,
                    np.ones(means.shape[1], bool)]  # gaussians still pending

        # colorize the ENTIRE pool against this frame in one batched call;
        # insert voxels that are fully visible now, age-out partial ones
        # (config.py GpParams.pending_colorize_max_age — the documented
        # deviation from the reference's insert-the-valid-subset-once)
        new_xyz, new_rgb, new_cov, ranges = [], [], [], []
        max_age = self.cfg.gp.pending_colorize_max_age
        if self._pending_color:
            keys = list(self._pending_color)
            pm = np.stack([self._pending_color[h][0] for h in keys])
            # pow2-bucketed padded shape + one jitted call: the pool size
            # changes every frame, and unbucketed eager colorize would
            # compile fresh kernels per frame (remote TPU compiles are
            # seconds each — same rationale as gpmap._pack's buckets)
            vpad = 8
            while vpad < pm.shape[0]:
                vpad *= 4  # coarse buckets: each NEW pool shape costs a
                # remote compile of the colorize jit (seconds); x4 spacing
                # quarters the distinct shapes a growing pool walks through
            pmp = np.zeros((vpad,) + pm.shape[1:], np.float32)
            pmp[: pm.shape[0]] = pm
            pc_dev, pv_dev = self._colorize_jit(
                jnp.asarray(pmp), frame.cam_projection,
                jnp.asarray(frame.image))
            pcolors, pvalid = jax.device_get((pc_dev, pv_dev))  # pipelined
            pcolors = pcolors[: pm.shape[0]]
            pvalid = pvalid[: pm.shape[0]]
            strict = max_age < 0
            for j, h in enumerate(keys):
                entry = self._pending_color[h]
                keep = pvalid[j] & entry[3]
                cnt = int(keep.sum())
                if cnt > 0:
                    # insert the newly-visible subset NOW (reference
                    # timing, gpprocess.cu:828-838) ...
                    new_xyz.append(pm[j][keep])
                    new_rgb.append(pcolors[j][keep])
                    new_cov.append(entry[1][keep])
                    ranges.append((h, cnt))
                    entry[3] = entry[3] & ~keep
                # ... and, unlike the reference, keep the still-unseen
                # remainder pending until a camera sees it or the age cap
                # expires (never-visible gaussians are uninsertable anyway)
                entry[2] += 1
                if strict or not entry[3].any() or entry[2] > max(max_age, 0):
                    del self._pending_color[h]

        inserted = 0
        if new_xyz:
            xyz = np.concatenate(new_xyz)
            rgb = np.concatenate(new_rgb)
            cov = np.concatenate(new_cov)
            m = xyz.shape[0]
            start = int(self.params.n_active)
            old_cap = self.params.capacity
            self.params = gm.ensure_capacity(self.params, m)
            if self.params.capacity != old_cap:
                self.opt_state = training.grow_opt_state(
                    self.opt_state, old_cap, self.params.capacity)
            # pow2-bucketed batch through ONE jitted append: the batch size
            # differs every frame, and eager per-shape dispatch compiles
            # fresh executables on a remote-tunneled TPU (measured ~27
            # s/frame of ingest 'other' time, tools/profile_ingest.py);
            # masked padding rows are dropped by append_points' compaction
            mpad = 8
            while mpad < m:
                mpad *= 2
            batch = gm.PointBatch(
                xyz=jnp.asarray(_pad_rows(xyz, mpad), jnp.float32),
                rgb=jnp.asarray(_pad_rows(rgb, mpad), jnp.float32),
                cov=jnp.asarray(_pad_rows(cov, mpad), jnp.float32),
                mask=jnp.asarray(np.arange(mpad) < m),
            )
            self.params = self._append_jit(
                self.params, batch, self.cfg.gs.scale_factor)
            for h, cnt in ranges:
                if not self.registry.insert(h, start, cnt):
                    # deferred completion of a partially-inserted voxel
                    self.registry.append_range(h, start, cnt)
                start += cnt
            inserted = m

        # keyframe gating (compareStatesImageAdd, thresholds map_options)
        if self._is_keyframe(frame.camera):
            self.cameras.append(frame.camera)
            gt = np.asarray(frame.image, np.float32).transpose(2, 0, 1) / 255.0
            self.gt_images.append(gt)
            # stage the GT image on device NOW (async device_put): the H2D
            # transfer overlaps the surrounding host work, and training
            # iterations stack device-resident arrays instead of re-feeding
            # the image every step (SURVEY §7 hard part 4 — the analog of
            # the reference's thread+queue feed, lioOptimization.cpp:2496)
            self._gt_device.append(jax.device_put(gt))
            # GT-side SSIM statistics are constant per keyframe: compute
            # them once at staging (ssim_ref_stats) so every training
            # iteration touching this keyframe skips 2 of its 5 SSIM blur
            # sweeps, bit-identically (ops/losses.py). HBM cost: two extra
            # [3,H,W] f32 arrays per keyframe (3x the GT image itself, ~20
            # MB/keyframe at 1080p), growing with keyframe count — if very
            # long runs ever pressure HBM, cap this cache to the sampling
            # working set and recompute for rarely visited keyframes
            self._gt_stats.append(self._ref_stats_jit(self._gt_device[-1]))

        if not self.started and int(self.params.n_active) > self.bootstrap_points:
            self.started = True  # is_gs_started (lioOptimization.cpp:1426-1443)

        self._simi_cache = None  # anchors and/or registry changed

        return {
            "inserted": inserted,
            "active": int(self.params.n_active),
            "voxels": self.gpmap.stats(),
            "keyframes": len(self.cameras),
            "overflow_gp": int(error.sum()),
            "pending_color": len(self._pending_color),
        }

    def _is_keyframe(self, camera: Camera) -> bool:
        R = np.asarray(camera.R_cw)
        t = np.asarray(camera.cam_center)
        if self._last_key_pose is None:
            self._last_key_pose = (R, t)
            return True
        R0, t0 = self._last_key_pose
        dt = np.linalg.norm(t - t0)
        cos = np.clip((np.trace(R0 @ R.T) - 1.0) / 2.0, -1.0, 1.0)
        dr = np.degrees(np.arccos(cos))
        if dt > self.cfg.map.max_delta_trans or abs(dr) > self.cfg.map.max_delta_degree:
            self._last_key_pose = (R, t)
            return True
        return False

    # ------------------------------------------------------------------
    # Training (optimize_vis)
    # ------------------------------------------------------------------

    def _sample_cameras(self):
        """get_random_indices + exist-list round-robin
        (lioOptimization.cpp:1571-1590, 1860-1913): window cameras not yet
        visited this cycle are taken oldest-first; when every window camera
        has been visited the visited set resets ("optimize whole current
        image sequence again") — so between keyframes EVERY window camera is
        optimized before any repeats. History cameras round-robin the same
        way, shuffled, paired with their +1 neighbor for delta-depth."""
        n = len(self.cameras)
        win = self.cfg.gp.image_sliding_window
        split = max(0, n - win)
        curr: list[int] = []
        if win > 0 and self.cfg.gp.curr_cam_per_iter > 0 and n > split:
            cands = [i for i in range(split, n) if i not in self._used_curr]
            if not cands:  # window exhausted -> new cycle
                self._used_curr.clear()
                cands = list(range(split, n))
            # randomized non-repeating draw within the cycle, like the
            # reference's get_random_indices (lioOptimization.cpp:1860-1913)
            cands = [int(i) for i in self.rng.permutation(cands)]
            curr = cands[: self.cfg.gp.curr_cam_per_iter]
            self._used_curr.update(curr)
        hist_pairs: list[tuple[int, int]] = []
        if split > 1 and self.cfg.gp.history_cam_per_iter > 0:
            cands = [i for i in range(split - 1) if i not in self._used_hist]
            if not cands:
                self._used_hist.clear()
                cands = list(range(split - 1))
            cands = [int(i) for i in self.rng.permutation(cands)]
            for idx in cands[: self.cfg.gp.history_cam_per_iter]:
                hist_pairs.append((idx, idx + 1))
            self._used_hist.update(i for i, _ in hist_pairs)
        return curr, hist_pairs

    def _simi_inputs(self, max_gauss: int = 2048) -> training.SimiInputs:
        """calcSimiLoss input assembly (gaussian.cu:201-228): anchors in
        voxels that exist in the registry + their gaussian indices.
        Cached: add_frame / prune_map invalidate (anchors or registry
        changed); every other call returns the device-resident inputs."""
        if self._simi_cache is not None:
            return self._simi_cache
        pts, gidx = [], []
        npts = 0
        for h, anchor in self.loss_anchors.items():
            rs = self.registry.ranges(h)
            if not rs:
                continue
            if npts < training.MAX_SIMI:
                pts.append(anchor)
                npts += len(anchor)
            for s, c in rs:
                gidx.extend(range(s, s + c))
            if npts >= training.MAX_SIMI and len(gidx) >= max_gauss:
                break  # both fixed-shape caps saturated (MAX_SIMI parity)
        simi = training.empty_simi(max_gauss=max_gauss)
        if pts:
            points = np.concatenate(pts)[: training.MAX_SIMI]
            gidx = np.asarray(gidx[:max_gauss], np.int32)
            simi = training.SimiInputs(
                points=simi.points.at[: len(points)].set(
                    jnp.asarray(points, jnp.float32)),
                point_mask=jnp.arange(training.MAX_SIMI) < len(points),
                gauss_idx=simi.gauss_idx.at[: len(gidx)].set(jnp.asarray(gidx)),
                gauss_mask=jnp.arange(simi.gauss_idx.shape[0]) < len(gidx),
            )
        self._simi_cache = jax.tree.map(jnp.asarray, simi)
        return self._simi_cache

    def train_iteration(self) -> training.TrainMetrics | None:
        if not self.started or not self.cameras:
            return None
        curr, hist_pairs = self._sample_cameras()
        cam_idx = curr + [i for pair in hist_pairs for i in pair]
        cams = [self.cameras[i] for i in cam_idx]
        # device-resident stack: no per-iteration H2D of the GT images
        gts = jnp.stack([self._gt_device[i] for i in cam_idx])
        gt_stats = (jnp.stack([self._gt_stats[i][0] for i in cam_idx]),
                    jnp.stack([self._gt_stats[i][1] for i in cam_idx]))

        params, opt_state, metrics = self._train_step(
            self.params,
            self.opt_state,
            cams,
            gts,
            self._simi_inputs(),
            opt_params=self.cfg.gs,
            settings=self.settings,
            n_history_pairs=len(hist_pairs),
            bg_color=self._bg,
            gt_stats=gt_stats,
        )
        self.params = params
        self.opt_state = opt_state
        self.iter += 1

        # Budget feedback is DEFERRED and BATCHED: reading a step's
        # overflow forces a device sync (SURVEY §7 hard part 4), so the
        # metrics of the last feedback_interval steps are ingested together
        # — by the time the batch is read, all but (at most) the newest
        # step have long completed, costing ONE round trip per batch
        # instead of one per iteration.
        # While budgets are known-broken (_feedback_hot), ingest every step
        # — sync cost is irrelevant when the renders are truncated anyway;
        # in steady state the batch keeps the pipeline deep.
        self._pending_feedback.append(metrics)
        interval = 1 if self._feedback_hot else self.feedback_interval
        if len(self._pending_feedback) >= interval:
            pending, self._pending_feedback = self._pending_feedback, []
            # ONE packed transfer for the whole batch: each scalar read
            # costs a full device round trip (~25 ms on the tunneled
            # chip), so reading 4 fields x batch separately would cost
            # interval x 4 RTTs — pack them into one device array first
            packed = np.asarray(jnp.stack([
                jnp.stack([m.overflow, m.num_instances, m.max_nchunks,
                           m.walked_chunks]) for m in pending]))
            for row in packed:
                esc = self.overflow_escalations
                self._ingest_budget_feedback(*(int(v) for v in row))
                if self.overflow_escalations != esc:
                    # the rest of the batch predates the new budgets —
                    # stale signals must not compound the escalation
                    break

        # pruning lifecycle: long-run splat count plateaus instead of
        # growing monotonically (completes the reference's never-called
        # prune_optimizer, gaussian.cu:430; BASELINE "densification +
        # pruning")
        pi = self.cfg.gs.prune_interval
        if pi > 0 and self.iter % pi == 0:
            self.prune_map()
        return metrics

    def _ingest_budget_feedback(self, overflow: int, num_instances: int,
                                max_nchunks: int, walked_chunks: int):
        self.last_overflow = overflow
        if overflow > 0:
            self._feedback_hot = True
            self._overflowed_at = max(self._overflowed_at,
                                      self.settings.max_instances)
            self._fit_inst.clear()
            self._fit_chunks.clear()
            self._fit_walked.clear()
            self._overflow_streak += 1
            if self._overflow_streak >= 2:
                # overflow sums all three budget cuts (binning.py + the
                # compacted grad clamp). The TRUE expansion is measured
                # (num_instances), so jump max_instances straight to it
                # (+20%) instead of doubling blindly; the per-tile chunk
                # cap (whose uncapped need is unobservable) doubles, and
                # the grad layout falls back to always-lossless full until
                # the next fit.
                b = self._INST_BUCKET
                need_i = int(1.2 * num_instances)
                fitted_i = max(b, -(-need_i // b) * b)
                self.settings = self.settings._replace(
                    max_instances=max(2 * self.settings.max_instances,
                                      fitted_i),
                    max_chunks_per_tile=2 * self.settings.max_chunks_per_tile,
                    grad_capacity=0)
                self.overflow_escalations += 1
                self._overflow_streak = 0
        else:
            self._feedback_hot = False
            self._overflow_streak = 0
            self._maybe_shrink_budgets(num_instances, max_nchunks,
                                       walked_chunks)

    _INST_BUCKET = 512 * 128  # 65,536-slot budget granularity: quantizing
    # the fitted budget bounds recompiles to one per bucket change

    def _maybe_shrink_budgets(self, num_instances: int, max_nchunks: int,
                              walked_chunks: int):
        """Shrink max_instances / max_chunks_per_tile toward the measured
        expansion high-water mark (+15% / +2 chunks margin) once a full
        observation window agrees — the feedback-fit of VERDICT r2 weak #5.
        Growth on overflow is handled by the escalation path above."""
        from .ops.rasterize import _resolve_backend

        if _resolve_backend(self.settings.backend) != "pallas":
            return
        self._fit_inst.append(num_instances)
        self._fit_chunks.append(max_nchunks)
        self._fit_walked.append(walked_chunks)
        if len(self._fit_inst) < self.budget_fit_window:
            return
        b = self._INST_BUCKET
        need_i = int(max(self._fit_inst) * 1.15)
        fitted_i = max(b, -(-need_i // b) * b)
        need_c = max(self._fit_chunks) + 2
        fitted_c = max(8, -(-need_c // 8) * 8)
        new = self.settings
        if (fitted_i * 3 // 2 <= new.max_instances
                and fitted_i > self._overflowed_at):
            new = new._replace(max_instances=fitted_i)
        if fitted_c * 2 <= new.max_chunks_per_tile:
            new = new._replace(max_chunks_per_tile=fitted_c)
        # compacted grad scatter: fit grad_capacity to the measured walked-
        # chunk high-water mark (+20%, bucketed) — the scatter-add's index
        # count drops from the padded capacity to ~the walked fraction
        walked_max = max(self._fit_walked) if self._fit_walked else 0
        if walked_max > 0:
            need_g = int(walked_max * 128 * 1.2)
            fitted_g = max(b, -(-need_g // b) * b)
            cur = new.grad_capacity
            if cur == 0 or fitted_g > cur or fitted_g * 2 <= cur:
                new = new._replace(grad_capacity=fitted_g)
        self._fit_inst.clear()
        self._fit_chunks.clear()
        self._fit_walked.clear()
        if new != self.settings:
            self.settings = new
            self.budget_refits += 1

    def prune_map(self, min_opacity: float | None = None) -> int:
        """Drop low-opacity (and, when prune_max_scale > 0, runaway-scale)
        gaussians; compact params + Adam state with the same permutation
        and remap the hash->index registry. Returns the number dropped."""
        mo = self.cfg.gs.prune_min_opacity if min_opacity is None else min_opacity
        keep = (np.asarray(self.params.get_opacity()[:, 0]) >= mo) \
            & np.asarray(self.params.active_mask())
        ms = self.cfg.gs.prune_max_scale
        if ms > 0:
            keep &= np.asarray(self.params.get_scaling()).max(axis=1) <= ms
        dropped = int(self.params.n_active) - int(keep.sum())
        if dropped == 0:
            return 0
        order, count = gm.prune_permutation(self.params, jnp.asarray(keep))
        self.params = gm.compact(self.params, order, count)
        self.opt_state = training.compact_opt_state(self.opt_state, order, count)
        self.registry.remap_pruned(keep)
        self._simi_cache = None  # gaussian indices shifted
        return dropped

    # ------------------------------------------------------------------
    # Outputs (saveRender / Save_ply equivalents)
    # ------------------------------------------------------------------

    def render_keyframe(self, index: int):
        return self._render_jit(
            self.params, self.cameras[index], self._bg, settings=self.settings)

    @functools.cached_property
    def _render_jit(self):
        # evaluation renders are ONE jit trace shared by every keyframe
        # (Camera is a pytree with static width/height): eager dispatch of
        # the whole rasterizer per render made evaluate() host-bound
        return jax.jit(training.render_params, static_argnames=("settings",))

    @functools.cached_property
    def _colorize_jit(self):
        return jax.jit(gp3d.colorize)

    @functools.cached_property
    def _append_jit(self):
        return jax.jit(gm.append_points, static_argnames=("scale_factor",))

    @functools.cached_property
    def _pair_metrics_jit(self):
        def pair(color, gt):
            return loss_ops.psnr(color, gt), loss_ops.ssim(color, gt)
        return jax.jit(pair)

    def save_ply(self, path: str):
        gm.save_ply(self.params, path)

    def evaluate(self) -> dict:
        """Mean PSNR/SSIM over all keyframes (saveRender,
        lioOptimization.cpp:2198-2234)."""
        psnrs, ssims = [], []
        for i in range(len(self.cameras)):
            out = self.render_keyframe(i)
            p, s = self._pair_metrics_jit(out.color, self._gt_device[i])
            psnrs.append(float(p))
            ssims.append(float(s))
        return {
            "mean_psnr": float(np.mean(psnrs)) if psnrs else 0.0,
            "mean_ssim": float(np.mean(ssims)) if ssims else 0.0,
            "keyframes": len(psnrs),
        }


class ConcurrentMapper:
    """Producer/consumer overlap of the host front-end and device training.

    The TPU-native analog of the reference's three-thread topology
    (lioOptimization.cpp:2496-2501: odometry `run`, training `optimize_vis`,
    color staging): the front-end (caller's thread) pushes frames into a
    BOUNDED queue and returns to sensor processing immediately; a worker
    thread consumes frames (add_frame) and runs `iters_per_frame` training
    iterations per frame continuously. All mapper access is serialized by
    one lock (the analog of the reference's queue mutexes) — the overlap
    win is the host front-end (odometry, decode, color rendering) running
    WHILE the device executes dispatched train steps, instead of the serial
    frontend -> mapping -> training round trip.

    Usage:
        cm = ConcurrentMapper(mapper, iters_per_frame=10)
        for frame in frontend:      # front-end thread
            cm.submit_frame(frame)
        mapper = cm.finish()        # drain + join; re-raises worker errors
    """

    def __init__(self, mapper: IncrementalMapper, iters_per_frame: int = 10,
                 queue_size: int = 4, idle_sleep_s: float = 0.002):
        self.mapper = mapper
        self.iters_per_frame = iters_per_frame
        self.idle_sleep_s = idle_sleep_s
        self._queue: _queue.Queue = _queue.Queue(maxsize=queue_size)
        self.lock = threading.Lock()
        # counters are mutated from BOTH threads; a dedicated lock (not
        # self.lock, which is held across whole mapper calls) keeps the
        # read-modify-writes atomic without serializing submit_frame
        # against training
        self._count_lock = threading.Lock()
        self._stop = threading.Event()
        self._outstanding = 0      # frames submitted, not yet mapped
        self._credits = 0          # train iterations owed
        self._error: BaseException | None = None
        self.trained = 0
        self.frames_mapped = 0
        self.busy_s = 0.0  # worker time inside mapper calls: the "serial
        # sum" baseline for the overlap win is frontend_time + busy_s
        self.last_metrics: training.TrainMetrics | None = None
        self._thread = threading.Thread(target=self._run, daemon=True,
                                        name="optimize_vis")
        self._thread.start()

    def submit_frame(self, frame: Frame):
        """Enqueue a frame; blocks only when the bounded queue is full
        (back-pressure, like the reference's mutex-guarded handoff). The
        put polls so a worker death surfaces instead of deadlocking the
        producer against a full queue nobody will ever drain."""
        with self._count_lock:
            self._outstanding += 1
        while True:
            if self._error is not None:
                with self._count_lock:
                    self._outstanding -= 1
                raise RuntimeError(
                    "ConcurrentMapper worker died") from self._error
            try:
                self._queue.put(frame, timeout=0.1)
                return
            except _queue.Full:
                continue

    def _run(self):
        try:
            while not self._stop.is_set():
                did_work = False
                try:
                    frame = self._queue.get_nowait()
                except _queue.Empty:
                    frame = None
                if frame is not None:
                    t0 = _time.perf_counter()
                    with self.lock:
                        self.mapper.add_frame(frame)
                    self.busy_s += _time.perf_counter() - t0
                    self.frames_mapped += 1
                    with self._count_lock:
                        self._credits += self.iters_per_frame
                        self._outstanding -= 1
                    did_work = True
                if (self._credits > 0 and self.mapper.started
                        and self.mapper.cameras):
                    t0 = _time.perf_counter()
                    with self.lock:
                        self.last_metrics = self.mapper.train_iteration()
                    self.busy_s += _time.perf_counter() - t0
                    with self._count_lock:
                        self._credits -= 1
                    self.trained += 1
                    did_work = True
                elif self._credits > 0 and not self.mapper.started:
                    with self._count_lock:
                        self._credits = 0  # nothing to train on yet
                if not did_work:
                    _time.sleep(self.idle_sleep_s)  # 10 ms idle sleep analog
        except BaseException as e:  # surfaced to the producer thread
            self._error = e
            with self._count_lock:
                self._outstanding = 0

    def finish(self) -> IncrementalMapper:
        """Drain the queue and remaining training credits, stop the worker,
        and return the (quiescent) mapper. Re-raises worker exceptions."""
        while (self._outstanding > 0 or self._credits > 0) \
                and self._error is None:
            _time.sleep(0.005)
        self._stop.set()
        self._thread.join()
        if self._error is not None:
            raise RuntimeError("ConcurrentMapper worker died") from self._error
        # quiesce the device: train steps dispatch asynchronously, so wall
        # clock accounting must include the in-flight tail
        jax.block_until_ready(self.mapper.params.xyz)
        return self.mapper
