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
from .ops.rasterize import RasterizeSettings


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
        self._last_key_pose: tuple[np.ndarray, np.ndarray] | None = None

        # binning-overflow watchdog (the TPU analog of the CUDA rasterizer's
        # dynamic buffer resize callback, rasterize_points.cu:36-44): on a
        # sustained overflow streak, double settings.max_instances — a
        # host-side recompile at the next train_step, never silent truncation
        self.last_overflow = 0
        self._overflow_streak = 0
        self.overflow_escalations = 0

        # loss anchors: voxel hash -> [k, 3] points (latest wins, like the
        # reference's GsForLosses merge, lioOptimization.cpp:459-476)
        self.loss_anchors: dict[int, np.ndarray] = {}

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
        self.gpmap.update_variance(
            div.hashes, np.asarray(res.reopen), np.asarray(res.update_variance)
        )

        # colorize the 16 fast-init gaussians of every work voxel
        colors, valid = gp3d.colorize(res.means, frame.cam_projection,
                                      jnp.asarray(frame.image))
        colors = np.asarray(colors)
        valid = np.asarray(valid)
        means = np.asarray(res.means)
        covs = np.asarray(res.covs)
        vmask = np.asarray(div.batch.mask) & ~np.asarray(res.error)

        # converged-cell LiDAR hits -> loss anchors (map.cpp:17-25)
        for h in np.unique(div.loss_hashes):
            pts = div.loss_points[div.loss_hashes == h]
            self.loss_anchors[int(h)] = pts
        # reopened-voxel GP samples -> loss anchors (gpprocess.cu:783-800)
        reopen = np.asarray(res.reopen)
        lp = np.asarray(res.loss_points)
        for i in np.nonzero(reopen & vmask)[0]:
            self.loss_anchors[int(div.hashes[i])] = lp[i]

        # assemble the insertion batch: only first-time voxels, valid colors
        new_xyz, new_rgb, new_cov, ranges = [], [], [], []
        for i in np.nonzero(vmask)[0]:
            h = int(div.hashes[i])
            if self.registry.lookup(h) is not None:
                continue  # added_final_gs_sample dedup (gpprocess.cu:806-812)
            keep = valid[i]
            cnt = int(keep.sum())
            if cnt == 0:
                continue
            new_xyz.append(means[i][keep])
            new_rgb.append(colors[i][keep])
            new_cov.append(covs[i][keep])
            ranges.append((h, cnt))

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
            batch = gm.PointBatch(
                xyz=jnp.asarray(xyz, jnp.float32),
                rgb=jnp.asarray(rgb, jnp.float32),
                cov=jnp.asarray(cov, jnp.float32),
                mask=jnp.ones((m,), bool),
            )
            self.params = gm.append_points(batch=batch, params=self.params,
                                           scale_factor=self.cfg.gs.scale_factor)
            for h, cnt in ranges:
                self.registry.insert(h, start, cnt)
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

        if not self.started and int(self.params.n_active) > self.bootstrap_points:
            self.started = True  # is_gs_started (lioOptimization.cpp:1426-1443)

        return {
            "inserted": inserted,
            "active": int(self.params.n_active),
            "voxels": self.gpmap.stats(),
            "keyframes": len(self.cameras),
            "overflow_gp": int(np.asarray(res.error).sum()),
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
        """get_random_indices (lioOptimization.cpp:1860-1913): newest
        curr_cam_per_iter from the sliding window + random history pairs."""
        n = len(self.cameras)
        win = self.cfg.gp.image_sliding_window
        split = max(0, n - win)
        curr = list(range(split, n))[: self.cfg.gp.curr_cam_per_iter]
        hist_pairs = []
        if split > 1:
            cands = self.rng.permutation(split - 1)
            for idx in cands[: self.cfg.gp.history_cam_per_iter]:
                hist_pairs.append((int(idx), int(idx) + 1))
        return curr, hist_pairs

    def _simi_inputs(self, max_gauss: int = 2048) -> training.SimiInputs:
        """calcSimiLoss input assembly (gaussian.cu:201-228): anchors in
        voxels that exist in the registry + their gaussian indices."""
        pts, gidx = [], []
        for h, anchor in self.loss_anchors.items():
            r = self.registry.lookup(h)
            if r is None:
                continue
            pts.append(anchor)
            gidx.extend(range(r[0], r[0] + r[1]))
        simi = training.empty_simi(max_gauss=max_gauss)
        if not pts:
            return simi
        points = np.concatenate(pts)[: training.MAX_SIMI]
        gidx = np.asarray(gidx[:max_gauss], np.int32)
        return training.SimiInputs(
            points=simi.points.at[: len(points)].set(jnp.asarray(points, jnp.float32)),
            point_mask=jnp.arange(training.MAX_SIMI) < len(points),
            gauss_idx=simi.gauss_idx.at[: len(gidx)].set(jnp.asarray(gidx)),
            gauss_mask=jnp.arange(simi.gauss_idx.shape[0]) < len(gidx),
        )

    def train_iteration(self) -> training.TrainMetrics | None:
        if not self.started or not self.cameras:
            return None
        curr, hist_pairs = self._sample_cameras()
        cam_idx = curr + [i for pair in hist_pairs for i in pair]
        cams = [self.cameras[i] for i in cam_idx]
        # device-resident stack: no per-iteration H2D of the GT images
        gts = jnp.stack([self._gt_device[i] for i in cam_idx])

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
        )
        self.params = params
        self.opt_state = opt_state
        self.iter += 1

        self.last_overflow = int(metrics.overflow)
        if self.last_overflow > 0:
            self._overflow_streak += 1
            if self._overflow_streak >= 2:
                # overflow sums both budget cuts (binning.py:308), so grow
                # the expansion budget AND the per-tile chunk cap together
                self.settings = self.settings._replace(
                    max_instances=2 * self.settings.max_instances,
                    max_chunks_per_tile=2 * self.settings.max_chunks_per_tile)
                self.overflow_escalations += 1
                self._overflow_streak = 0
        else:
            self._overflow_streak = 0
        return metrics

    # ------------------------------------------------------------------
    # Outputs (saveRender / Save_ply equivalents)
    # ------------------------------------------------------------------

    def render_keyframe(self, index: int):
        return training.render_params(
            self.params, self.cameras[index], self._bg, self.settings)

    def save_ply(self, path: str):
        gm.save_ply(self.params, path)

    def evaluate(self) -> dict:
        """Mean PSNR/SSIM over all keyframes (saveRender,
        lioOptimization.cpp:2198-2234)."""
        from .ops import losses as loss_ops

        psnrs, ssims = [], []
        for i in range(len(self.cameras)):
            out = self.render_keyframe(i)
            gt = jnp.asarray(self.gt_images[i])
            psnrs.append(float(loss_ops.psnr(out.color, gt)))
            ssims.append(float(loss_ops.ssim(out.color, gt)))
        return {
            "mean_psnr": float(np.mean(psnrs)) if psnrs else 0.0,
            "mean_ssim": float(np.mean(ssims)) if ssims else 0.0,
            "keyframes": len(psnrs),
        }
