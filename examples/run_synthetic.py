"""End-to-end demo: full LIVO front-end + TPU mapping on synthetic data.

Runs the complete system the way a dataset run would (SURVEY §3 call
stacks): IMU/LiDAR/image streams -> MeasurementSync -> ESKF+ICP odometry ->
colored map -> voxel-GPR -> incremental 3DGS optimization -> metrics +
artifacts (PLY map, TUM poses, side-by-side renders, log_time.txt).

Usage: python examples/run_synthetic.py [--frames N] [--iters N] [--out DIR]
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=5)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--out", default="/tmp/gslivm_demo")
    ap.add_argument("--width", type=int, default=96)
    ap.add_argument("--height", type=int, default=64)
    ap.add_argument("--backend", default="auto",
                    help="rasterizer backend: auto|naive|pallas")
    ap.add_argument("--cpu", action="store_true", help="force CPU")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from gslivm_tpu.config import Config, GpParams, IcpOptions, OdometryOptions
    from gslivm_tpu.frontend import synthetic
    from gslivm_tpu.frontend.livo import LivoFrontend
    from gslivm_tpu.frontend.sensors import LidarSweep
    from gslivm_tpu.ops.rasterize import RasterizeSettings
    from gslivm_tpu.pipeline import IncrementalMapper
    from gslivm_tpu.utils import outputs
    from gslivm_tpu.utils.timer import Timer

    os.makedirs(args.out, exist_ok=True)
    rng = np.random.default_rng(0)
    t_wall0 = time.time()

    cfg = Config(
        gp=GpParams(grid=0.5),
        odometry=OdometryOptions(init_num_frames=2, voxel_size=0.05,
                                 sample_voxel_size=0.6, init_voxel_size=0.05,
                                 init_sample_voxel_size=0.6),
        icp=IcpOptions(min_number_neighbors=8, max_num_residuals=300,
                       size_voxel_map=0.5, num_iters_icp=6),
    )

    planes = synthetic.default_scene()
    cams = synthetic.make_trajectory(args.frames, args.width, args.height)
    fx = float(np.asarray(cams[0].fx))
    fe = LivoFrontend(config=cfg, fx=fx, fy=fx,
                      cx=(args.width - 1) / 2, cy=(args.height - 1) / 2,
                      width=args.width, height=args.height)
    mapper = IncrementalMapper(
        config=cfg,
        settings=RasterizeSettings(backend=args.backend),
        bootstrap_points=200, initial_capacity=8192)

    # ---- front-end streaming ----
    g = np.array([0, 0, 9.81])
    t = 0.0
    for _ in range(80):  # static IMU init
        fe.push_imu(t, np.zeros(3), g + rng.normal(0, 1e-3, 3))
        t += 0.005

    for k, cam in enumerate(cams):
        with Timer.evaluate("frontend_sweep"):
            R_wc = np.asarray(cam.R_cw).T
            center = np.asarray(cam.cam_center)
            pts_w = synthetic.sample_surface_points(cam, planes, 5000, rng)
            pts_sensor = (pts_w - center) @ R_wc
            fe.push_lidar(LidarSweep(t, pts_sensor,
                                     np.linspace(0, 0.09, len(pts_sensor)),
                                     np.zeros(len(pts_sensor))))
            for j in range(20):
                fe.push_imu(t + j * 0.005, np.zeros(3),
                            g + rng.normal(0, 1e-3, 3))
            fe.push_image(t + 0.095, synthetic.render_image(cam, planes))
            t += 0.1
        q, p = fe.pose
        outputs.append_tum_pose(os.path.join(args.out, "pose.txt"),
                                t, p, [q[1], q[2], q[3], q[0]])

    # NOTE: the demo front-end holds the sensor static per sweep packet (the
    # synthetic trajectory moves cameras for mapping variety); feed the
    # mapper with GT-posed frames like the dataset path would.
    frames = synthetic.make_sequence(args.frames, args.width, args.height,
                                     points_per_frame=5000)

    # ---- mapping ----
    for fr in frames:
        with Timer.evaluate("gsPointCloudUpdate"):
            stats = mapper.add_frame(fr)
    print("map:", stats)

    e0 = mapper.evaluate()
    for i in range(args.iters):
        with Timer.evaluate("optimize_vis_iter"):
            metrics = mapper.train_iteration()
        if metrics and i % 10 == 0:
            print(f"iter {i:4d} loss {float(metrics.loss):.4f} "
                  f"psnr {float(metrics.psnr):.2f} simi {float(metrics.simi):.4f}")
    e1 = mapper.evaluate()
    print(f"eval: psnr {e0['mean_psnr']:.2f} -> {e1['mean_psnr']:.2f}, "
          f"ssim {e0['mean_ssim']:.3f} -> {e1['mean_ssim']:.3f}")

    # ---- artifacts (saveRender / saveColorPoints equivalents) ----
    mapper.save_ply(os.path.join(args.out, "map.ply"))
    colored = fe.color_map
    ok = colored.n_rgb >= cfg.map.pub_point_minimum_views
    outputs.save_pcd_rgb(os.path.join(args.out, "rgb_map.pcd"),
                         colored.position[ok].astype(np.float32),
                         np.clip(colored.rgb[ok], 0, 255).astype(np.uint8))
    os.makedirs(os.path.join(args.out, "training"), exist_ok=True)
    for i in range(len(mapper.cameras)):
        out = mapper.render_keyframe(i)
        outputs.save_side_by_side(
            os.path.join(args.out, "training", f"{i}.png"),
            np.asarray(out.color), mapper.gt_images[i])
    outputs.write_cfg_args(args.out, cfg.model.sh_degree,
                           cfg.model.white_background)
    Timer.dump_into_file(len(mapper.cameras), (time.time() - t_wall0) * 1e3,
                         os.path.join(args.out, "log_time.txt"))

    from gslivm_tpu.utils import metrics as M
    res = M.evaluate_dir(os.path.join(args.out, "training"))
    print("offline eval harness:", res)
    print("artifacts in", args.out, ":", sorted(os.listdir(args.out)))


if __name__ == "__main__":
    main()
