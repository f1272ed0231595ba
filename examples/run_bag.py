"""Run the full LIVO + 3DGS mapping system on a ROS1 bag.

The ROS-free equivalent of the reference's `roslaunch livo_*.launch` +
`rosbag play` flow: streams the bag through the LivoFrontend (ESKF + plane
ICP + VIO), feeds posed colored frames into the TPU-side IncrementalMapper,
interleaves training, and writes the reference's artifact set.

Usage:
  python examples/run_bag.py BAG --dataset configs/datasets/r3live.yaml \
      [--out DIR] [--train-iters-per-frame 10] [--max-messages N]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _vec(s: str):
    import numpy as np

    return np.asarray([float(x) for x in str(s).split(",")])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("bag")
    ap.add_argument("--dataset", required=True,
                    help="dataset yaml (configs/datasets/*.yaml)")
    ap.add_argument("--common", default="configs/basic_common.yaml")
    ap.add_argument("--out", default="output")
    ap.add_argument("--train-iters-per-frame", type=int, default=10)
    ap.add_argument("--max-messages", type=int, default=None)
    ap.add_argument("--backend", default="auto")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--watchdog-period", type=float, default=1000.0,
                    help="stall-watchdog check period in seconds "
                         "(heartHandler analog)")
    ap.add_argument("--overlap", action="store_true",
                    help="train in a worker thread overlapped with bag "
                         "decoding + odometry (optimize_vis thread analog)")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    try:
        jax.config.update("jax_compilation_cache_dir", os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    import numpy as np

    from gslivm_tpu.config import load_config, load_yaml
    from gslivm_tpu.frontend import rosbag
    from gslivm_tpu.frontend.livo import LivoFrontend
    from gslivm_tpu.ops.rasterize import RasterizeSettings
    from gslivm_tpu.pipeline import IncrementalMapper
    from gslivm_tpu.utils import outputs
    from gslivm_tpu.utils.timer import Timer

    os.makedirs(args.out, exist_ok=True)
    raw = load_yaml(args.dataset)
    ds = raw["dataset"]
    overrides = {k: v for k, v in raw.items() if k != "dataset"}
    cfg = load_config(dataset_overrides=overrides,
                      common_overrides=load_yaml(args.common))

    fe = LivoFrontend(
        config=cfg,
        fx=ds["fx"], fy=ds["fy"], cx=ds["cx"], cy=ds["cy"],
        width=ds["image_width"], height=ds["image_height"],
        R_imu_lidar=_vec(ds["R_imu_lidar"]).reshape(3, 3),
        t_imu_lidar=_vec(ds["t_imu_lidar"]),
        R_imu_camera=_vec(ds["R_imu_camera"]).reshape(3, 3),
        t_imu_camera=_vec(ds["t_imu_camera"]),
        distortion=[ds["dist_k1"], ds["dist_k2"], ds["dist_p1"],
                    ds["dist_p2"], ds["dist_k3"]],
        image_resize_ratio=float(ds.get("image_resize_ratio", 1.0)),
    )
    mapper = IncrementalMapper(config=cfg,
                               settings=RasterizeSettings(backend=args.backend))

    # stall watchdog (heartHandler analog, lioOptimization.cpp:236,760-765):
    # once mapping has started, a check-period with no sensor data ends the
    # run and falls through to the shutdown artifacts below
    from gslivm_tpu.utils.watchdog import StallWatchdog

    dog = StallWatchdog(period_s=args.watchdog_period)
    dog.start()

    cm = None
    if args.overlap:
        from gslivm_tpu.pipeline import ConcurrentMapper

        cm = ConcurrentMapper(mapper,
                              iters_per_frame=args.train_iters_per_frame)

    t0 = time.time()
    t_frontend = 0.0
    count = 0
    trained = 0
    for msg in rosbag.read_bag(
            args.bag, {ds["imu_topic"], ds["lidar_topic"], ds["image_topic"]}):
        if dog.stopped:
            print("watchdog: no sensor data for a full period — stopping")
            break
        tf0 = time.perf_counter()
        rec = rosbag.decode(msg, lidar_type=cfg.common.lidar_type)
        from gslivm_tpu.frontend.sensors import ImageSample, ImuSample, LidarSweep

        if isinstance(rec, ImuSample):
            dog.notify_data()  # is_received_data (imuHandler:768)
            fe.push_imu(rec.t, rec.gyr, rec.acc)
        elif isinstance(rec, LidarSweep):
            with Timer.evaluate("lidar_sweep"):
                fe.push_lidar(rec)
        elif isinstance(rec, ImageSample):
            with Timer.evaluate("image_frame"):
                fe.push_image(rec.t, rec.image)
        t_frontend += time.perf_counter() - tf0
        count += 1
        if args.max_messages and count >= args.max_messages:
            break

        for frame in fe.pop_frames():
            q, p = fe.pose
            outputs.append_tum_pose(os.path.join(args.out, "pose.txt"),
                                    msg.t, p, [q[1], q[2], q[3], q[0]])
            if cm is not None:
                cm.submit_frame(frame)
                if mapper.started:
                    dog.notify_started()
                m = cm.last_metrics
                if m is not None and cm.trained % 50 == 0:
                    print(f"msgs {count:7d} gaussians "
                          f"{int(mapper.params.n_active):8d} "
                          f"kf {len(mapper.cameras):4d} "
                          f"loss {float(m.loss):.4f}", flush=True)
                continue
            with Timer.evaluate("gsPointCloudUpdate"):
                stats = mapper.add_frame(frame)
            if mapper.started:
                dog.notify_started()  # is_gs_started gate
            for _ in range(args.train_iters_per_frame):
                with Timer.evaluate("optimize_vis_iter"):
                    m = mapper.train_iteration()
            trained += args.train_iters_per_frame
            if m is not None:
                print(f"msgs {count:7d} gaussians {stats['active']:8d} "
                      f"kf {stats['keyframes']:4d} loss {float(m.loss):.4f} "
                      f"psnr {float(m.psnr):.2f}", flush=True)

    if cm is not None:
        mapper = cm.finish()
        trained = cm.trained
        import json

        wall = time.time() - t0
        serial_sum = t_frontend + cm.busy_s
        print("pipeline:", json.dumps({
            "mode": "overlap", "wall_s": round(wall, 3),
            "frontend_s": round(t_frontend, 3),
            "mapper_busy_s": round(cm.busy_s, 3),
            "serial_sum_s": round(serial_sum, 3),
            "overlap_gain": round(serial_sum / wall, 3) if wall else None,
            "train_iters": trained}), flush=True)

    # shutdown artifacts (saveRender / saveColorPoints equivalents)
    mapper.save_ply(os.path.join(args.out, "map.ply"))
    cm = fe.color_map
    ok = cm.n_rgb >= cfg.map.pub_point_minimum_views
    if ok.any():
        outputs.save_pcd_rgb(os.path.join(args.out, "rgb_map.pcd"),
                             cm.position[ok].astype(np.float32),
                             np.clip(cm.rgb[ok], 0, 255).astype(np.uint8))
    os.makedirs(os.path.join(args.out, "training"), exist_ok=True)
    for i in range(len(mapper.cameras)):
        out = mapper.render_keyframe(i)
        outputs.save_side_by_side(
            os.path.join(args.out, "training", f"{i}.png"),
            np.asarray(out.color), mapper.gt_images[i])
    Timer.dump_into_file(max(len(mapper.cameras), 1),
                         (time.time() - t0) * 1e3,
                         os.path.join(args.out, "log_time.txt"))
    print("eval:", mapper.evaluate())
    print("artifacts in", args.out)


if __name__ == "__main__":
    main()
