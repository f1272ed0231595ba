"""Quality diagnosis harness for the 960x600 synthetic convergence run
(VERDICT r4 next #1): WHERE does the 22 dB plateau come from?

Three probes, all sharing the quality_bench scene/config:

  init      ingest only — per-keyframe PSNR of the freshly GP-initialized
            map (bounds the colorization/init quality), error-map PNGs.
  pipeline  the quality_bench flow with per-keyframe PSNR (all K), LR
            overrides, and error-map dumps for the worst/median/best views.
  oracle    ceiling probe — bypass the GP front-end: splats planted on a
            regular grid over the exact scene surfaces with exact texture
            colors, then optimized. If the oracle can't pass the floor,
            the limiter is density/representation, not the front-end.

Usage:
  python tools/quality_diag.py init     [--grid 0.12]
  python tools/quality_diag.py pipeline [--iters 800] [--feature-lr 0.004]
  python tools/quality_diag.py oracle   [--spacing 0.05] [--iters 1000]
Run ALONE on the TPU (one job at a time). --cpu for small-shape smoke.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))


def build_argparser():
    ap = argparse.ArgumentParser()
    ap.add_argument("mode", choices=["init", "pipeline", "oracle"])
    ap.add_argument("--width", type=int, default=960)
    ap.add_argument("--height", type=int, default=600)
    ap.add_argument("--keyframes", type=int, default=30)
    ap.add_argument("--iters", type=int, default=800)
    ap.add_argument("--points-per-frame", type=int, default=30000)
    ap.add_argument("--grid", type=float, default=0.12)
    ap.add_argument("--curve-every", type=int, default=100)
    ap.add_argument("--feature-lr", type=float, default=None)
    ap.add_argument("--position-lr", type=float, default=None)
    ap.add_argument("--opacity-lr", type=float, default=None)
    ap.add_argument("--pos-lr-final", type=float, default=5e-5)
    ap.add_argument("--scale-lr-final", type=float, default=2.5e-4)
    ap.add_argument("--no-decay", action="store_true")
    ap.add_argument("--spacing", type=float, default=0.05,
                    help="oracle splat grid spacing (m)")
    ap.add_argument("--cov-frac", type=float, default=0.5,
                    help="oracle cov sigma as a fraction of spacing (pre "
                         "scale_factor-3 inflation)")
    ap.add_argument("--dump-dir", default=None)
    ap.add_argument("--out", default=None)
    ap.add_argument("--cpu", action="store_true")
    return ap


def main():
    args = build_argparser().parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "..", ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp
    import numpy as np

    from gslivm_tpu.config import Config, GpParams, GsOptimParams
    from gslivm_tpu.frontend import synthetic
    from gslivm_tpu.models import gaussian_model as gm  # noqa: F401
    from gslivm_tpu.ops.rasterize import RasterizeSettings
    from gslivm_tpu.pipeline import IncrementalMapper
    from gslivm_tpu.utils.outputs import save_png

    gs_over = dict(prune_interval=100, prune_max_scale=0.5)
    if not args.no_decay:
        gs_over.update(lr_max_steps=args.iters,
                       position_lr_final=args.pos_lr_final,
                       scaling_lr_final=args.scale_lr_final)
    if args.feature_lr is not None:
        gs_over["feature_lr"] = args.feature_lr
    if args.position_lr is not None:
        gs_over["position_lr_init"] = args.position_lr
    if args.opacity_lr is not None:
        gs_over["opacity_lr"] = args.opacity_lr
    cfg = Config(gp=GpParams(grid=args.grid), gs=GsOptimParams(**gs_over))

    frames = synthetic.make_sequence(
        n_frames=args.keyframes, width=args.width, height=args.height,
        points_per_frame=args.points_per_frame)
    mapper = IncrementalMapper(
        config=cfg,
        settings=RasterizeSettings(backend="auto", max_instances=1 << 21),
        bootstrap_points=500,
        initial_capacity=1 << 17,
    )

    t0 = time.time()
    if args.mode == "oracle":
        stage_oracle(mapper, frames, args)
    else:
        for fr in frames:
            mapper.add_frame(fr)
    print(f"setup: {int(mapper.params.n_active)} gaussians, "
          f"{len(mapper.cameras)} keyframes, {time.time()-t0:.1f}s",
          flush=True)

    def per_keyframe():
        rows = []
        for i in range(len(mapper.cameras)):
            out = mapper.render_keyframe(i)
            p, s = mapper._pair_metrics_jit(out.color, mapper._gt_device[i])
            rows.append({
                "kf": i,
                "psnr": float(p),
                "ssim": float(s),
                "mean_acc": float(jnp.mean(out.acc)),
            })
        return rows

    def report(tag, rows):
        ps = np.array([r["psnr"] for r in rows])
        print(f"[{tag}] mean_psnr {ps.mean():.2f}  min {ps.min():.2f} "
              f"(kf {int(ps.argmin())})  max {ps.max():.2f} "
              f"(kf {int(ps.argmax())})  std {ps.std():.2f}", flush=True)
        print("  " + " ".join(f"{r['psnr']:.1f}" for r in rows), flush=True)
        return ps

    def dump(tag, indices):
        if not args.dump_dir:
            return
        os.makedirs(args.dump_dir, exist_ok=True)
        for i in indices:
            out = mapper.render_keyframe(int(i))
            r = np.asarray(out.color).transpose(1, 2, 0)
            g = mapper.gt_images[int(i)].transpose(1, 2, 0)
            err = np.abs(r - g).mean(-1)
            sbs = np.concatenate([r, g], axis=1)
            save_png(os.path.join(args.dump_dir, f"{tag}_kf{i:02d}_sbs.png"),
                     (np.clip(sbs, 0, 1) * 255).astype(np.uint8))
            emap = np.clip(err / 0.25, 0, 1)  # 0.25 |err| saturates
            save_png(os.path.join(args.dump_dir, f"{tag}_kf{i:02d}_err.png"),
                     (np.stack([emap] * 3, -1) * 255).astype(np.uint8))
            print(f"  dumped kf {i}: mean|err| {err.mean():.4f}, "
                  f"p99 {np.percentile(err, 99):.3f}, "
                  f"top1% share of sq err "
                  f"{top_share(err):.2f}", flush=True)

    def top_share(err, frac=0.01):
        sq = np.sort((err ** 2).ravel())[::-1]
        k = max(1, int(len(sq) * frac))
        return float(sq[:k].sum() / max(sq.sum(), 1e-12))

    rows0 = per_keyframe()
    ps0 = report("init" if args.mode != "oracle" else "oracle-init", rows0)
    dump("init", [int(ps0.argmin()), len(rows0) // 2, int(ps0.argmax())])

    result = {"mode": args.mode, "init_psnr": rows0,
              "gaussians": int(mapper.params.n_active),
              "config": gs_over, "grid": args.grid}

    if args.mode != "init":
        curve = []
        t0 = time.time()
        for i in range(1, args.iters + 1):
            m = mapper.train_iteration()
            if i % args.curve_every == 0:
                ev = mapper.evaluate()
                sc = np.asarray(jnp.exp(mapper.params.scaling[
                    :int(mapper.params.n_active)]))
                curve.append((i, round(ev["mean_psnr"], 2)))
                print(f"iter {i}: psnr {ev['mean_psnr']:.2f} "
                      f"ssim {ev['mean_ssim']:.4f} "
                      f"loss {float(m.loss):.4f} "
                      f"scale p99 {np.percentile(sc, 99):.3f} "
                      f"max {sc.max():.2f} "
                      f"n {int(mapper.params.n_active)}", flush=True)
        t_train = time.time() - t0
        rows1 = per_keyframe()
        ps1 = report("final", rows1)
        dump("final", [int(ps1.argmin()), len(rows1) // 2, int(ps1.argmax())])
        result.update(final_psnr=rows1, psnr_curve=curve,
                      iters=args.iters, train_s=round(t_train, 1),
                      iters_per_s=round(args.iters / t_train, 2))

    if args.out:
        with open(args.out, "w") as f:
            json.dump(result, f, indent=1)
    print("DONE", flush=True)


def stage_oracle(mapper, frames, args):
    """Plant splats on a regular grid over the exact scene surfaces with
    exact texture colors; stage the frames' cameras as keyframes."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from gslivm_tpu.frontend import synthetic
    from gslivm_tpu.models import gaussian_model as gm

    pts, cols = [], []
    for pid, pl in enumerate(synthetic.default_scene()):
        n = max(2, int(round(2 * pl.extent / args.spacing)))
        u = np.linspace(-pl.extent + args.spacing / 2,
                        pl.extent - args.spacing / 2, n)
        uu, vv = np.meshgrid(u, u, indexing="ij")
        v_axis = np.cross(pl.normal, pl.u_axis)
        xyz = (pl.point[None, None]
               + uu[..., None] * pl.u_axis[None, None]
               + vv[..., None] * v_axis[None, None])
        pts.append(xyz.reshape(-1, 3))
        cols.append(synthetic._texture(pid, uu, vv).reshape(-1, 3) * 255.0)
    xyz = np.concatenate(pts).astype(np.float32)
    rgb = np.concatenate(cols).astype(np.float32)
    m = xyz.shape[0]
    sig = args.spacing * args.cov_frac
    cov = np.broadcast_to(np.eye(3) * sig * sig, (m, 3, 3)).astype(np.float32)
    cap = 1 << int(np.ceil(np.log2(m + 1)))
    batch = gm.PointBatch(xyz=jnp.asarray(xyz), rgb=jnp.asarray(rgb),
                          cov=jnp.asarray(cov),
                          mask=jnp.ones((m,), bool))
    mapper.params = gm.create_from_points(
        batch, mapper.cfg.gs.scale_factor, cap,
        mapper.cfg.model.sh_degree)
    mapper.opt_state = mapper.optimizer.init(mapper.params)
    mapper.started = True
    for fr in frames:
        cam = fr.camera
        mapper.cameras.append(cam)
        gt = np.asarray(fr.image, np.float32).transpose(2, 0, 1) / 255.0
        mapper.gt_images.append(gt)
        mapper._gt_device.append(jax.device_put(gt))
        mapper._gt_stats.append(mapper._ref_stats_jit(mapper._gt_device[-1]))
    print(f"oracle: {m} splats at spacing {args.spacing} "
          f"(sigma {sig:.3f})", flush=True)


if __name__ == "__main__":
    main()
