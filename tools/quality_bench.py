"""Quality benchmark: prove the framework converges to reference-class
PSNR at a realistic resolution (VERDICT r3 next #3).

Runs the INCREMENTAL mapping pipeline (GPR init -> growth -> production
3-camera train iterations with the pallas rasterizer) on the synthetic
textured-room scene at botanic-garden shape (960x600,
/root/reference/config/botanic_garden.yaml image_width/height * 0.5 ratio)
and emits {psnr_curve, final_psnr, final_ssim, depth_l1} to
QUALITY_r*.json. Methodology parity: evaluate_image.py computes PSNR/SSIM
over render|GT pairs and see_depth_l1.py inverse-depth L1
(/root/reference/python/evaluate_image.py:17-52, see_depth_l1.py:53-59);
the synthetic scene's exact geometry provides the GT depth a real dataset
lacks.

Usage: python tools/quality_bench.py [--iters 400] [--out QUALITY_r04.json]
Run ALONE on the TPU (one job at a time).
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=960)
    ap.add_argument("--height", type=int, default=600)
    ap.add_argument("--keyframes", type=int, default=30)
    ap.add_argument("--iters", type=int, default=400)
    ap.add_argument("--points-per-frame", type=int, default=30000)
    ap.add_argument("--grid", type=float, default=0.12)
    ap.add_argument("--curve-every", type=int, default=50)
    ap.add_argument("--psnr-floor", type=float, default=25.0)
    ap.add_argument("--pos-lr-final", type=float, default=5e-5)
    ap.add_argument("--scale-lr-final", type=float, default=2.5e-4)
    ap.add_argument("--out", default=None)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

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
    from gslivm_tpu.ops import losses as loss_ops
    from gslivm_tpu.ops.rasterize import RasterizeSettings
    from gslivm_tpu.pipeline import IncrementalMapper

    # offline STATIC optimization: enable the max-scale prune criterion
    # (config.py GsOptimParams.prune_max_scale) — without it a few
    # gaussians blow up exponentially in scale after ~700 iters and occlude
    # the scene (measured r4: max scale 0.3 -> 44 m, PSNR 25.7 -> 19)
    cfg = Config(gp=GpParams(grid=args.grid),
                 gs=GsOptimParams(
                     prune_interval=100, prune_max_scale=0.5,
                     # offline convergence needs the (reference-defined,
                     # never-constructed) Expon_lr decay: constant LRs keep
                     # geometry oscillating between per-camera fits after
                     # ~700 iters (PSNR 25.7 -> 19 measured without decay)
                     lr_max_steps=args.iters,
                     position_lr_final=args.pos_lr_final,
                     scaling_lr_final=args.scale_lr_final))
    frames = synthetic.make_sequence(
        n_frames=args.keyframes, width=args.width, height=args.height,
        points_per_frame=args.points_per_frame)

    mapper = IncrementalMapper(
        config=cfg,
        settings=RasterizeSettings(backend="auto", max_instances=1 << 20),
        bootstrap_points=500,
        initial_capacity=1 << 17,
    )

    t0 = time.time()
    for fr in frames:
        stats = mapper.add_frame(fr)
    t_ingest = time.time() - t0
    print(f"ingest: {stats['active']} gaussians, {len(mapper.cameras)} "
          f"keyframes, {t_ingest:.1f}s", flush=True)

    def kf_indices(k=6):
        return np.linspace(0, len(mapper.cameras) - 1, k).astype(int)

    def sampled_psnr():
        vals = []
        for i in kf_indices():
            out = mapper.render_keyframe(int(i))
            vals.append(float(loss_ops.psnr(
                out.color, jnp.asarray(mapper.gt_images[int(i)]))))
        return float(np.mean(vals))

    curve = [(0, sampled_psnr())]
    print(f"iter 0: psnr {curve[0][1]:.2f}", flush=True)
    t0 = time.time()
    for i in range(1, args.iters + 1):
        m = mapper.train_iteration()
        if i % args.curve_every == 0:
            p = sampled_psnr()
            curve.append((i, p))
            sc = np.asarray(jnp.exp(mapper.params.scaling[
                :int(mapper.params.n_active)]))
            print(f"iter {i}: psnr {p:.2f} loss {float(m.loss):.4f} "
                  f"(img {float(m.image_loss):.4f} simi {float(m.simi):.4f} "
                  f"delta {float(m.delta):.4f}) "
                  f"scale mean {sc.mean():.4f} p99 "
                  f"{np.percentile(sc, 99):.3f} max {sc.max():.3f} "
                  f"overflow {int(m.overflow)}", flush=True)
    t_train = time.time() - t0

    ev = mapper.evaluate()  # all keyframes, evaluate_image.py methodology

    # per-keyframe spread (VERDICT r4 weak #1: the all-keyframe mean hid
    # WHICH views dragged it; report every view so a tail is visible)
    per_kf = []
    for i in range(len(mapper.cameras)):
        out = mapper.render_keyframe(i)
        p_i, s_i = mapper._pair_metrics_jit(out.color, mapper._gt_device[i])
        per_kf.append(round(float(p_i), 2))
    print("per-keyframe PSNR:", " ".join(f"{v:.1f}" for v in per_kf),
          flush=True)

    # inverse-depth L1 vs exact ray-cast geometry (see_depth_l1.py:53-59),
    # over pixels where BOTH the render is opaque and the GT hits a surface
    planes = synthetic.default_scene()
    dls = []
    for i in kf_indices():
        out = mapper.render_keyframe(int(i))
        gt_d = synthetic.render_depth(mapper.cameras[int(i)], planes)
        rd = np.asarray(out.depth)
        acc = np.asarray(out.acc)
        mask = (acc > 0.5) & np.isfinite(gt_d)
        inv_r = np.where(rd > 1e-2, 1.0 / np.maximum(rd, 1e-2), 0.0)
        inv_g = np.where(np.isfinite(gt_d), 1.0 / np.maximum(gt_d, 1e-2), 0.0)
        dls.append(float(np.abs(inv_r - inv_g)[mask].mean()))
    depth_l1 = float(np.mean(dls))

    result = {
        "metric": "quality_synthetic_960x600",
        "final_psnr": round(ev["mean_psnr"], 2),
        "final_ssim": round(ev["mean_ssim"], 4),
        "depth_l1_inv": round(depth_l1, 5),
        "psnr_curve": [[i, round(p, 2)] for i, p in curve],
        "per_keyframe_psnr": per_kf,
        "min_keyframe_psnr": min(per_kf) if per_kf else 0.0,
        "iters": args.iters,
        "train_s": round(t_train, 1),
        "iters_per_s": round(args.iters / t_train, 2),
        "gaussians": int(stats["active"]),
        "keyframes": len(mapper.cameras),
        "resolution": f"{args.width}x{args.height}",
        "device": str(jax.devices()[0]),
        "psnr_floor": args.psnr_floor,
    }
    print(json.dumps(result), flush=True)
    if args.out:
        with open(args.out, "w") as f:
            json.dump(result, f, indent=1)
    assert ev["mean_psnr"] >= args.psnr_floor, (
        f"final PSNR {ev['mean_psnr']:.2f} dB below pinned floor "
        f"{args.psnr_floor}")


if __name__ == "__main__":
    main()
