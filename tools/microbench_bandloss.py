"""Measure the pixel-banded loss building blocks on the real chip at
1080p — the per-device loss cost that the v5e-16 projection in
docs/scaling.md must use now that SSIM/L1/delta-warp banding SHIPPED
(parallel/sharding.py:259-298; VERDICT r4 next #5 asked for the stale
"losses ~7 ms full-frame, banding future work" arithmetic to be re-derived
from measured band timings).

Bands run fine on one device with a fixed row_lo; each timing below is the
work ONE device of an N-way pixel axis performs per camera.

Run ALONE on the TPU: python tools/microbench_bandloss.py
"""
from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import jax  # noqa: E402

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                 ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402
from tputime import report  # noqa: E402

from gslivm_tpu.models.cameras import make_camera  # noqa: E402
from gslivm_tpu.models.training import (  # noqa: E402
    delta_depth_band_sum, delta_depth_loss)
from gslivm_tpu.ops import losses as loss_ops  # noqa: E402

W, H = 1920, 1080


def main():
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.uniform(size=(3, H, W)), jnp.float32)
    b = jnp.asarray(rng.uniform(size=(3, H, W)), jnp.float32)
    depth_a = jnp.asarray(rng.uniform(2.0, 8.0, (H, W)), jnp.float32)
    depth_b = jnp.asarray(rng.uniform(2.0, 8.0, (H, W)), jnp.float32)
    acc = jnp.ones((H, W), jnp.float32)
    cam_a = make_camera(np.eye(3), np.zeros(3), W, H, fovx=1.2, fovy=0.8)
    cam_b = make_camera(np.eye(3), np.asarray([0.05, 0.0, 0.0]), W, H,
                        fovx=1.2, fovy=0.8)

    # full-frame references (what ONE device paid pre-sharding)
    report("ssim full 1080p", lambda x, y: loss_ops.ssim(x, y), a, b)
    report("l1 full 1080p", lambda x, y: loss_ops.l1_loss(x, y), a, b)
    report("delta-warp full 1080p",
           lambda da, db: delta_depth_loss(da, acc, cam_a, db, acc, cam_b),
           depth_a, depth_b)

    for n_dev in (8, 16):
        n_rows = -(-H // n_dev)
        lo = jnp.asarray(2 * n_rows, jnp.int32)  # a mid-image band
        report(f"ssim band H/{n_dev} ({n_rows} rows)",
               lambda x, y, lo=lo, nr=n_rows: loss_ops.ssim_band_sum(
                   x, y, lo, nr), a, b)
        report(f"l1 band H/{n_dev}",
               lambda x, y, lo=lo, nr=n_rows: loss_ops.l1_band_sum(
                   x, y, lo, nr), a, b)
        report(f"delta band H/{n_dev}",
               lambda da, db, lo=lo, nr=n_rows: delta_depth_band_sum(
                   da, acc, cam_a, db, acc, cam_b, lo, nr),
               depth_a, depth_b)


if __name__ == "__main__":
    main()
