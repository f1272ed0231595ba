"""Pixel-axis scaling projection from ONE real chip (docs/scaling.md).

Multi-chip hardware is unavailable here, but pixel-band sharding has a
property that makes projection honest: each device of an N-way "pixel"
axis executes EXACTLY the band-restricted pipeline `rasterize_pallas(...,
band_rows=ceil(sgrid_y/N))` that this tool times on the single real chip.
The projected per-chip step time at N devices = measured band(N) fwd+bwd
time + the collective costs (computed from exact byte counts and link
bandwidths below, since the collectives cannot run on one chip).

Run on the real TPU: python tools/band_projection.py
Prints one JSON row per N with measured band time and projected step/FPS.
"""
from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

WIDTH, HEIGHT = 1920, 1080
N_GAUSS = 200_000
BLOCK = (2, 2)
MAXCH = 16
SLACK = 0.35
# v5e per-chip interconnect: 4 ICI links x ~400 Gbit/s bidirectional
# (~50 GB/s usable per direction per link; 2D torus). Conservative
# effective all_gather bandwidth per chip:
ICI_GBPS = 45.0


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                     ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from tputime import device_time_ms

    from gslivm_tpu.models.cameras import make_camera
    from gslivm_tpu.ops.rasterize_pallas import rasterize_pallas
    from gslivm_tpu.ops.rasterize_reference import tile_grid

    rng = np.random.default_rng(0)
    n = N_GAUSS
    means = jnp.asarray(rng.normal(0, 2.0, (n, 3)) + [0, 0, 6.0], jnp.float32)
    scales = jnp.asarray(rng.uniform(0.01, 0.05, (n, 3)), jnp.float32)
    q = rng.normal(size=(n, 4))
    quats = jnp.asarray(q / np.linalg.norm(q, axis=1, keepdims=True),
                        jnp.float32)
    opac = jnp.asarray(rng.uniform(0.3, 0.9, (n,)), jnp.float32)
    shs = jnp.asarray(rng.uniform(-0.3, 0.8, (n, 1, 3)), jnp.float32)
    cam = make_camera(np.eye(3), np.zeros(3), WIDTH, HEIGHT, fovx=1.2,
                      fovy=0.8)

    bx, by = BLOCK
    _, grid_y = tile_grid(WIDTH, HEIGHT)
    sgrid_y = -(-grid_y // by)

    base_ms = None
    for N in (1, 2, 4, 8, 16):
        band_rows = -(-sgrid_y // N)
        band_start = (sgrid_y - band_rows) // 2  # central band: densest
        # instance budget scales with the band share (+margin)
        maxi = max(1 << 17, int(900_000 // N * 1.4 // 128) * 128)

        def loss(means, scales, quats, opac, shs):
            out = rasterize_pallas(
                means, scales, quats, opac, shs, cam,
                max_instances=maxi, capacity_slack=SLACK,
                block_x=bx, block_y=by, max_chunks_per_tile=MAXCH,
                band_rows=band_rows, band_start=band_start)
            return jnp.sum(out.color) + 0.1 * jnp.sum(out.acc)

        g = jax.grad(loss, argnums=(0, 1, 2, 3, 4))
        ms = device_time_ms(g, means, scales, quats, opac, shs)
        if base_ms is None:
            base_ms = ms

        # collective cost model (exact byte counts at f32):
        band_px = band_rows * 16 * by * WIDTH
        # image all_gather over "pixel": each chip receives (N-1) bands x 5
        # rows (C3 D A) — ring all_gather moves (N-1)/N of the full image
        img_bytes = 5 * band_px * (N - 1) * 4
        # gradient story: pixel-band grads need NO reduction (disjoint
        # pixels); the per-gaussian grads psum over "pixel" = 10 rows x P
        grad_bytes = 2 * 10 * N_GAUSS * 4 * (N - 1) / max(N, 1)
        comm_ms = (img_bytes + grad_bytes) / (ICI_GBPS * 1e9) * 1e3
        step_ms = ms + comm_ms
        print(json.dumps({
            "pixel_devices": N,
            "band_rows": band_rows,
            "band_ms_measured": round(ms, 2),
            "comm_ms_modeled": round(comm_ms, 3),
            "step_ms_projected": round(step_ms, 2),
            "fps_projected": round(1e3 / step_ms, 2),
            "speedup_vs_1": round(base_ms / step_ms, 2),
            "max_instances": maxi,
        }), flush=True)


if __name__ == "__main__":
    main()
