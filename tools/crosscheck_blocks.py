"""ON-TPU cross-check: render outputs + grads must agree across supertile
block shapes (the interpret-mode oracle tests can't catch a TPU-only
miscompile, so any block shape adopted from a sweep gets validated here
first). Run on the real chip: python tools/crosscheck_blocks.py [bx by]
"""
from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

WIDTH, HEIGHT = 1920, 1080
N = 200_000


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                     ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from gslivm_tpu.models.cameras import make_camera
    from gslivm_tpu.ops.rasterize_pallas import rasterize_pallas

    bx, by = (int(sys.argv[1]), int(sys.argv[2])) if len(sys.argv) > 2 \
        else (2, 4)

    rng = np.random.default_rng(0)
    means = jnp.asarray(rng.normal(0, 2.0, (N, 3)) + [0, 0, 6.0], jnp.float32)
    scales = jnp.asarray(rng.uniform(0.01, 0.05, (N, 3)), jnp.float32)
    q = rng.normal(size=(N, 4))
    quats = jnp.asarray(q / np.linalg.norm(q, axis=1, keepdims=True),
                        jnp.float32)
    opac = jnp.asarray(rng.uniform(0.3, 0.9, (N,)), jnp.float32)
    shs = jnp.asarray(rng.uniform(-0.3, 0.8, (N, 1, 3)), jnp.float32)
    cam = make_camera(np.eye(3), np.zeros(3), WIDTH, HEIGHT, fovx=1.2,
                      fovy=0.8)
    gt = jnp.zeros((3, HEIGHT, WIDTH), jnp.float32)

    def render(block, maxi):
        return rasterize_pallas(
            means, scales, quats, opac, shs, cam, max_instances=maxi,
            capacity_slack=0.3, block_x=block[0], block_y=block[1],
            max_chunks_per_tile=32)

    def lossf(block, maxi):
        def f(means, scales, quats, opac, shs):
            out = rasterize_pallas(
                means, scales, quats, opac, shs, cam, max_instances=maxi,
                capacity_slack=0.3, block_x=block[0], block_y=block[1],
                max_chunks_per_tile=32, depth_grad=False)
            return jnp.sum((out.color - gt) ** 2) + 0.1 * jnp.sum(out.acc)
        return f

    ref = jax.jit(lambda: render((2, 2), 914048))()
    alt = jax.jit(lambda: render((bx, by), 1 << 20))()
    print("overflow:", int(ref.overflow), int(alt.overflow))
    for name in ("color", "depth", "acc"):
        a = np.asarray(getattr(ref, name))
        b = np.asarray(getattr(alt, name))
        d = np.abs(a - b).max()
        print(f"{name}: max|diff| = {d:.3e}")
        assert d < 5e-4, (name, d)

    g_ref = jax.jit(jax.grad(lossf((2, 2), 914048), argnums=(0, 1, 2, 3, 4)))(
        means, scales, quats, opac, shs)
    g_alt = jax.jit(jax.grad(lossf((bx, by), 1 << 20),
                             argnums=(0, 1, 2, 3, 4)))(
        means, scales, quats, opac, shs)
    for nm, a, b in zip(("means", "scales", "quats", "opac", "shs"),
                        g_ref, g_alt):
        a, b = np.asarray(a), np.asarray(b)
        scale = np.abs(a).max() + 1e-8
        d = np.abs(a - b).max() / scale
        print(f"grad {nm}: rel max diff = {d:.3e}")
        assert d < 2e-3, (nm, d)
    print(f"cross-check OK: ({bx},{by}) matches (2,2) on TPU")


if __name__ == "__main__":
    main()
