"""Microbench: 4 separate taps vs one [2,2]-slice gather for bilinear
grid sampling at 1080p (the delta-depth warp's hot op). Run on TPU."""
from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

H, W = 1080, 1920


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax
    from tputime import report

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                     ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(size=(H, W)), jnp.float32)
    x = jnp.asarray(rng.uniform(-2, W + 1, (H, W)), jnp.float32)
    y = jnp.asarray(rng.uniform(-2, H + 1, (H, W)), jnp.float32)

    def taps4(img, x, y):
        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        wx = x - x0
        wy = y - y0

        def tap(yy, xx):
            inside = (xx >= 0) & (xx <= W - 1) & (yy >= 0) & (yy <= H - 1)
            xi = jnp.clip(xx, 0, W - 1).astype(jnp.int32)
            yi = jnp.clip(yy, 0, H - 1).astype(jnp.int32)
            return jnp.where(inside, img[yi, xi], 0.0)

        v00 = tap(y0, x0)
        v01 = tap(y0, x0 + 1)
        v10 = tap(y0 + 1, x0)
        v11 = tap(y0 + 1, x0 + 1)
        return (v00 * (1 - wx) * (1 - wy) + v01 * wx * (1 - wy)
                + v10 * (1 - wx) * wy + v11 * wx * wy)

    def patch1(img, x, y):
        x0f = jnp.floor(x)
        y0f = jnp.floor(y)
        wx = x - x0f
        wy = y - y0f
        imgp = jnp.pad(img, ((2, 2), (2, 2)))
        y0 = (jnp.clip(y0f, -2, H) + 2).astype(jnp.int32).reshape(-1)
        x0 = (jnp.clip(x0f, -2, W) + 2).astype(jnp.int32).reshape(-1)
        idx = jnp.stack([y0, x0], axis=-1)
        dn = lax.GatherDimensionNumbers(
            offset_dims=(1, 2), collapsed_slice_dims=(),
            start_index_map=(0, 1))
        patch = lax.gather(imgp, idx, dn, slice_sizes=(2, 2))  # [N, 2, 2]
        v00 = patch[:, 0, 0].reshape(H, W)
        v01 = patch[:, 0, 1].reshape(H, W)
        v10 = patch[:, 1, 0].reshape(H, W)
        v11 = patch[:, 1, 1].reshape(H, W)
        return (v00 * (1 - wx) * (1 - wy) + v01 * wx * (1 - wy)
                + v10 * (1 - wx) * wy + v11 * wx * wy)

    def taps4_flat(img, x, y):
        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        wx = x - x0
        wy = y - y0
        flat = img.reshape(-1)

        def tap(yy, xx):
            inside = (xx >= 0) & (xx <= W - 1) & (yy >= 0) & (yy <= H - 1)
            xi = jnp.clip(xx, 0, W - 1).astype(jnp.int32)
            yi = jnp.clip(yy, 0, H - 1).astype(jnp.int32)
            v = flat[(yi * W + xi).reshape(-1)].reshape(H, W)
            return jnp.where(inside, v, 0.0)

        v00 = tap(y0, x0)
        v01 = tap(y0, x0 + 1)
        v10 = tap(y0 + 1, x0)
        v11 = tap(y0 + 1, x0 + 1)
        return (v00 * (1 - wx) * (1 - wy) + v01 * wx * (1 - wy)
                + v10 * (1 - wx) * wy + v11 * wx * wy)

    c = jax.jit(taps4_flat)(img, x, y)
    a = jax.jit(taps4)(img, x, y)
    dc = float(jnp.abs(a - c).max())
    print("max |taps4 - flat| =", dc)
    assert dc < 1e-6, dc
    b = jax.jit(patch1)(img, x, y)
    d = float(jnp.abs(a - b).max())
    print("max |taps4 - patch1| =", d)
    assert d < 1e-6, d
    report("4 separate taps fwd", taps4, img, x, y)
    report("[2,2]-slice gather fwd", patch1, img, x, y)
    report("4 FLAT taps fwd", taps4_flat, img, x, y)
    report("4 taps fwd+bwd(img)",
           jax.grad(lambda i, x, y: taps4(i, x, y).sum()), img, x, y)
    report("4 FLAT taps fwd+bwd(img)",
           jax.grad(lambda i, x, y: taps4_flat(i, x, y).sum()), img, x, y)


if __name__ == "__main__":
    main()
