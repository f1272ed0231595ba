"""SSIM blur strategy A/B at 1080p (r4).

The 11-tap separable gaussian blur is a band matrix on each image axis, so
each blur pass can ride the MXU as a dense [N, N] matmul instead of 11
shifted VPU adds: candidates measure the full SSIM fwd+bwd with

  S0  current shift-add chains (losses.ssim)
  S1  band-matmul blur, precision=HIGHEST (bf16x6 ~ f32-faithful)
  S2  band-matmul blur, precision=default (bf16 inputs, f32 accum)
  S3  S0 but with the GT-side blurs (mu2, sigma2_sq) HOISTED out of the
      step — they are constants per keyframe in the training loop
  S4  S1 + hoisted GT stats

plus max|delta| of loss and d(img1) vs S0 (f32 reference) for each.

Run ALONE on the real TPU chip: python tools/microbench_ssim2.py
"""
from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax  # noqa: E402

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                 ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402
from tputime import report  # noqa: E402

from gslivm_tpu.ops import losses as L  # noqa: E402

H, W = 1080, 1920
_C1 = 0.01 ** 2
_C2 = 0.03 ** 2


def band_matrix(n: int, taps: np.ndarray) -> np.ndarray:
    k = len(taps)
    r = k // 2
    b = np.zeros((n, n), np.float32)
    for i in range(k):
        d = i - r
        v = float(taps[i])
        b += np.diag(np.full(n - abs(d), v, np.float32), k=d)
    return b


def make_mm_blur(precision):
    taps = L.gaussian_1d(11, 1.5)
    bw = jnp.asarray(band_matrix(W, taps))
    bh = jnp.asarray(band_matrix(H, taps))

    def blur(img):  # [C, H, W]
        x = jnp.einsum("chw,wv->chv", img, bw, precision=precision)
        return jnp.einsum("chv,hu->cuv", x, bh, precision=precision)

    return blur


def ssim_with(blur, img1, img2, pre=None):
    mu1 = blur(img1)
    mu1_sq = mu1 * mu1
    s1 = blur(img1 * img1) - mu1_sq
    if pre is None:
        mu2 = blur(img2)
        s2 = blur(img2 * img2) - mu2 * mu2
    else:
        mu2, s2 = pre
    mu1_mu2 = mu1 * mu2
    s12 = blur(img1 * img2) - mu1_mu2
    m = ((2.0 * mu1_mu2 + _C1) * (2.0 * s12 + _C2)) / (
        (mu1_sq + mu2 * mu2 + _C1) * (s1 + s2 + _C2))
    return m.mean()


def main():
    rng = np.random.default_rng(0)
    img1 = jnp.asarray(rng.uniform(size=(3, H, W)), jnp.float32)
    img2 = jnp.asarray(rng.uniform(size=(3, H, W)), jnp.float32)

    sa_blur = lambda x: L._gaussian_blur_shift_add(  # noqa: E731
        x, L.gaussian_1d(11, 1.5))
    hi_blur = make_mm_blur(jax.lax.Precision.HIGHEST)
    lo_blur = make_mm_blur(jax.lax.Precision.DEFAULT)

    def f0(a):
        return ssim_with(sa_blur, a, img2)

    def f1(a):
        return ssim_with(hi_blur, a, img2)

    def f2(a):
        return ssim_with(lo_blur, a, img2)

    pre_sa = jax.jit(lambda b: (sa_blur(b),
                                sa_blur(b * b) - sa_blur(b) ** 2))(img2)
    pre_hi = jax.jit(lambda b: (hi_blur(b),
                                hi_blur(b * b) - hi_blur(b) ** 2))(img2)

    def f3(a):
        return ssim_with(sa_blur, a, img2, pre=pre_sa)

    def f4(a):
        return ssim_with(hi_blur, a, img2, pre=pre_hi)

    v0, g0 = jax.jit(jax.value_and_grad(f0))(img1)
    v0 = float(v0)
    g0 = np.asarray(g0)
    gs = float(np.abs(g0).max())
    for name, f in [("S1 mm-HIGHEST", f1), ("S2 mm-default", f2),
                    ("S3 shift-add+gt-hoist", f3), ("S4 mm-HI+gt-hoist", f4)]:
        v, g = jax.jit(jax.value_and_grad(f))(img1)
        print(f"{name}: dvalue {abs(float(v) - v0):.2e}  "
              f"dgrad {float(np.abs(np.asarray(g) - g0).max()) / gs:.2e}"
              f" (rel)", flush=True)

    report("S0 shift-add (current)", jax.value_and_grad(f0), img1)
    report("S1 band-matmul HIGHEST", jax.value_and_grad(f1), img1)
    report("S2 band-matmul default", jax.value_and_grad(f2), img1)
    report("S3 shift-add + gt hoist", jax.value_and_grad(f3), img1)
    report("S4 band-matmul HI + gt hoist", jax.value_and_grad(f4), img1)


if __name__ == "__main__":
    main()
