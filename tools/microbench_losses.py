"""Microbench: image-loss cost at 1080p on TPU (fwd+bwd).

Isolates the non-render overhead seen in bench.py's train_step_ms:
SSIM's five 11x11 depthwise convs, L1, PSNR, Adam. Run on TPU.
"""
from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

W, H = 1920, 1080


def main():
    import jax
    import jax.numpy as jnp
    from tputime import report

    from gslivm_tpu.ops import losses as L

    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.uniform(size=(3, H, W)), jnp.float32)
    b = jnp.asarray(rng.uniform(size=(3, H, W)), jnp.float32)

    def ssim_loss(x):
        return 1.0 - L.ssim(x, b)

    def l1(x):
        return L.l1_loss(x, b)

    def image_loss(x):
        return L.image_loss(x, b)

    report("ssim fwd", ssim_loss, a)
    report("ssim fwd+bwd", jax.grad(ssim_loss), a)
    report("l1 fwd+bwd", jax.grad(l1), a)
    report("image_loss fwd+bwd", jax.grad(image_loss), a)
    report("psnr fwd", L.psnr, a, b)

    # separable variant candidate
    g1 = L.gaussian_1d()

    def conv_sep(img):
        k = g1.shape[0]
        lhs = img[None]
        rh = jnp.broadcast_to(jnp.asarray(g1).reshape(1, 1, 1, k),
                              (3, 1, 1, k))
        rv = jnp.broadcast_to(jnp.asarray(g1).reshape(1, 1, k, 1),
                              (3, 1, k, 1))
        out = jax.lax.conv_general_dilated(
            lhs, rh, (1, 1), [(0, 0), (k // 2, k // 2)],
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
            feature_group_count=3, precision=jax.lax.Precision.HIGHEST)
        out = jax.lax.conv_general_dilated(
            out, rv, (1, 1), [(k // 2, k // 2), (0, 0)],
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
            feature_group_count=3, precision=jax.lax.Precision.HIGHEST)
        return out[0]

    def ssim_sep(x):
        conv = conv_sep
        mu1, mu2 = conv(x), conv(b)
        s1 = conv(x * x) - mu1 * mu1
        s2 = conv(b * b) - mu2 * mu2
        s12 = conv(x * b) - mu1 * mu2
        m = ((2 * mu1 * mu2 + 0.01**2) * (2 * s12 + 0.03**2)) / (
            (mu1**2 + mu2**2 + 0.01**2) * (s1 + s2 + 0.03**2))
        return 1.0 - m.mean()

    v1 = float(ssim_loss(a))
    v2 = float(ssim_sep(a))
    print(f"ssim 2d={v1:.6f} separable={v2:.6f} diff={abs(v1-v2):.2e}")
    report("ssim separable fwd+bwd", jax.grad(ssim_sep), a)




def main_stack():
    """A/B: stacked-5-blur ssim (current) vs five separate blur chains."""
    import jax
    import jax.numpy as jnp
    from tputime import report

    from gslivm_tpu.ops import losses as L

    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.uniform(size=(3, H, W)), jnp.float32)
    b = jnp.asarray(rng.uniform(size=(3, H, W)), jnp.float32)
    taps = L.gaussian_1d()
    _C1, _C2 = L._C1, L._C2

    def ssim_sep(img1):
        img2 = b
        conv = lambda x: L._gaussian_blur_shift_add(x, taps)
        mu1 = conv(img1)
        mu2 = conv(img2)
        mu1_sq = mu1 * mu1
        mu2_sq = mu2 * mu2
        mu1_mu2 = mu1 * mu2
        sigma1_sq = conv(img1 * img1) - mu1_sq
        sigma2_sq = conv(img2 * img2) - mu2_sq
        sigma12 = conv(img1 * img2) - mu1_mu2
        m = ((2.0 * mu1_mu2 + _C1) * (2.0 * sigma12 + _C2)) / (
            (mu1_sq + mu2_sq + _C1) * (sigma1_sq + sigma2_sq + _C2))
        return 1.0 - m.mean()

    def ssim_stacked(x):
        return 1.0 - L.ssim(x, b)

    report("ssim STACKED fwd+bwd", jax.grad(ssim_stacked), a)
    report("ssim separate fwd+bwd", jax.grad(ssim_sep), a)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "stack":
        main_stack()
    else:
        main()
