"""Public differentiable rasterization API.

Mirrors the role of the reference torch autograd glue (`src/gs/rasterizer.cu`,
`rasterize_points.cu`): a single entry point that renders Color / Depth /
Silhouette images and defines the gradient contract.

Gradient contract (parity with _RasterizeGaussians, rasterizer.cu:71-110):
the backward consumes ONLY dL/d_color and dL/d_acc; the incoming depth
gradient is captured and silently DROPPED (rasterizer.cu:79 — the CUDA
backward API has no depth-grad input). `depth_grad=True` lifts this
restriction (an intentional capability the reference lacks; its delta-depth
loss is a no-op because of the drop, see SURVEY.md §2.3).

Backends:
  - "naive":  pure-JAX O(P*pixels) oracle (rasterize_reference.py)
  - "pallas": tile-binned Pallas TPU kernels (rasterize_pallas.py)
  - "auto":   pallas on TPU, naive elsewhere
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .rasterize_reference import RenderOutput, rasterize_naive


class RasterizeSettings(NamedTuple):
    """Static (hashable) rasterization configuration.

    Mirrors GaussianRasterizationSettings (rasterizer.cuh:8-20) minus the
    per-camera tensors, which travel in `Camera`.
    """

    sh_degree: int = 0
    scale_modifier: float = 1.0
    depth_grad: bool = False
    backend: str = "auto"
    # Pallas budgets. The defaults are deliberately loose starting points:
    # pipeline.IncrementalMapper FEEDBACK-FITS max_instances and
    # max_chunks_per_tile to the measured expansion after a window of steps
    # (and grows them on overflow), so production converges to the
    # scene-fitted configuration the benchmarks measure (docs/kernels.md).
    max_instances: int = 2**20       # pallas binning budget
    max_chunks_per_tile: int = 64    # pallas per-tile cap
    capacity_slack: float = 0.35     # pallas CHUNK-padding headroom
    # supertile factor: 2x2 is the measured sweet spot at production scale
    # (block sweep, docs/kernels.md) and within ~1% of 1x1 on tiny scenes
    block_x: int = 2
    block_y: int = 2
    # per-pixel n_contrib statistics (pallas only). True keeps full parity
    # with the oracle's n_contrib output; False skips ~5 VPU passes/chunk in
    # the forward kernel and returns n_contrib as zeros — safe for training
    # paths, which never consume it (the CUDA forward needs it only to seed
    # its backward walk, forward.cu:398-405; ours walks neff checkpoints).
    # NOTE: training.train_step force-overrides this to False — to inspect
    # n_contrib, render outside the train step (training.render_params)
    contrib_stats: bool = True
    # compacted grad-output capacity in instance slots (pallas only; 0 =
    # full padded layout). When > 0 the backward writes per-instance grads
    # densely at CHUNK * prefix(neff), shrinking the gradient scatter-add
    # to ~walked_chunks * CHUNK indices (the early-stop walked fraction is
    # ~60% at the bench shape). Undersized capacity degrades those grads
    # to approximate and is counted into overflow; the pipeline feedback-
    # fits this from RenderOutput.walked_chunks like the other budgets.
    grad_capacity: int = 0


def _resolve_backend(backend: str) -> str:
    if backend != "auto":
        return backend
    return "pallas" if jax.default_backend() == "tpu" else "naive"


def _render_impl(settings: RasterizeSettings, camera, means, scales, quats,
                 opacities, shs, bg_color, active_mask):
    backend = _resolve_backend(settings.backend)
    if backend == "naive":
        out = rasterize_naive(
            means, scales, quats, opacities, shs, camera,
            bg_color=bg_color,
            sh_degree=settings.sh_degree,
            scale_modifier=settings.scale_modifier,
            active_mask=active_mask,
        )
    elif backend == "pallas":
        from .rasterize_pallas import rasterize_pallas

        out = rasterize_pallas(
            means, scales, quats, opacities, shs, camera,
            bg_color=bg_color,
            sh_degree=settings.sh_degree,
            scale_modifier=settings.scale_modifier,
            active_mask=active_mask,
            max_instances=settings.max_instances,
            max_chunks_per_tile=settings.max_chunks_per_tile,
            capacity_slack=settings.capacity_slack,
            block_x=settings.block_x,
            block_y=settings.block_y,
            # with the reference depth-grad-drop contract the backward can
            # skip the depth grad row + its scatter share entirely
            depth_grad=settings.depth_grad,
            contrib_stats=settings.contrib_stats,
            grad_capacity=settings.grad_capacity,
        )
    else:
        raise ValueError(f"unknown rasterizer backend: {backend!r}")
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _render_drop_depth_grad(settings, camera, means, scales, quats, opacities,
                            shs, bg_color, active_mask):
    return _render_impl(settings, camera, means, scales, quats, opacities,
                        shs, bg_color, active_mask)


def _rddg_fwd(settings, camera, means, scales, quats, opacities, shs, bg_color,
              active_mask):
    out, vjp = jax.vjp(
        lambda *a: _render_impl(settings, *a),
        camera, means, scales, quats, opacities, shs, bg_color, active_mask,
    )
    return out, vjp


def _rddg_bwd(settings, vjp, g):
    g_dropped = RenderOutput(
        color=g.color,
        depth=jnp.zeros_like(g.depth),  # the reference's silent depth-grad drop
        acc=g.acc,
        final_T=jnp.zeros_like(g.final_T),
        n_contrib=jnp.zeros_like(g.n_contrib),
        radii=jnp.zeros_like(g.radii),
        overflow=jnp.zeros_like(g.overflow),
        num_instances=jnp.zeros_like(g.num_instances),
        max_nchunks=jnp.zeros_like(g.max_nchunks),
        walked_chunks=jnp.zeros_like(g.walked_chunks),
    )
    return vjp(g_dropped)


_render_drop_depth_grad.defvjp(_rddg_fwd, _rddg_bwd)


def rasterize(
    means,
    scales,
    quats,
    opacities,
    shs,
    camera,
    bg_color=None,
    settings: RasterizeSettings = RasterizeSettings(),
    active_mask=None,
) -> RenderOutput:
    """Render a camera view of the Gaussian map.

    Args:
      means:     [N, 3] world positions.
      scales:    [N, 3] ACTIVATED scales (exp applied by the model getter).
      quats:     [N, 4] rotations (w,x,y,z); passed through unnormalized,
                 matching the rasterizer contract (forward.cu:146).
      opacities: [N] or [N, 1] ACTIVATED opacities (sigmoid applied).
      shs:       [N, K, 3] spherical-harmonics coefficients.
      camera:    Camera pytree.
      bg_color:  [3]; defaults to white (ModelParameters.white_background).
      active_mask: [N] bool for capacity-padded buffers; False slots render
                 as if culled.

    Returns RenderOutput(color [3,H,W], depth [H,W], acc [H,W], ...).
    """
    if bg_color is None:
        bg_color = jnp.ones((3,), dtype=means.dtype)
    if opacities.ndim == 2:
        opacities = opacities[:, 0]
    if active_mask is None:
        active_mask = jnp.ones(means.shape[0], dtype=bool)
    if settings.depth_grad:
        return _render_impl(settings, camera, means, scales, quats, opacities,
                            shs, bg_color, active_mask)
    return _render_drop_depth_grad(settings, camera, means, scales, quats,
                                   opacities, shs, bg_color, active_mask)


def mark_visible(means, camera):
    """Frustum visibility test (GaussianRasterizer::markVisible,
    rasterizer.cu:226-241 -> in_frustum, auxiliary.h:120-144): True for
    gaussians with view-space z > 0.2."""
    p_view = means @ camera.R_cw.T + camera.t_cw
    return p_view[..., 2] > 0.2
