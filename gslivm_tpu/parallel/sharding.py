"""Sharded rendering + training over a 2D device mesh ("gauss", "pixel").

The reference has NO distributed runtime (single CUDA GPU, SURVEY §2.6);
these are the TPU-native scaling axes designed in SURVEY §5/§7 phase 7:

  - "pixel" axis — data parallelism over the image: every device composites
    a contiguous chunk of pixels (the analog of CUDA tile-blocks, spread
    across chips); partial images are all_gathered to form the full frame.
  - "gauss" axis — model parallelism over primitives: parameters (and Adam
    state) are sharded on the capacity dim FSDP-style, all_gathered for
    compute; the all_gather transposes to a psum-scatter of gradients in
    the backward pass (XLA inserts the collectives).

shard_map + jax.grad differentiate through the collectives, so one code
path yields both the sharded forward and the correctly-reduced sharded
gradients. The losses (L1 + DSSIM + simi) match `models/training.py`
exactly; a CPU-mesh equivalence test pins them together.

This module uses the oracle compositing math (`rasterize_reference`) inside
shard_map — each device processes its pixel chunk over all (gathered)
gaussians. Running the Pallas tile kernel per-device on a cropped tile grid
is the planned next step for production scale (requires per-band tile
binning; the binning already produces per-tile ranges, so the crop is a
tile-offset slice).
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import GsOptimParams
from ..models import training
from ..models.cameras import Camera
from ..models.gaussian_model import GaussianParams
from ..ops import losses as loss_ops
from ..ops.rasterize_reference import TILE, preprocess, depth_order, _composite_pixels


def make_mesh(n_devices: int | None = None, gauss_axis: int | None = None) -> Mesh:
    """Build a ("gauss", "pixel") mesh over the available devices."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    if gauss_axis is None:
        gauss_axis = 2 if n % 2 == 0 and n >= 4 else 1
    assert n % gauss_axis == 0
    arr = np.asarray(devices).reshape(gauss_axis, n // gauss_axis)
    return Mesh(arr, ("gauss", "pixel"))


def shard_params(params: GaussianParams, mesh: Mesh) -> GaussianParams:
    """Place parameters sharded over the gauss axis (capacity dim)."""

    def put(x):
        if x.ndim >= 1 and x.shape[0] == params.capacity:
            spec = P("gauss", *([None] * (x.ndim - 1)))
        else:
            spec = P()
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree.map(put, params)


def _render_pixels_chunk(params: GaussianParams, camera: Camera, bg_color,
                         pix_lo: int, n_pix: int):
    """Composite pixels [pix_lo, pix_lo+n_pix) of the camera image.

    Returns flat (color [n,3], depth [n], acc [n]).
    """
    H, W = camera.height, camera.width
    pre = preprocess(
        params.xyz,
        params.get_scaling(),
        params.get_rotation(),
        params.get_opacity()[:, 0],
        params.get_features(),
        camera,
        sh_degree=params.sh_degree,
        active_mask=params.active_mask(),
    )
    order = depth_order(pre)
    pre_sorted = jax.tree.map(lambda x: x[order], pre)

    idx = pix_lo + jnp.arange(n_pix)
    pix_xy = jnp.stack([(idx % W).astype(jnp.float32),
                        (idx // W).astype(jnp.float32)], axis=-1)
    tile_xy = (pix_xy // TILE).astype(jnp.int32)
    color, depth, acc, _, _ = _composite_pixels(pix_xy, tile_xy, pre_sorted,
                                                bg_color)
    return color, depth, acc


def _gather_params(params: GaussianParams) -> GaussianParams:
    """FSDP-style all_gather of the capacity-sharded parameters."""
    cap_shard = params.xyz.shape[0]

    def gather(x):
        if x.ndim >= 1 and x.shape[0] == cap_shard:
            return jax.lax.all_gather(x, "gauss", axis=0, tiled=True)
        return x

    out = jax.tree.map(gather, params)
    return out.replace(n_active=params.n_active)


def _render_band_pallas(params: GaussianParams, camera: Camera, bg_color,
                        band_rows: int, max_instances: int,
                        block: tuple[int, int] = (1, 1)):
    """Per-device Pallas band render inside shard_map: this device's band of
    SUPERTILE rows (16*block pixels each), reassembled across "pixel" by the
    caller."""
    from ..ops.rasterize_pallas import rasterize_pallas

    my_pixel = jax.lax.axis_index("pixel")
    out = rasterize_pallas(
        params.xyz,
        params.get_scaling(),
        params.get_rotation(),
        params.get_opacity()[:, 0],
        params.get_features(),
        camera,
        bg_color=bg_color,
        sh_degree=params.sh_degree,
        active_mask=params.active_mask(),
        max_instances=max_instances,
        band_rows=band_rows,
        band_start=my_pixel * band_rows,
        block_x=block[0],
        block_y=block[1],
    )
    return out.color  # [3, band_rows*16*block[1], W]


def sharded_loss_fn(params_shard: GaussianParams, cameras: Sequence[Camera],
                    gt_images, simi: training.SimiInputs, bg_color,
                    opt_params: GsOptimParams, renderer: str = "oracle",
                    max_instances: int = 2**18,
                    block: tuple[int, int] = (1, 1)):
    """Per-device loss inside shard_map; differentiable through collectives.

    renderer="oracle": pixel-chunk compositing with the naive math.
    renderer="pallas": per-device Pallas TILE-BAND rendering — the
    production path (each chip runs the full binning+kernel pipeline on its
    band of tile rows).
    """
    params = _gather_params(params_shard)

    n_pixel = jax.lax.axis_size("pixel")
    my_pixel = jax.lax.axis_index("pixel")

    total = jnp.zeros(())
    for i, cam in enumerate(cameras):
        H, W = cam.height, cam.width
        if renderer == "pallas":
            from ..ops.rasterize_reference import tile_grid

            _, grid_y = tile_grid(W, H)
            sgrid_y = -(-grid_y // block[1])  # supertile rows
            band_rows = -(-sgrid_y // n_pixel)
            band = _render_band_pallas(params, cam, bg_color, band_rows,
                                       max_instances, block=block)
            full = jax.lax.all_gather(band, "pixel", axis=1, tiled=True)
            img = full[:, :H, :]
        else:
            n_pix = H * W
            chunk = -(-n_pix // n_pixel)
            lo = my_pixel * chunk
            color_c, _, _ = _render_pixels_chunk(params, cam, bg_color, lo,
                                                 chunk)
            full = jax.lax.all_gather(color_c, "pixel", axis=0,
                                      tiled=True)[:n_pix]
            img = full.reshape(H, W, 3).transpose(2, 0, 1)
        l1 = loss_ops.l1_loss(img, gt_images[i])
        ss = loss_ops.ssim(img, gt_images[i])
        total = total + (1.0 - opt_params.lambda_dssim) * l1 + \
            opt_params.lambda_dssim * (1.0 - ss)

    total = total + opt_params.lambda_depth_simi * training.simi_loss(params, simi)
    # the value is already identical on every device (full images + gathered
    # params); pmean makes that replication statically provable to shard_map
    return jax.lax.pmean(total, ("gauss", "pixel"))


@functools.partial(
    jax.jit, static_argnames=("mesh", "opt_params", "renderer",
                              "max_instances", "block")
)
def sharded_train_step(
    mesh: Mesh,
    params: GaussianParams,
    opt_state,
    cameras,
    gt_images,
    simi: training.SimiInputs,
    opt_params: GsOptimParams = GsOptimParams(),
    bg_color=None,
    renderer: str = "oracle",
    max_instances: int = 2**18,
    block: tuple[int, int] = (1, 1),
):
    """One training step with gauss-sharded params + pixel-sharded render.

    params/opt_state arrive sharded over "gauss" (see shard_params);
    cameras/gt/simi are replicated. Returns (params, opt_state, loss).
    """
    if bg_color is None:
        bg_color = jnp.ones((3,), jnp.float32)

    optimizer = training.make_optimizer(opt_params)

    # split trainable float buffers from integer bookkeeping so autodiff and
    # shard_map specs stay float-only
    float_fields = ("xyz", "features_dc", "features_rest", "scaling",
                    "rotation", "opacity")
    floats = {k: getattr(params, k) for k in float_fields}
    float_specs = {k: P("gauss", *([None] * (v.ndim - 1)))
                   for k, v in floats.items()}

    def loss_for_grad(floats, n_active):
        p_shard = GaussianParams(n_active=n_active, **floats)
        return sharded_loss_fn(p_shard, cameras, gt_images, simi, bg_color,
                               opt_params, renderer=renderer,
                               max_instances=max_instances, block=block)

    check_vma = renderer != "pallas"

    def vg_local(floats, n_active):
        loss, g = jax.value_and_grad(loss_for_grad, argnums=0)(floats, n_active)
        if not check_vma:
            # with check_vma off, the transpose does not auto-insert the
            # reduction over axes the inputs are replicated on: the float
            # shards are replicated across "pixel", so their grads must be
            # summed across it explicitly
            g = jax.tree.map(lambda x: jax.lax.psum(x, "pixel"), g)
        return loss, g

    vg_fn = jax.shard_map(
        vg_local,
        mesh=mesh,
        in_specs=(float_specs, P()),
        out_specs=(P(), float_specs),
        # pallas_call outputs don't carry varying-across-mesh annotations
        # yet, so the vma check must be off for the pallas renderer;
        # replication of the loss is guaranteed by the pmean in the loss
        check_vma=check_vma,
    )
    loss, gfloats = vg_fn(floats, params.n_active)
    grads = GaussianParams(n_active=jnp.zeros((), jnp.float32), **gfloats)

    updates, opt_state = optimizer.update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)
    return params, opt_state, loss
