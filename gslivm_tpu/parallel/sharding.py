"""Sharded rendering + training over a 2D device mesh ("gauss", "pixel").

The reference has NO distributed runtime (single CUDA GPU, SURVEY §2.6);
these are the TPU-native scaling axes designed in SURVEY §5/§7 phase 7:

  - "pixel" axis — data parallelism over the image: every device composites
    a contiguous band of pixels (the analog of CUDA tile-blocks, spread
    across chips); partial images are all_gathered to form the full frame.
  - "gauss" axis — model parallelism over primitives. Two strategies:
      renderer="oracle"/"pallas": parameters (and Adam state) are sharded
        on the capacity dim FSDP-style and all_gathered for compute; the
        all_gather transposes to a psum-scatter of gradients. Right for
        small/medium maps (communication is the full parameter set).
      renderer="primitive": NO parameter gather — each device preprocesses
        its local shard, ONE all_to_all re-partitions the ~15-float screen
        features into depth-rank slabs, each device renders its slab with
        the production Pallas pipeline, and the depth-ordered associative
        partial-composite merge (C <- C_a + T_a*C_b, T <- T_a*T_b)
        reconstructs the exact frame (parallel/primitive.py). Per-device
        memory and render work scale ~1/gauss — the 10M-gaussian axis.

shard_map + jax.grad differentiate through the collectives, so one code
path yields both the sharded forward and the correctly-reduced sharded
gradients. The losses (L1 + DSSIM + simi + delta-depth) match
`models/training.py` exactly; CPU-mesh equivalence tests pin them together.
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
from . import primitive


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
    caller. Returns ([5, band_h, W] rows color/depth/acc, overflow)."""
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
    rows = jnp.concatenate(
        [out.color, out.depth[None], out.acc[None]], axis=0)
    return rows, out.overflow


def _band_rows_for(cam: Camera, n_pixel: int, block: tuple[int, int]) -> int:
    from ..ops.rasterize_reference import tile_grid

    _, grid_y = tile_grid(cam.width, cam.height)
    sgrid_y = -(-grid_y // block[1])  # supertile rows
    return -(-sgrid_y // n_pixel)


def _render_full_image(params, params_shard, cam: Camera, bg_color,
                       renderer: str, max_instances: int,
                       block: tuple[int, int], exchange_slack: float):
    """One camera's FULL (replicated) color/depth/acc under the chosen
    strategy, plus this step's binning/exchange overflow (psum-reduced).

    `params` is the gathered parameter set (gather strategies) or None
    (primitive); `params_shard` is the local shard."""
    H, W = cam.height, cam.width
    n_pixel = jax.lax.axis_size("pixel")
    my_pixel = jax.lax.axis_index("pixel")
    overflow = jnp.zeros((), jnp.int32)

    if renderer == "primitive":
        p = params_shard
        pre = preprocess(
            p.xyz, p.get_scaling(), p.get_rotation(),
            p.get_opacity()[:, 0], p.get_features(), cam,
            sh_degree=p.sh_degree, active_mask=p.active_mask(),
        )
        n_local = pre.depth.shape[0]
        g = jax.lax.axis_size("gauss")
        budget = min(n_local, max(1, -(-int(exchange_slack * n_local) // g)))
        slab, ovf_ex = primitive.exchange_by_depth_slab(
            pre, "gauss", budget_per_pair=budget)
        band_rows = _band_rows_for(cam, n_pixel, block)
        partial, ovf_bin = primitive.render_slab_band(
            slab, W, H, band_rows, my_pixel * band_rows,
            max_instances=max_instances, block=block)
        merged = primitive.merge_partials(partial, "gauss")  # [6, bh, Wp]
        full = jax.lax.all_gather(merged, "pixel", axis=1, tiled=True)
        C, D, A, T = full[:3], full[3], full[4], full[5]
        color = (C + T[None] * bg_color[:, None, None])[:, :H, :W]
        depth = D[:H, :W]
        acc = A[:H, :W]
        overflow = ovf_ex + jax.lax.psum(ovf_bin, ("gauss", "pixel"))
    elif renderer == "pallas":
        band_rows = _band_rows_for(cam, n_pixel, block)
        rows, ovf = _render_band_pallas(params, cam, bg_color, band_rows,
                                        max_instances, block=block)
        full = jax.lax.all_gather(rows, "pixel", axis=1, tiled=True)
        color, depth, acc = full[:3, :H, :], full[3, :H, :], full[4, :H, :]
        overflow = jax.lax.psum(ovf, ("gauss", "pixel"))
    else:  # oracle
        n_pix = H * W
        chunk = -(-n_pix // n_pixel)
        lo = my_pixel * chunk
        color_c, depth_c, acc_c = _render_pixels_chunk(
            params, cam, bg_color, lo, chunk)
        rows = jnp.concatenate(
            [color_c, depth_c[:, None], acc_c[:, None]], axis=1)  # [chunk, 5]
        full = jax.lax.all_gather(rows, "pixel", axis=0, tiled=True)[:n_pix]
        color = full[:, :3].reshape(H, W, 3).transpose(2, 0, 1)
        depth = full[:, 3].reshape(H, W)
        acc = full[:, 4].reshape(H, W)
    return color, depth, acc, overflow


def sharded_loss_fn(params_shard: GaussianParams, cameras: Sequence[Camera],
                    gt_images, simi: training.SimiInputs, bg_color,
                    opt_params: GsOptimParams, renderer: str = "oracle",
                    max_instances: int = 2**18,
                    block: tuple[int, int] = (1, 1),
                    n_history_pairs: int = 0,
                    exchange_slack: float = 4.0):
    """Per-device loss inside shard_map; differentiable through collectives.

    renderer="oracle": pixel-chunk compositing with the naive math (CPU
      verification path; params all_gathered).
    renderer="pallas": per-device Pallas TILE-BAND rendering of the FULL
      (gathered) gaussian set — production path for replicable maps.
    renderer="primitive": depth-slab re-partition + per-slab Pallas render +
      depth-ordered partial-composite merge — NO parameter gather; the
      10M-gaussian axis (parallel/primitive.py).

    Loss/metric parity with models.training.train_step: per-camera
    (1-λ)L1 + λ·DSSIM, simi, and delta-depth over the LAST 2*n_history_pairs
    cameras (depth stop-gradiented — the reference's depth-grad-drop
    contract, rasterizer.cu:79). Returns (total, TrainMetrics aux).
    """
    params = None
    if renderer != "primitive":
        params = _gather_params(params_shard)

    total = jnp.zeros(())
    image_total = jnp.zeros(())
    psnr0 = ssim0 = None
    overflow = jnp.zeros((), jnp.int32)
    depths, accs = [], []
    for i, cam in enumerate(cameras):
        img, depth, acc, ovf = _render_full_image(
            params, params_shard, cam, bg_color, renderer, max_instances,
            block, exchange_slack)
        depths.append(depth)
        accs.append(acc)
        overflow = jnp.maximum(overflow, ovf)
        # L1 and SSIM are PIXEL-SHARDED: the frame is replicated after the
        # gather, so each device reduces/blurs only its row band (+halo for
        # the SSIM window) and the mean is one psum — instead of every
        # device redundantly processing the whole image (the dominant
        # non-render cost at 1080p)
        Hc, Wc = cam.height, cam.width
        n_pixel = jax.lax.axis_size("pixel")
        band_lo = jax.lax.axis_index("pixel") * (-(-Hc // n_pixel))
        band_n = -(-Hc // n_pixel)
        l1 = jax.lax.psum(
            loss_ops.l1_band_sum(img, gt_images[i], band_lo, band_n),
            "pixel") / (img.shape[0] * Hc * Wc)
        ss = jax.lax.psum(
            loss_ops.ssim_band_sum(img, gt_images[i], band_lo, band_n),
            "pixel") / (img.shape[0] * Hc * Wc)
        image_total = image_total + (1.0 - opt_params.lambda_dssim) * l1 + \
            opt_params.lambda_dssim * (1.0 - ss)
        if i == 0:
            psnr0 = loss_ops.psnr(img, gt_images[i])
            ssim0 = ss
    total = total + image_total

    if renderer == "primitive":
        s_loss = opt_params.lambda_depth_simi * primitive.sharded_simi_loss(
            params_shard.xyz, params_shard.get_scaling(), simi, "gauss")
    else:
        s_loss = opt_params.lambda_depth_simi * training.simi_loss(params, simi)
    total = total + s_loss

    d_loss = jnp.zeros(())
    n = len(cameras)
    for k in range(n_history_pairs):
        ia = n - 2 * n_history_pairs + 2 * k
        ib = ia + 1
        # depth grads dropped (reference contract); acc is mask-only.
        # PIXEL-SHARDED: only the warp's gather-bound bilinear sampling and
        # the reduction band-restrict (the elementwise backproject is the
        # sample source and stays full-frame) — ~1/N of the ~20 ms/pair
        # full-frame warp instead of N replicated copies
        Hc, Wc = cameras[ia].height, cameras[ia].width
        n_pixel = jax.lax.axis_size("pixel")
        band_n = -(-Hc // n_pixel)
        band_lo = jax.lax.axis_index("pixel") * band_n
        d_loss = d_loss + opt_params.lambda_delta_depth_simi * jax.lax.psum(
            training.delta_depth_band_sum(
                jax.lax.stop_gradient(depths[ia]), accs[ia], cameras[ia],
                jax.lax.stop_gradient(depths[ib]), accs[ib], cameras[ib],
                band_lo, band_n),
            "pixel") / (Hc * Wc)
    total = total + d_loss

    # every value below is already identical on all devices (full images +
    # psum-reduced scalars); pmean makes that replication statically provable
    axes = ("gauss", "pixel")
    vma_tracked = renderer == "oracle"  # pallas paths run check_vma=False

    def rep(x, reduce=jax.lax.pmean):
        # under vma tracking, promote to varying on any axis the tracker
        # knows the value is invariant over (per-term states differ: e.g.
        # the simi loss is varying on "gauss" only), then reduce over both;
        # with check_vma off the collectives are unchecked (and pcast's
        # transpose would reject the untracked cotangent), so reduce directly
        if vma_tracked:
            missing = tuple(a for a in axes if a not in jax.typeof(x).vma)
            if missing:
                x = jax.lax.pcast(x, missing, to="varying")
        return reduce(x, axes)

    metrics = training.TrainMetrics(
        loss=rep(total), image_loss=rep(image_total), simi=rep(s_loss),
        delta=rep(d_loss), psnr=rep(psnr0), ssim=rep(ssim0),
        overflow=rep(overflow, reduce=jax.lax.pmax),
    )
    return rep(total), metrics


@functools.partial(
    jax.jit, static_argnames=("mesh", "opt_params", "renderer",
                              "max_instances", "block", "n_history_pairs",
                              "exchange_slack")
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
    n_history_pairs: int = 0,
    exchange_slack: float = 4.0,
):
    """One training step with gauss-sharded params + pixel-sharded render.

    params/opt_state arrive sharded over "gauss" (see shard_params);
    cameras/gt/simi are replicated. The LAST 2*n_history_pairs cameras form
    delta-depth pairs, mirroring training.train_step. Returns
    (params, opt_state, TrainMetrics) — metrics.loss is the total loss.
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
                               max_instances=max_instances, block=block,
                               n_history_pairs=n_history_pairs,
                               exchange_slack=exchange_slack)

    check_vma = renderer == "oracle"

    def vg_local(floats, n_active):
        (loss, metrics), g = jax.value_and_grad(
            loss_for_grad, argnums=0, has_aux=True)(floats, n_active)
        if not check_vma:
            # with check_vma off, the transpose does not auto-insert the
            # reduction over axes the inputs are replicated on: the float
            # shards are replicated across "pixel", so their grads must be
            # summed across it explicitly
            g = jax.tree.map(lambda x: jax.lax.psum(x, "pixel"), g)
        return loss, metrics, g

    vg_fn = jax.shard_map(
        vg_local,
        mesh=mesh,
        in_specs=(float_specs, P()),
        out_specs=(P(), P(), float_specs),
        # pallas_call outputs don't carry varying-across-mesh annotations
        # yet, so the vma check must be off for the pallas renderers;
        # replication of the loss is guaranteed by the pmean in the loss
        check_vma=check_vma,
    )
    _, metrics, gfloats = vg_fn(floats, params.n_active)
    grads = GaussianParams(n_active=jnp.zeros((), jnp.float32), **gfloats)

    updates, opt_state = optimizer.update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)
    return params, opt_state, metrics
