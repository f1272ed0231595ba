"""Checkpoint / resume for long mapping runs.

The reference has NO resume path — outputs only (SURVEY §5): PLY map, PCD
cloud, TUM poses. This module adds true checkpoint/resume (a required new
capability for production runs): device state (GaussianParams + Adam state)
via orbax, host state (voxel cells, hash registry, cameras, loss anchors)
via a pickle sidecar. `save_mapper` / `load_mapper` round-trip the whole
IncrementalMapper.
"""

from __future__ import annotations

import logging
import os
import pickle

import jax
import numpy as np

log = logging.getLogger(__name__)


def _device_state(mapper) -> dict:
    return {"params": mapper.params, "opt_state": mapper.opt_state}


def save_mapper(mapper, path: str):
    """Write a full checkpoint directory for an IncrementalMapper."""
    os.makedirs(path, exist_ok=True)

    try:
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        ckptr.save(
            os.path.join(os.path.abspath(path), "device"),
            _device_state(mapper),
            force=True,
        )
        ckptr.wait_until_finished()
    except Exception as e:
        # orbax unavailable/mismatched: flat numpy fallback. Logged loudly —
        # a silently different on-disk format would surprise a restore that
        # expects the orbax layout (ADVICE r3).
        log.warning("orbax checkpoint save failed (%s: %s); falling back to "
                    "flat-numpy device.npz format", type(e).__name__, e)
        flat, treedef = jax.tree.flatten(_device_state(mapper))
        np.savez(os.path.join(path, "device.npz"),
                 *[np.asarray(x) for x in flat])
        with open(os.path.join(path, "treedef.pkl"), "wb") as f:
            pickle.dump(treedef, f)

    host = {
        "iter": mapper.iter,
        "started": mapper.started,
        "registry": mapper.registry._ranges,
        "loss_anchors": mapper.loss_anchors,
        "cameras": [jax.tree.map(np.asarray, c) for c in mapper.cameras],
        "gt_images": mapper.gt_images,
        "last_key_pose": mapper._last_key_pose,
        "gpmap_cells": {
            h: (c.ijk, c.points, c.variance, c.converged)
            for h, c in mapper.gpmap.cells.items()
        },
        "gpmap_pending": mapper.gpmap._pending,
        # deferred-colorization pool (pipeline.py): voxels whose GP ran but
        # which no camera has fully seen — dropping them on resume would
        # reintroduce the permanent-hole failure their pool exists to fix
        "pending_color": mapper._pending_color,
    }
    with open(os.path.join(path, "host.pkl"), "wb") as f:
        pickle.dump(host, f)


def load_mapper(mapper, path: str):
    """Restore state saved by save_mapper into a freshly-built mapper
    (configs must match). Returns the mapper."""
    import jax.numpy as jnp

    from ..frontend.gpmap import _Cell

    device_dir = os.path.join(os.path.abspath(path), "device")
    if os.path.exists(device_dir):
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        target = _device_state(mapper)
        restored = ckptr.restore(device_dir, target)
        mapper.params = restored["params"]
        mapper.opt_state = restored["opt_state"]
    else:
        with open(os.path.join(path, "treedef.pkl"), "rb") as f:
            treedef = pickle.load(f)
        data = np.load(os.path.join(path, "device.npz"))
        flat = [jnp.asarray(data[k]) for k in data.files]
        state = jax.tree.unflatten(treedef, flat)
        mapper.params = state["params"]
        mapper.opt_state = state["opt_state"]

    with open(os.path.join(path, "host.pkl"), "rb") as f:
        host = pickle.load(f)
    mapper.iter = host["iter"]
    mapper.started = host["started"]
    # registry values are LISTS of (start, count) ranges since the r5
    # multi-range extension; normalize tuple-valued entries from older
    # sidecars so lookup()/ranges() see the same shape either way
    mapper.registry._ranges = {
        h: (list(v) if isinstance(v, list) else [tuple(v)])
        for h, v in host["registry"].items()
    }
    mapper._pending_color = host.get("pending_color", {})
    mapper._simi_cache = None  # anchors/registry just changed
    mapper.loss_anchors = host["loss_anchors"]
    mapper.cameras = host["cameras"]
    mapper.gt_images = host["gt_images"]
    # re-stage the device-resident GT stack (pipeline.py keeps GT images on
    # device from keyframe insertion on; the sidecar stores host copies)
    mapper._gt_device = [jax.device_put(jnp.asarray(g))
                         for g in mapper.gt_images]
    # derived per-keyframe SSIM reference stats (pipeline.py computes them
    # at staging; rebuild rather than serialize — they are pure functions
    # of the GT images)
    mapper._gt_stats = [mapper._ref_stats_jit(g) for g in mapper._gt_device]
    mapper._last_key_pose = host["last_key_pose"]
    mapper.gpmap.cells = {
        h: _Cell(ijk=ijk, points=pts, variance=var, converged=conv)
        for h, (ijk, pts, var, conv) in host["gpmap_cells"].items()
    }
    mapper.gpmap._pending = host["gpmap_pending"]
    return mapper
