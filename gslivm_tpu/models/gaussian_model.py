"""The Gaussian map model: parameter pytree + capacity-bucketed growth.

Behavioral spec: reference `src/gs/gaussian.cu` / `gaussian.cuh`:
  - parameter tensors and activations (gaussian.cuh:115-122, 40-54):
    xyz (raw), features_dc/rest (raw SH), scaling (log -> exp),
    rotation (quat -> normalize), opacity (logit -> sigmoid).
  - Create_from_pcd (gaussian.cu:325-386): scaling = log(sqrt(diag(cov) *
    scale_factor)) [decomposeSR takes the covariance DIAGONAL only,
    gaussian.cu:10-12], rotation = identity quat, opacity =
    inverse_sigmoid(0.5) = 0, DC feature = RGB2SH(rgb/255), rest = 0.
  - addNewPointcloud (gaussian.cu:241-313): append new gaussians; the torch
    version does optimizer-state surgery (cat_tensors_to_optimizer,
    gaussian.cu:451-472). TPU-native redesign: parameters live in
    CAPACITY-padded buffers with an active count; append writes into padded
    slots (pure jit-able dynamic-update), and capacity doubles host-side
    when exhausted (one recompile per doubling instead of per-append).
  - voxel-hash -> index registry (gaussian.cuh:124, gaussian.cu:257-263):
    host-side dict mapping GPR voxel hash -> gaussian index range, used by
    the structural similarity loss to select gaussians.

There is NO gradient-based densify/split/prune — parity with the reference,
where prune_optimizer exists but is never called (gaussian.cu:430, SURVEY
§2.3): the map grows only via GPR insertions.
"""

from __future__ import annotations

from typing import NamedTuple

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

from ..ops import sh as sh_ops


def inverse_sigmoid(x):
    """general_utils.cuh:15."""
    return jnp.log(x / (1.0 - x))


@flax.struct.dataclass
class GaussianParams:
    """Capacity-padded trainable parameters. Leading dim = capacity (static
    under jit); `n_active` (traced scalar) marks the live prefix."""

    xyz: jnp.ndarray            # [C, 3]
    features_dc: jnp.ndarray    # [C, 1, 3]
    features_rest: jnp.ndarray  # [C, K-1, 3] (K = (deg+1)^2; empty for deg 0)
    scaling: jnp.ndarray        # [C, 3] log-scale
    rotation: jnp.ndarray       # [C, 4] unnormalized quaternion (w,x,y,z)
    opacity: jnp.ndarray        # [C, 1] logit
    n_active: jnp.ndarray       # [] int32

    @property
    def capacity(self) -> int:
        return self.xyz.shape[0]

    @property
    def sh_degree(self) -> int:
        return int(np.sqrt(self.features_rest.shape[1] + 1)) - 1

    def active_mask(self):
        return jnp.arange(self.capacity) < self.n_active

    # --- activations (gaussian.cuh:40-54) ---
    def get_scaling(self):
        return jnp.exp(self.scaling)

    def get_rotation(self):
        return self.rotation / jnp.linalg.norm(
            self.rotation, axis=-1, keepdims=True
        ).clip(1e-12)

    def get_opacity(self):
        return jax.nn.sigmoid(self.opacity)

    def get_features(self):
        """[C, K, 3] concatenated SH features."""
        return jnp.concatenate([self.features_dc, self.features_rest], axis=1)


class PointBatch(NamedTuple):
    """A batch of GPR-initialized gaussians to insert (fixed-size, masked)."""

    xyz: jnp.ndarray   # [M, 3]
    rgb: jnp.ndarray   # [M, 3] in [0, 255] (uint8-valued floats)
    cov: jnp.ndarray   # [M, 3, 3]
    mask: jnp.ndarray  # [M] bool — valid entries


def _init_fields(xyz, rgb, cov_diag, scale_factor: float, sh_degree: int):
    """Create_from_pcd field math (gaussian.cu:325-386)."""
    n = xyz.shape[0]
    k = sh_ops.num_sh_coeffs(sh_degree)
    scaling = jnp.log(jnp.sqrt(jnp.maximum(cov_diag * scale_factor, 1e-12)))
    rotation = jnp.zeros((n, 4), xyz.dtype).at[:, 0].set(1.0)
    opacity = jnp.zeros((n, 1), xyz.dtype)  # inverse_sigmoid(0.5) = 0
    dc = sh_ops.rgb_to_sh(rgb / 255.0)[:, None, :]
    rest = jnp.zeros((n, k - 1, 3), xyz.dtype)
    return scaling, rotation, opacity, dc, rest


def create_empty(capacity: int, sh_degree: int = 0, dtype=jnp.float32) -> GaussianParams:
    k = sh_ops.num_sh_coeffs(sh_degree)
    return GaussianParams(
        xyz=jnp.zeros((capacity, 3), dtype),
        features_dc=jnp.zeros((capacity, 1, 3), dtype),
        features_rest=jnp.zeros((capacity, k - 1, 3), dtype),
        scaling=jnp.full((capacity, 3), -10.0, dtype),
        rotation=jnp.zeros((capacity, 4), dtype).at[:, 0].set(1.0),
        opacity=jnp.full((capacity, 1), -10.0, dtype),
        n_active=jnp.asarray(0, jnp.int32),
    )


def create_from_points(
    batch: PointBatch,
    scale_factor: float,
    capacity: int,
    sh_degree: int = 0,
) -> GaussianParams:
    """Create_from_pcd equivalent into a fresh capacity-padded model."""
    params = create_empty(capacity, sh_degree, batch.xyz.dtype)
    return append_points(params, batch, scale_factor)


@jax.jit
def _compact_batch(batch: PointBatch):
    """Stable-partition valid entries to the front; returns count."""
    order = jnp.argsort(~batch.mask, stable=True)
    count = jnp.sum(batch.mask).astype(jnp.int32)
    return PointBatch(
        xyz=batch.xyz[order],
        rgb=batch.rgb[order],
        cov=batch.cov[order],
        mask=jnp.arange(batch.mask.shape[0]) < count,
    ), count


def append_points(
    params: GaussianParams, batch: PointBatch, scale_factor: float
) -> GaussianParams:
    """addNewPointcloud equivalent: write the batch into padded slots.

    Jit-able for a fixed (capacity, batch-size) pair. Entries beyond the
    remaining capacity are dropped (callers grow capacity first via
    `ensure_capacity`). Returns updated params with n_active advanced.
    """
    cbatch, count = _compact_batch(batch)
    m = cbatch.xyz.shape[0]
    cap = params.capacity
    start = params.n_active

    cov_diag = jnp.diagonal(cbatch.cov, axis1=-2, axis2=-1)
    scaling, rotation, opacity, dc, rest = _init_fields(
        cbatch.xyz, cbatch.rgb, cov_diag, scale_factor, params.sh_degree
    )

    # scatter rows [start, start+count) <- batch rows [0, count)
    dst = start + jnp.arange(m, dtype=jnp.int32)
    ok = (jnp.arange(m) < count) & (dst < cap)
    dst = jnp.where(ok, dst, cap)  # out-of-range -> dropped via mode=drop

    def put(buf, rows):
        return buf.at[dst].set(jnp.where(
            ok.reshape((m,) + (1,) * (rows.ndim - 1)), rows, 0), mode="drop")

    return params.replace(
        xyz=put(params.xyz, cbatch.xyz),
        features_dc=put(params.features_dc, dc),
        features_rest=put(params.features_rest, rest),
        scaling=put(params.scaling, scaling),
        rotation=put(params.rotation, rotation),
        opacity=put(params.opacity, opacity),
        n_active=jnp.minimum(start + count, cap).astype(jnp.int32),
    )


def prune_permutation(params: GaussianParams, keep_mask):
    """(order, count) of the stable partition that compacts `keep_mask`.

    `order` moves kept gaussians to the front preserving their relative
    order; apply it to the parameters (compact) AND to the Adam moments
    (training.compact_opt_state) so optimizer state follows its gaussian —
    the working analog of the reference's never-called prune_optimizer
    surgery (gaussian.cu:430-449).
    """
    keep_mask = jnp.asarray(keep_mask) & params.active_mask()
    order = jnp.argsort(~keep_mask, stable=True)
    count = jnp.sum(keep_mask).astype(jnp.int32)
    return order, count


def compact(params: GaussianParams, order, count) -> GaussianParams:
    """Apply a prune permutation: kept rows to the front, rest zeroed."""

    def take(buf):
        out = buf[order]
        live = jnp.arange(buf.shape[0]) < count
        return jnp.where(live.reshape((-1,) + (1,) * (buf.ndim - 1)), out, 0)

    return params.replace(
        xyz=take(params.xyz),
        features_dc=take(params.features_dc),
        features_rest=take(params.features_rest),
        scaling=take(params.scaling),
        rotation=take(params.rotation),
        opacity=take(params.opacity),
        n_active=count,
    )


def prune(params: GaussianParams, keep_mask) -> GaussianParams:
    """Compact the model to the gaussians where keep_mask is True.

    The reference DEFINES prune_optimizer but never calls it (gaussian.cu:
    430, SURVEY §2.3) — pruning here is a real capability: low-opacity or
    out-of-frustum gaussians can be dropped and the capacity reused. The
    optimizer state must be re-initialized (or compacted with the same
    permutation via prune_permutation + training.compact_opt_state) by the
    caller. Stable order is preserved.
    """
    order, count = prune_permutation(params, keep_mask)
    return compact(params, order, count)


def prune_low_opacity(params: GaussianParams, min_opacity: float = 0.005) -> GaussianParams:
    """Drop gaussians whose activated opacity fell below min_opacity."""
    import jax

    keep = params.get_opacity()[:, 0] >= min_opacity
    return prune(params, jax.lax.stop_gradient(keep))


def grow_capacity(params: GaussianParams, new_capacity: int) -> GaussianParams:
    """Host-side capacity doubling: pad every buffer; active data unchanged.

    This is the TPU-native replacement for torch's per-append
    cat_tensors_to_optimizer (gaussian.cu:451-472): one recompile per
    doubling, zero work per append.
    """
    assert new_capacity >= params.capacity
    pad = new_capacity - params.capacity
    if pad == 0:
        return params
    empty = create_empty(pad, params.sh_degree, params.xyz.dtype)

    def cat(a, b):
        return jnp.concatenate([a, b], axis=0)

    return params.replace(
        xyz=cat(params.xyz, empty.xyz),
        features_dc=cat(params.features_dc, empty.features_dc),
        features_rest=cat(params.features_rest, empty.features_rest),
        scaling=cat(params.scaling, empty.scaling),
        rotation=cat(params.rotation, empty.rotation),
        opacity=cat(params.opacity, empty.opacity),
    )


def ensure_capacity(params: GaussianParams, incoming: int,
                    growth: float = 2.0) -> GaussianParams:
    """Grow (by doubling) until `incoming` more gaussians fit."""
    needed = int(params.n_active) + incoming
    cap = params.capacity
    while cap < needed:
        cap = max(int(cap * growth), cap + 1)
    return grow_capacity(params, cap)


class HashIndexRegistry:
    """Host-side voxel-hash -> gaussian index-range registry
    (gs_hash_indexes_, gaussian.cuh:124). Duplicate insertion is an error in
    the reference (gaussian.cu:257-262); here it is reported by return value.

    EXTENSION over the reference: a voxel may hold SEVERAL index ranges —
    the deferred-colorization pool (pipeline.IncrementalMapper) inserts the
    visible subset of a voxel's gaussians immediately (reference behavior)
    and appends the remainder when a later camera finally sees it, instead
    of dropping it forever (the added_final_gs_sample quirk,
    gpprocess.cu:804-812)."""

    def __init__(self):
        self._ranges: dict[int, list[tuple[int, int]]] = {}

    def insert(self, voxel_hash: int, start: int, count: int) -> bool:
        """First-range insert; False (reference error analog) if present."""
        if voxel_hash in self._ranges:
            return False
        self._ranges[voxel_hash] = [(start, count)]
        return True

    def append_range(self, voxel_hash: int, start: int, count: int):
        """Deferred-completion insert: add another range to a voxel."""
        self._ranges.setdefault(voxel_hash, []).append((start, count))

    def lookup(self, voxel_hash: int):
        """The FIRST range of the voxel (reference API shape), or None."""
        r = self._ranges.get(voxel_hash)
        return r[0] if r else None

    def ranges(self, voxel_hash: int) -> list:
        """All index ranges of the voxel ([] when absent)."""
        return self._ranges.get(voxel_hash, [])

    def remap_pruned(self, keep: np.ndarray):
        """Remap index ranges after prune(keep): the stable partition keeps
        relative order, so every surviving range stays CONTIGUOUS; its new
        start is the number of kept gaussians before its old start. Ranges
        whose gaussians were all dropped are removed."""
        keep = np.asarray(keep, bool)
        prefix = np.concatenate([[0], np.cumsum(keep.astype(np.int64))])
        new: dict[int, list[tuple[int, int]]] = {}
        for h, rs in self._ranges.items():
            kept = []
            for s, c in rs:
                nc = int(prefix[s + c] - prefix[s])
                if nc > 0:
                    kept.append((int(prefix[s]), nc))
            if kept:
                new[h] = kept
        self._ranges = new

    def indices_for(self, hashes) -> np.ndarray:
        out = []
        for h in hashes:
            for s, c in self._ranges.get(int(h), []):
                out.extend(range(s, s + c))
        return np.asarray(out, dtype=np.int32)

    def __len__(self):
        return len(self._ranges)


# ---------------------------------------------------------------------------
# PLY export (Save_ply, gaussian.cu:494-519; attribute layout
# construct_list_of_attributes, gaussian.cu:474-492)
# ---------------------------------------------------------------------------


def save_ply(params: GaussianParams, path: str):
    """Write the 3DGS-standard binary-little-endian PLY."""
    n = int(params.n_active)
    xyz = np.asarray(params.xyz[:n], dtype=np.float32)
    normals = np.zeros_like(xyz)
    k_dc = params.features_dc.shape[1] * 3
    k_rest = params.features_rest.shape[1] * 3
    f_dc = np.asarray(params.features_dc[:n], np.float32).transpose(0, 2, 1).reshape(n, k_dc)
    f_rest = np.asarray(params.features_rest[:n], np.float32).transpose(0, 2, 1).reshape(n, k_rest)
    opacity = np.asarray(params.opacity[:n], np.float32)
    scale = np.asarray(params.scaling[:n], np.float32)
    rot = np.asarray(params.rotation[:n], np.float32)

    props = (
        ["x", "y", "z", "nx", "ny", "nz"]
        + [f"f_dc_{i}" for i in range(f_dc.shape[1])]
        + [f"f_rest_{i}" for i in range(f_rest.shape[1])]
        + ["opacity"]
        + [f"scale_{i}" for i in range(scale.shape[1])]
        + [f"rot_{i}" for i in range(rot.shape[1])]
    )
    data = np.concatenate([xyz, normals, f_dc, f_rest, opacity, scale, rot], axis=1)

    with open(path, "wb") as f:
        header = ["ply", "format binary_little_endian 1.0", f"element vertex {n}"]
        header += [f"property float {p}" for p in props]
        header += ["end_header"]
        f.write(("\n".join(header) + "\n").encode("ascii"))
        f.write(data.astype("<f4").tobytes())


def load_ply(path: str, sh_degree: int = 0, capacity: int | None = None) -> GaussianParams:
    """Read back a PLY written by save_ply (checkpoint/restore of the map)."""
    with open(path, "rb") as f:
        props = []
        n = 0
        while True:
            line = f.readline().decode("ascii").strip()
            if line.startswith("element vertex"):
                n = int(line.split()[-1])
            elif line.startswith("property float"):
                props.append(line.split()[-1])
            elif line == "end_header":
                break
        data = np.frombuffer(f.read(n * len(props) * 4), dtype="<f4")
    data = data.reshape(n, len(props))
    col = {p: i for i, p in enumerate(props)}
    k = sh_ops.num_sh_coeffs(sh_degree)
    xyz = data[:, [col["x"], col["y"], col["z"]]]
    f_dc = data[:, [col[f"f_dc_{i}"] for i in range(3)]].reshape(n, 3, 1)
    n_rest = 3 * (k - 1)
    if n_rest:
        f_rest = data[:, [col[f"f_rest_{i}"] for i in range(n_rest)]].reshape(n, 3, k - 1)
    else:
        f_rest = np.zeros((n, 3, 0), np.float32)
    opacity = data[:, [col["opacity"]]]
    scale = data[:, [col[f"scale_{i}"] for i in range(3)]]
    rot = data[:, [col[f"rot_{i}"] for i in range(4)]]

    cap = capacity or max(n, 1)
    params = create_empty(cap, sh_degree)
    return params.replace(
        xyz=params.xyz.at[:n].set(xyz),
        features_dc=params.features_dc.at[:n].set(f_dc.transpose(0, 2, 1)),
        features_rest=params.features_rest.at[:n].set(f_rest.transpose(0, 2, 1)),
        scaling=params.scaling.at[:n].set(scale),
        rotation=params.rotation.at[:n].set(rot),
        opacity=params.opacity.at[:n].set(opacity),
        n_active=jnp.asarray(n, jnp.int32),
    )
