"""Pallas tile rasterizer vs the naive oracle: forward allclose + gradient
allclose (BASELINE.json config[0] methodology, run in interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gslivm_tpu.models.cameras import make_camera
from gslivm_tpu.ops import sh as sh_ops
from gslivm_tpu.ops.binning import CHUNK, bin_instances
from gslivm_tpu.ops.rasterize_reference import preprocess, rasterize_naive, tile_grid
from gslivm_tpu.ops.rasterize_pallas import rasterize_pallas


def _scene(n, rng, spread=1.0, z0=5.0, scale_hi=0.15):
    means = jnp.asarray(
        rng.normal(0, spread, (n, 3)) + [0, 0, z0], dtype=jnp.float32
    )
    scales = jnp.asarray(rng.uniform(0.02, scale_hi, (n, 3)), dtype=jnp.float32)
    q = rng.normal(size=(n, 4))
    quats = jnp.asarray(q / np.linalg.norm(q, axis=1, keepdims=True), jnp.float32)
    opac = jnp.asarray(rng.uniform(0.2, 0.95, (n,)), dtype=jnp.float32)
    shs = jnp.asarray(rng.uniform(-0.3, 0.8, (n, 1, 3)), dtype=jnp.float32)
    return means, scales, quats, opac, shs


def _cam(w=64, h=48):
    return make_camera(np.eye(3), np.zeros(3), w, h, fovx=1.0, fovy=0.8)


def test_binning_matches_bruteforce(rng):
    n = 64
    cam = _cam()
    means, scales, quats, opac, shs = _scene(n, rng)
    pre = preprocess(means, scales, quats, opac, shs, cam)
    binned = bin_instances(pre, cam.width, cam.height, max_instances=4096,
                           tile_cull=False)

    gx, gy = tile_grid(cam.width, cam.height)
    pre_np = jax.tree.map(np.asarray, pre)
    # brute-force expansion in python
    expected = {t: [] for t in range(gx * gy)}
    for g in range(n):
        if not pre_np.valid[g]:
            continue
        for ty in range(pre_np.rect_min[g, 1], pre_np.rect_max[g, 1]):
            for tx in range(pre_np.rect_min[g, 0], pre_np.rect_max[g, 0]):
                expected[ty * gx + tx].append(g)
    # sort each tile's list by (depth, gaussian index)
    for t in expected:
        expected[t].sort(key=lambda g: (pre_np.depth[g], g))

    dorder = np.asarray(binned.dorder)
    rank = np.asarray(binned.gauss_rank)
    off = np.asarray(binned.tile_offset)
    nch = np.asarray(binned.tile_nchunks)
    assert int(binned.overflow) == 0
    for t in range(gx * gy):
        run = rank[off[t] : off[t] + CHUNK * nch[t]]
        real = dorder[run[run >= 0]].tolist()
        assert real == expected[t], f"tile {t}"
        # padding slots are all trailing -1s
        assert np.all(run[len(real):] == -1)


def test_tile_cull_is_lossless(rng):
    """The per-(gaussian, tile) ellipse cull must not change images or
    gradients — it may only drop instances no pixel can see (alpha < 1/255,
    forward.cu:374). Anisotropic, low-opacity scene to exercise it hard."""
    n = 150
    cam = _cam()
    means = jnp.asarray(rng.normal(0, 1.0, (n, 3)) + [0, 0, 5.0], jnp.float32)
    scales = jnp.asarray(
        np.stack([rng.uniform(0.002, 0.01, n), rng.uniform(0.05, 0.15, n),
                  rng.uniform(0.002, 0.15, n)], 1), jnp.float32)
    q = rng.normal(size=(n, 4))
    quats = jnp.asarray(q / np.linalg.norm(q, axis=1, keepdims=True),
                        jnp.float32)
    opac = jnp.asarray(rng.uniform(0.05, 0.95, (n,)), jnp.float32)
    shs = jnp.asarray(rng.uniform(-0.3, 0.8, (n, 1, 3)), jnp.float32)
    bg = jnp.asarray([0.1, 0.6, 0.9])
    gt = jnp.asarray(rng.uniform(size=(3, cam.height, cam.width)), jnp.float32)

    pre = preprocess(means, scales, quats, opac, shs, cam)
    b_cull = bin_instances(pre, cam.width, cam.height, 1 << 14)
    b_full = bin_instances(pre, cam.width, cam.height, 1 << 14,
                           tile_cull=False)
    kept = int((np.asarray(b_cull.gauss_rank) >= 0).sum())
    full = int((np.asarray(b_full.gauss_rank) >= 0).sum())
    assert kept < full  # the cull actually dropped something

    def loss(cull):
        def f(means, scales, quats, opac, shs):
            out = rasterize_pallas(means, scales, quats, opac, shs, cam,
                                   bg_color=bg, max_instances=1 << 14,
                                   interpret=True, tile_cull=cull)
            return (jnp.sum((out.color - gt) ** 2) + jnp.sum(out.acc)
                    + jnp.sum(out.final_T))
        return f

    v1, g1 = jax.value_and_grad(loss(True), argnums=(0, 3))(
        means, scales, quats, opac, shs)
    v2, g2 = jax.value_and_grad(loss(False), argnums=(0, 3))(
        means, scales, quats, opac, shs)
    np.testing.assert_allclose(float(v1), float(v2), rtol=1e-6)
    # grads agree up to f32 re-association: dropping instances shifts chunk
    # boundaries, regrouping the kernel's scans (no REAL contribution may
    # appear/disappear — that would show up orders of magnitude larger)
    for a, b in zip(g1, g2):
        a, b = np.asarray(a), np.asarray(b)
        scale = np.abs(a).max() + 1e-8
        np.testing.assert_allclose(b, a, atol=1e-5 * scale, rtol=1e-4)


@pytest.mark.parametrize("seed,n", [(0, 50), (1, 200)])
def test_forward_allclose_oracle(seed, n):
    rng = np.random.default_rng(seed)
    cam = _cam()
    means, scales, quats, opac, shs = _scene(n, rng)
    bg = jnp.asarray([1.0, 0.5, 0.25])

    ref = rasterize_naive(means, scales, quats, opac, shs, cam, bg_color=bg)
    out = rasterize_pallas(means, scales, quats, opac, shs, cam, bg_color=bg,
                           max_instances=1 << 14, interpret=True)

    np.testing.assert_allclose(np.asarray(out.color), np.asarray(ref.color),
                               atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(out.depth), np.asarray(ref.depth),
                               atol=2e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(out.acc), np.asarray(ref.acc),
                               atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(out.final_T), np.asarray(ref.final_T),
                               atol=2e-5, rtol=1e-4)
    np.testing.assert_array_equal(np.asarray(out.n_contrib),
                                  np.asarray(ref.n_contrib))


def test_gradients_allclose_oracle():
    rng = np.random.default_rng(2)
    n = 80
    cam = _cam(48, 32)
    means, scales, quats, opac, shs = _scene(n, rng)
    bg = jnp.asarray([0.2, 0.2, 0.2])
    gt = jnp.asarray(rng.uniform(size=(3, 32, 48)), dtype=jnp.float32)
    gacc = jnp.asarray(rng.uniform(size=(32, 48)), dtype=jnp.float32)

    def loss_with(render):
        def f(means, scales, quats, opac, shs):
            out = render(means, scales, quats, opac, shs)
            # exercise color AND acc cotangents (the reference backward's
            # full input surface), with depth ignored like the reference.
            return jnp.sum((out.color - gt) ** 2) + jnp.sum(out.acc * gacc)
        return f

    ref_render = lambda *a: rasterize_naive(*a, cam, bg_color=bg)
    pal_render = lambda *a: rasterize_pallas(*a, cam, bg_color=bg,
                                             max_instances=1 << 14,
                                             interpret=True)

    g_ref = jax.grad(loss_with(ref_render), argnums=(0, 1, 2, 3, 4))(
        means, scales, quats, opac, shs)
    g_pal = jax.grad(loss_with(pal_render), argnums=(0, 1, 2, 3, 4))(
        means, scales, quats, opac, shs)

    names = ["means", "scales", "quats", "opac", "shs"]
    for name, a, b in zip(names, g_ref, g_pal):
        a, b = np.asarray(a), np.asarray(b)
        scale = np.abs(a).max() + 1e-8
        np.testing.assert_allclose(b, a, atol=2e-4 * scale, rtol=2e-3,
                                   err_msg=f"grad {name}")


def test_empty_scene():
    cam = _cam()
    means = jnp.zeros((4, 3)).at[:, 2].set(-1.0)  # all behind camera
    scales = jnp.full((4, 3), 0.05)
    quats = jnp.tile(jnp.asarray([[1.0, 0, 0, 0]]), (4, 1))
    opac = jnp.full((4,), 0.5)
    shs = jnp.zeros((4, 1, 3))
    out = rasterize_pallas(means, scales, quats, opac, shs, cam,
                           bg_color=jnp.asarray([0.3, 0.6, 0.9]),
                           max_instances=1024, interpret=True)
    c = np.asarray(out.color)
    np.testing.assert_allclose(c[0], 0.3, atol=1e-6)
    np.testing.assert_allclose(c[1], 0.6, atol=1e-6)
    np.testing.assert_allclose(c[2], 0.9, atol=1e-6)
    assert float(out.acc.max()) == 0.0


def test_instance_overflow_counted():
    rng = np.random.default_rng(3)
    cam = _cam()
    means, scales, quats, opac, shs = _scene(100, rng)
    pre = preprocess(means, scales, quats, opac, shs, cam)
    binned = bin_instances(pre, cam.width, cam.height, max_instances=8)
    assert int(binned.overflow) > 0
    # and rendering still runs without error AND surfaces the overflow
    out = rasterize_pallas(means, scales, quats, opac, shs, cam,
                           max_instances=8, interpret=True)
    assert np.all(np.isfinite(np.asarray(out.color)))
    assert int(out.overflow) == int(binned.overflow) > 0
    assert int(out.num_instances) == int(binned.num_instances)
    # a sufficient budget reports zero overflow
    ok = rasterize_pallas(means, scales, quats, opac, shs, cam,
                          max_instances=1 << 14, interpret=True)
    assert int(ok.overflow) == 0


def test_tile_bands_compose_to_full_image():
    """Banded rendering (the pixel-sharding unit) must reproduce the full
    frame when bands are stitched."""
    rng = np.random.default_rng(5)
    cam = _cam(64, 64)  # grid_y = 4 tile rows
    means, scales, quats, opac, shs = _scene(120, rng)
    bg = jnp.asarray([0.1, 0.2, 0.3])

    full = rasterize_pallas(means, scales, quats, opac, shs, cam,
                            bg_color=bg, max_instances=1 << 14,
                            interpret=True)

    from gslivm_tpu.ops.rasterize_reference import tile_grid
    gx, gy = tile_grid(cam.width, cam.height)
    stitched = np.zeros((3, cam.height, cam.width), np.float32)
    for y0 in range(0, gy, 2):
        band = rasterize_pallas(means, scales, quats, opac, shs, cam,
                                bg_color=bg, max_instances=1 << 14,
                                interpret=True, tile_band=(y0, y0 + 2))
        rows = slice(y0 * 16, min((y0 + 2) * 16, cam.height))
        stitched[:, rows] = np.asarray(band.color)[:, rows]
    np.testing.assert_allclose(stitched, np.asarray(full.color),
                               atol=1e-6, rtol=1e-5)


@pytest.mark.parametrize("bx,by", [(2, 2), (2, 1), (4, 2)])
def test_supertile_matches_tile(bx, by, rng):
    """Supertile (blocked) rendering must match the 1x1 tile path exactly:
    images AND gradients (the in-kernel rect test restores the reference's
    3-sigma rect-cut semantics that coarse binning would otherwise lose)."""
    n = 150
    cam = _cam()
    means, scales, quats, opac, shs = _scene(n, rng)
    bg = jnp.asarray([0.2, 0.5, 0.8])
    gt = jnp.asarray(rng.uniform(size=(3, cam.height, cam.width)), jnp.float32)

    def loss(block):
        def f(means, scales, quats, opac, shs):
            out = rasterize_pallas(means, scales, quats, opac, shs, cam,
                                   bg_color=bg, max_instances=1 << 14,
                                   capacity_slack=1.0, interpret=True,
                                   block_x=block[0], block_y=block[1])
            return (jnp.sum((out.color - gt) ** 2) + jnp.sum(out.acc)
                    + 0.1 * jnp.sum(out.depth)), out
        return f

    (v1, o1), g1 = jax.value_and_grad(loss((1, 1)), argnums=(0, 1, 2, 3, 4),
                                      has_aux=True)(means, scales, quats,
                                                    opac, shs)
    (v2, o2), g2 = jax.value_and_grad(loss((bx, by)), argnums=(0, 1, 2, 3, 4),
                                      has_aux=True)(means, scales, quats,
                                                    opac, shs)
    np.testing.assert_allclose(np.asarray(o2.color), np.asarray(o1.color),
                               atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(o2.depth), np.asarray(o1.depth),
                               atol=2e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(o2.acc), np.asarray(o1.acc),
                               atol=2e-5, rtol=1e-4)
    for a, b in zip(g1, g2):
        a, b = np.asarray(a), np.asarray(b)
        scale = np.abs(a).max() + 1e-8
        # supertile and tile paths sum per-pixel gradient contributions in
        # different orders (one 32x32 program's reduction vs four 16x16
        # programs'), so equality is f32-reassociation-tight, not bit-exact
        np.testing.assert_allclose(b, a, atol=1e-5 * scale, rtol=1e-4)


def test_skip_depth_grad_matches_full():
    """With zero depth cotangent (the reference drop contract), the
    depth-row-skipping backward (depth_grad=False) must produce identical
    parameter gradients to the full backward."""
    rng = np.random.default_rng(5)
    n = 64
    cam = _cam(48, 32)
    means, scales, quats, opac, shs = _scene(n, rng)
    gt = jnp.asarray(rng.uniform(size=(3, 32, 48)), dtype=jnp.float32)

    def loss_with(dg):
        def f(means, scales, quats, opac, shs):
            out = rasterize_pallas(means, scales, quats, opac, shs, cam,
                                   max_instances=1 << 13, interpret=True,
                                   depth_grad=dg)
            return jnp.sum((out.color - gt) ** 2) + 0.1 * jnp.sum(out.acc)
        return f

    g_full = jax.grad(loss_with(True), argnums=(0, 1, 2, 3, 4))(
        means, scales, quats, opac, shs)
    g_skip = jax.grad(loss_with(False), argnums=(0, 1, 2, 3, 4))(
        means, scales, quats, opac, shs)
    for a, b in zip(g_full, g_skip):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=1e-6, rtol=1e-6)


def test_skip_contrib_matches_stats():
    """contrib_stats=False (the production train-path variant) must change
    NOTHING except n_contrib, which renders as zeros — images and all
    parameter gradients stay bit-identical (the bookkeeping it skips never
    feeds the composite)."""
    rng = np.random.default_rng(11)
    n = 96
    cam = _cam(48, 32)
    means, scales, quats, opac, shs = _scene(n, rng)
    gt = jnp.asarray(rng.uniform(size=(3, 32, 48)), dtype=jnp.float32)

    def run(stats):
        def f(means, scales, quats, opac, shs):
            out = rasterize_pallas(means, scales, quats, opac, shs, cam,
                                   max_instances=1 << 13, interpret=True,
                                   contrib_stats=stats)
            return (jnp.sum((out.color - gt) ** 2) + 0.1 * jnp.sum(out.acc),
                    out)
        (_, out), g = jax.value_and_grad(
            f, argnums=(0, 1, 2, 3, 4), has_aux=True)(
            means, scales, quats, opac, shs)
        return out, g

    out_s, g_s = run(True)
    out_n, g_n = run(False)
    assert np.asarray(out_s.n_contrib).max() > 0
    assert np.asarray(out_n.n_contrib).max() == 0
    for field in ("color", "depth", "acc", "final_T"):
        np.testing.assert_array_equal(np.asarray(getattr(out_n, field)),
                                      np.asarray(getattr(out_s, field)))
    for a, b in zip(g_s, g_n):
        np.testing.assert_array_equal(np.asarray(b), np.asarray(a))


def test_sparse_scene_empty_tile_handoff():
    """Scene clustered into one corner: most tiles bin ZERO chunks. The
    cross-program prefetch forwards the first-chunk baton through runs of
    empty tiles (every program issues the successor's start regardless of
    its own chunk count) — images and grads must still match the oracle."""
    rng = np.random.default_rng(17)
    n = 48
    cam = _cam(128, 96)
    means, scales, quats, opac, shs = _scene(n, rng, spread=0.25, z0=5.0,
                                             scale_hi=0.08)
    # push the cluster toward the upper-left corner of the frame
    means = means + jnp.asarray([-1.5, -1.1, 0.0], jnp.float32)
    gt = jnp.asarray(rng.uniform(size=(3, 96, 128)), dtype=jnp.float32)

    def loss_with(backend):
        def f(means, scales, quats, opac, shs):
            if backend == "pallas":
                out = rasterize_pallas(means, scales, quats, opac, shs, cam,
                                       max_instances=1 << 13, interpret=True)
            else:
                out = rasterize_naive(means, scales, quats, opac, shs, cam)
            return jnp.sum((out.color - gt) ** 2) + 0.1 * jnp.sum(out.acc)
        return f

    v_o, g_o = jax.value_and_grad(loss_with("naive"),
                                  argnums=(0, 1, 2, 3, 4))(
        means, scales, quats, opac, shs)
    v_p, g_p = jax.value_and_grad(loss_with("pallas"),
                                  argnums=(0, 1, 2, 3, 4))(
        means, scales, quats, opac, shs)
    np.testing.assert_allclose(float(v_p), float(v_o), rtol=1e-5)
    for a, b in zip(g_o, g_p):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=2e-5, rtol=2e-4)


def test_compacted_grad_capacity_matches_full():
    """grad_capacity > walked total: the compacted grad layout must produce
    BIT-level identical gradients to the full padded layout (same kernel
    math, only the write offsets and the scatter index count change), and
    walked_chunks must be reported for the feedback fit."""
    rng = np.random.default_rng(7)
    n = 120
    cam = _cam(48, 32)
    means, scales, quats, opac, shs = _scene(n, rng)
    bg = jnp.asarray([1.0, 1.0, 1.0])
    gt = jnp.asarray(rng.uniform(size=(3, 32, 48)), dtype=jnp.float32)

    def loss_with(**kw):
        def f(means, scales, quats, opac, shs):
            out = rasterize_pallas(means, scales, quats, opac, shs, cam,
                                   bg_color=bg, max_instances=1 << 14,
                                   interpret=True, **kw)
            return jnp.sum((out.color - gt) ** 2) + jnp.sum(out.acc)
        return f

    out = rasterize_pallas(means, scales, quats, opac, shs, cam, bg_color=bg,
                           max_instances=1 << 14, interpret=True)
    walked = int(out.walked_chunks)
    assert walked > 0
    assert int(out.overflow) == 0

    g_full = jax.grad(loss_with(), argnums=(0, 1, 2, 3, 4))(
        means, scales, quats, opac, shs)
    g_comp = jax.grad(loss_with(grad_capacity=(walked + 2) * CHUNK),
                      argnums=(0, 1, 2, 3, 4))(means, scales, quats, opac,
                                               shs)
    for a, b in zip(g_full, g_comp):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_compacted_grad_undersized_counts_overflow():
    """grad_capacity below the walked total: grads degrade to approximate
    (clamped onto the last slot) but stay finite, and the shortfall is
    counted into overflow so the budget escalation fires."""
    rng = np.random.default_rng(8)
    cam = _cam(48, 32)
    means, scales, quats, opac, shs = _scene(120, rng)
    out_ok = rasterize_pallas(means, scales, quats, opac, shs, cam,
                              max_instances=1 << 14, interpret=True)
    walked = int(out_ok.walked_chunks)
    assert walked > 2
    small = (walked // 2) * CHUNK
    out = rasterize_pallas(means, scales, quats, opac, shs, cam,
                           max_instances=1 << 14, interpret=True,
                           grad_capacity=small)
    assert int(out.overflow) == CHUNK * walked - small

    def f(means, scales, quats, opac, shs):
        out = rasterize_pallas(means, scales, quats, opac, shs, cam,
                               max_instances=1 << 14, interpret=True,
                               grad_capacity=small)
        return jnp.sum(out.color ** 2)

    g = jax.grad(f, argnums=(0, 1, 2, 3, 4))(means, scales, quats, opac, shs)
    for a in g:
        assert np.all(np.isfinite(np.asarray(a)))
