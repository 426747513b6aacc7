"""x-window sparse-conv gathers: packed-map parity with the nbr/down maps.

The x-window path (data/rulebook.py add_x_window_maps +
models/sparse_backbone.py window_gather) must reproduce the 27-tap gathers
bit-for-bit: selected taps are copied (multiplied by an exact 1.0), absent
taps are exact zeros. Exercised on a fully-occupied tiny grid so every
z/y/x boundary (including the y->z+1 linear-key wrap hazard) occurs.
"""
import numpy as np
import jax
import jax.numpy as jnp

from multimodal_gar_tpu.data.rulebook import (_kernel_offsets_centered,
                                              build_rulebook)
from multimodal_gar_tpu.models.sparse_backbone import (SparseTensor,
                                                       VoxelBackbone8x,
                                                       window_gather)


def _dense_coords(shape, rng, drop=0.3):
    zz, yy, xx = np.meshgrid(*[np.arange(s) for s in shape], indexing="ij")
    coords = np.stack([zz.ravel(), yy.ravel(), xx.ravel()],
                      -1).astype(np.int32)
    keep = rng.uniform(size=len(coords)) >= drop
    coords = coords[keep]
    return coords[rng.permutation(len(coords))]


def test_window_gather_matches_direct_neighbors():
    rng = np.random.default_rng(0)
    shape = (4, 5, 6)
    coords = _dense_coords(shape, rng)
    n = len(coords)
    cap = n + 8                                    # padded tail rows
    coords_p = np.concatenate([coords, np.full((8, 3), -1, np.int32)])
    rb = build_rulebook(coords_p, n, shape, (cap, cap, cap, cap),
                        x_window=True)

    c = 7                                          # odd width on purpose
    feats = rng.normal(size=(cap, c)).astype(np.float32)
    order = rb["order_0"]
    fs = feats[order]
    sc = coords_p[order]

    g = np.asarray(window_gather(jnp.asarray(fs), jnp.asarray(rb["win_0"])))
    assert g.shape == (cap, 27, c)

    key2row = {tuple(cc): i for i, cc in enumerate(sc[:n])}
    offs = np.asarray(_kernel_offsets_centered())
    expect = np.zeros((cap, 27, c), np.float32)
    for i in range(n):
        for t, off in enumerate(offs):
            nb = sc[i] + off
            if ((nb >= 0).all() and (nb < np.asarray(shape)).all()
                    and tuple(nb) in key2row):
                expect[i, t] = fs[key2row[tuple(nb)]]
    np.testing.assert_array_equal(g[:n], expect[:n])
    # padded query rows gather exact zeros
    np.testing.assert_array_equal(g[n:], 0.0)


def test_dwin_matches_down_map():
    """Strided-conv window maps reproduce the down_k gather exactly."""
    rng = np.random.default_rng(1)
    shape = (5, 6, 7)
    coords = _dense_coords(shape, rng, drop=0.5)
    n = len(coords)
    cap = n + 5
    coords_p = np.concatenate([coords, np.full((5, 3), -1, np.int32)])
    rb = build_rulebook(coords_p, n, shape, (cap, cap, cap, cap),
                        x_window=True)

    c = 5
    feats = rng.normal(size=(cap, c)).astype(np.float32)
    # down_1 addresses stage-0 ORIGINAL rows; dwin_1 addresses the sorted
    # ones. Stages >= 1 are emitted key-sorted, so both views coincide there.
    f_orig = feats
    f_sorted = feats[rb["order_0"]]

    for k in (1, 2, 3):
        down = rb[f"down_{k}"]                     # rows into stage k-1
        n_out = int(rb[f"count_{k}"])
        expect = np.where((down >= 0)[..., None],
                          f_orig[np.maximum(down, 0)], 0.0).astype(np.float32)
        g = np.asarray(window_gather(jnp.asarray(f_sorted),
                                     jnp.asarray(rb[f"dwin_{k}"])))
        np.testing.assert_array_equal(g[:n_out], expect[:n_out])
        np.testing.assert_array_equal(g[n_out:], 0.0)
        # fresh features keyed to stage-k rows for the next iteration
        f_orig = f_sorted = rng.normal(
            size=(down.shape[0], c)).astype(np.float32)


def test_backbone_xwindow_parity():
    """Full VoxelBackbone8x: x-window path == nbr/down path per stage."""
    from multimodal_gar_tpu.utils.testing import synthetic_batch, tiny_config

    cfg = tiny_config()
    batch = synthetic_batch(cfg, batch_size=2)
    rb = batch.rulebook
    assert "win_0" in rb, "synthetic rulebook must carry x-window maps"
    nx, ny, nz = cfg.data.point_cloud.grid_size
    feats = jnp.mean(batch.voxels, axis=2)
    feats = feats * batch.voxel_valid[..., None].astype(feats.dtype)
    st = SparseTensor(features=feats, coords=batch.voxel_coords,
                      valid=batch.voxel_valid,
                      spatial_shape=(nz + 1, ny, nx))
    caps = cfg.model.lidar.max_voxels_per_stage
    bb_old = VoxelBackbone8x(caps, x_window=False)
    bb_new = VoxelBackbone8x(caps, x_window=True)

    variables = jax.jit(lambda s, r: bb_old.init(
        jax.random.PRNGKey(0), s, train=False, rulebook=r))(st, rb)
    out_old = jax.jit(lambda v, s, r: bb_old.apply(
        v, s, train=False, rulebook=r))(variables, st, rb)
    out_new = jax.jit(lambda v, s, r: bb_new.apply(
        v, s, train=False, rulebook=r))(variables, st, rb)

    # stage 0 rows are key-reordered on the x-window path
    order = rb["order_0"]
    o0, n0 = out_old["x_conv1"], out_new["x_conv1"]
    np.testing.assert_array_equal(
        np.asarray(jnp.take_along_axis(o0.coords, order[..., None], 1)),
        np.asarray(n0.coords))
    np.testing.assert_allclose(
        np.asarray(jnp.take_along_axis(o0.features, order[..., None], 1)),
        np.asarray(n0.features), atol=1e-5, rtol=1e-5)
    # downsampled stages share the rulebook's (sorted) row order
    for k in ("x_conv2", "x_conv3", "x_conv4"):
        np.testing.assert_array_equal(np.asarray(out_old[k].valid),
                                      np.asarray(out_new[k].valid))
        np.testing.assert_allclose(np.asarray(out_old[k].features),
                                   np.asarray(out_new[k].features),
                                   atol=1e-5, rtol=1e-5)


def test_backbone_fused_window_parity():
    """x_window_fused (Pallas subm kernel, interpret on CPU) == XLA x-window
    path through the full VoxelBackbone8x."""
    from multimodal_gar_tpu.utils.testing import synthetic_batch, tiny_config

    cfg = tiny_config()
    batch = synthetic_batch(cfg, batch_size=2)
    rb = batch.rulebook
    nx, ny, nz = cfg.data.point_cloud.grid_size
    feats = jnp.mean(batch.voxels, axis=2)
    feats = feats * batch.voxel_valid[..., None].astype(feats.dtype)
    st = SparseTensor(features=feats, coords=batch.voxel_coords,
                      valid=batch.voxel_valid,
                      spatial_shape=(nz + 1, ny, nx))
    caps = cfg.model.lidar.max_voxels_per_stage
    bb_xla = VoxelBackbone8x(caps, x_window=True)
    bb_fused = VoxelBackbone8x(caps, x_window=True, x_window_fused=True)
    variables = jax.jit(lambda s, r: bb_xla.init(
        jax.random.PRNGKey(0), s, train=False, rulebook=r))(st, rb)
    out_xla = jax.jit(lambda v, s, r: bb_xla.apply(
        v, s, train=False, rulebook=r))(variables, st, rb)
    out_fused = jax.jit(lambda v, s, r: bb_fused.apply(
        v, s, train=False, rulebook=r))(variables, st, rb)
    for k in ("x_conv1", "x_conv2", "x_conv3", "x_conv4"):
        np.testing.assert_allclose(np.asarray(out_xla[k].features),
                                   np.asarray(out_fused[k].features),
                                   atol=1e-5, rtol=1e-5)


def test_second_detector_xwindow_parity():
    """SECOND with x_window on == off (BEV scatter is order-agnostic)."""
    import dataclasses

    from multimodal_gar_tpu.data.rulebook import build_rulebook
    from multimodal_gar_tpu.detection.detectors import build_detector
    from tests.test_detection import det_batch, tiny_voxel_cfg

    cfg = tiny_voxel_cfg("SECOND")
    batch = det_batch(cfg, m=64, g=3, seed=5)
    caps = (64,) + tuple(cfg.max_voxels_per_stage[1:])  # stage-0 cap == m
    rbs = []
    for b in range(batch.voxel_coords.shape[0]):
        coords = np.asarray(batch.voxel_coords[b])
        n = int(np.asarray(batch.voxel_valid[b]).sum())
        rbs.append(build_rulebook(coords, n, cfg.sparse_shape,
                                  caps, x_window=True))
    rb = {k: jnp.asarray(np.stack([r[k] for r in rbs])) for k in rbs[0]}
    batch = batch.replace(rulebook=rb)

    model_off = build_detector("SECOND", cfg)
    model_on = build_detector("SECOND", dataclasses.replace(cfg,
                                                            x_window=True))
    variables = jax.jit(lambda b: model_off.init(
        jax.random.PRNGKey(0), b, train=False))(batch)
    p_off = jax.jit(lambda v, b: model_off.apply(v, b, train=False))(
        variables, batch)
    p_on = jax.jit(lambda v, b: model_on.apply(v, b, train=False))(
        variables, batch)
    np.testing.assert_allclose(np.asarray(p_off["cls_preds"]),
                               np.asarray(p_on["cls_preds"]),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(p_off["box_preds"]),
                               np.asarray(p_on["box_preds"]),
                               atol=1e-4, rtol=1e-4)


def test_window_conv_pallas_interpret_parity():
    """Fused Pallas x-window layer == window_gather + einsum (interpret)."""
    from multimodal_gar_tpu.ops.pallas.window_conv import window_conv_pallas

    rng = np.random.default_rng(3)
    shape = (4, 6, 8)
    coords = _dense_coords(shape, rng, drop=0.4)
    n = len(coords)
    cap = ((n + 8 + 7) // 8) * 8                  # block divisibility
    coords_p = np.concatenate(
        [coords, np.full((cap - n, 3), -1, np.int32)])
    rb = build_rulebook(coords_p, n, shape, (cap, cap, cap, cap),
                        x_window=True)
    c, d = 8, 16
    feats = rng.normal(size=(cap, c)).astype(np.float32)
    fs = feats[rb["order_0"]]
    w = rng.normal(size=(27, c, d)).astype(np.float32) * 0.1

    ref = jnp.einsum("rkc,kcd->rd",
                     window_gather(jnp.asarray(fs),
                                   jnp.asarray(rb["win_0"])),
                     jnp.asarray(w))
    out = window_conv_pallas(jnp.asarray(fs), jnp.asarray(rb["win_0"]),
                             jnp.asarray(w), interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)


def test_window_conv_band_interpret_parity():
    """Scalar-prefetch band kernel == window_gather + einsum (interpret).

    Covers: band DMA at dynamic starts, one-hot MXU gather, slot select,
    multi-block grids (qb < rows), and the device-side violation counter
    (0 under the spread contract)."""
    from multimodal_gar_tpu.ops.pallas.window_conv import (band_spread_ok,
                                                           window_conv_band)

    rng = np.random.default_rng(5)
    shape = (6, 10, 12)
    coords = _dense_coords(shape, rng, drop=0.5)
    n = len(coords)
    cap = ((n + 8 + 7) // 8) * 8
    coords_p = np.concatenate(
        [coords, np.full((cap - n, 3), -1, np.int32)])
    rb = build_rulebook(coords_p, n, shape, (cap, cap, cap, cap),
                        x_window=True)
    c, d = 8, 16
    feats = rng.normal(size=(cap, c)).astype(np.float32)
    fs = feats[rb["order_0"]]
    w = rng.normal(size=(27, c, d)).astype(np.float32) * 0.1
    win = jnp.asarray(rb["win_0"])

    band = 128
    assert band_spread_ok(rb["win_0"], band=band, qb=64)
    ref = jnp.einsum("rkc,kcd->rd",
                     window_gather(jnp.asarray(fs), win), jnp.asarray(w))
    out, viol = window_conv_band(jnp.asarray(fs), win, jnp.asarray(w),
                                 band=band, qb=64, interpret=True,
                                 check=True)
    assert int(viol) == 0
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)


def test_window_conv_band_detects_spread_violations():
    """A band far below the real spread trips both the host checker and the
    device violation counter (out-of-band taps contribute zero, gracefully)."""
    from multimodal_gar_tpu.ops.pallas.window_conv import (band_spread_ok,
                                                           window_conv_band)

    rng = np.random.default_rng(9)
    shape = (8, 12, 12)
    coords = _dense_coords(shape, rng, drop=0.2)
    n = len(coords)
    cap = ((n + 7) // 8) * 8
    coords_p = np.concatenate(
        [coords, np.full((cap - n, 3), -1, np.int32)])
    rb = build_rulebook(coords_p, n, shape, (cap, cap, cap, cap),
                        x_window=True)
    assert not band_spread_ok(rb["win_0"], band=16, qb=128)
    feats = rng.normal(size=(cap, 8)).astype(np.float32)
    w = rng.normal(size=(27, 8, 8)).astype(np.float32)
    _, viol = window_conv_band(
        jnp.asarray(feats[rb["order_0"]]), jnp.asarray(rb["win_0"]),
        jnp.asarray(w), band=16, qb=128, interpret=True, check=True)
    assert int(viol) > 0
