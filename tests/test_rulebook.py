"""Host rulebook must reproduce the device-built sparse-conv index structures."""
import jax
import jax.numpy as jnp
import numpy as np

from multimodal_gar_tpu.data.rulebook import build_rulebook
from multimodal_gar_tpu.models.sparse_backbone import (SparseTensor,
                                                       VoxelBackbone8x)


def _make_input(rng, m=200, n_valid=150, shape=(9, 32, 32)):
    coords = np.stack([rng.integers(0, s, m) for s in shape], -1).astype(np.int32)
    keys = (coords[:, 0].astype(np.int64) * shape[1] + coords[:, 1]) \
        * shape[2] + coords[:, 2]
    _, first = np.unique(keys, return_index=True)
    coords = coords[np.sort(first)][:n_valid]
    nv = len(coords)
    pad = m - nv
    coords = np.concatenate([coords, np.full((pad, 3), -1, np.int32)])
    valid = np.arange(m) < nv
    feats = rng.normal(size=(m, 8)).astype(np.float32) * valid[:, None]
    return coords, valid, feats, nv, shape


def test_backbone_rulebook_matches_device(rng):
    coords, valid, feats, nv, shape = _make_input(rng)
    caps = (200, 200, 100, 50)
    st = SparseTensor(features=jnp.asarray(feats)[None],
                      coords=jnp.asarray(coords)[None],
                      valid=jnp.asarray(valid)[None], spatial_shape=shape)
    bb = VoxelBackbone8x(max_voxels_per_stage=caps)
    v = jax.jit(bb.init)(jax.random.PRNGKey(0), st)

    rb = build_rulebook(coords, nv, shape, caps)
    rb_b = {k: jnp.asarray(np.asarray(val))[None] for k, val in rb.items()}

    out_dev = jax.jit(lambda s: bb.apply(v, s, False))(st)
    out_rb = jax.jit(lambda s: bb.apply(v, s, False, rb_b))(st)

    for key in ("x_conv1", "x_conv2", "x_conv3", "x_conv4"):
        d, r = out_dev[key], out_rb[key]
        np.testing.assert_array_equal(np.asarray(d.valid), np.asarray(r.valid))
        nvk = int(np.asarray(d.valid).sum())
        np.testing.assert_array_equal(np.asarray(d.coords)[0, :nvk],
                                      np.asarray(r.coords)[0, :nvk])
        np.testing.assert_allclose(np.asarray(d.features)[0, :nvk],
                                   np.asarray(r.features)[0, :nvk],
                                   rtol=1e-5, atol=1e-5)


def test_rulebook_shapes_and_types(rng):
    coords, valid, feats, nv, shape = _make_input(rng, m=100, n_valid=60)
    caps = (100, 100, 50, 25)
    rb = build_rulebook(coords, nv, shape, caps)
    assert rb["nbr_0"].shape == (100, 27)
    assert rb["down_1"].shape == (100, 27)
    assert rb["coords_3"].shape == (25, 3)
    # self-neighbor (center tap 13) is always the row itself for valid rows
    assert (rb["nbr_0"][:nv, 13] == np.arange(nv)).all()


def test_rulebook_empty_input():
    coords = np.full((16, 3), -1, np.int32)
    rb = build_rulebook(coords, 0, (5, 8, 8), (16, 16, 8, 4))
    assert (rb["nbr_0"] == -1).all()
    assert int(rb["count_1"]) == 0


def test_rulebook_stamps_band_ok(rng):
    """Every x-window rulebook carries band_ok — the host-side verdict on
    the fused band kernel's spread contract (win_1..win_3 spans < 640 rows
    per 128-query block). Dense-ish small grids satisfy it trivially; the
    stamp must agree with the reference checker in ops/pallas."""
    from multimodal_gar_tpu.ops.pallas.window_conv import band_spread_ok

    coords, valid, feats, nv, shape = _make_input(rng, m=200, n_valid=150)
    rb = build_rulebook(coords, nv, shape, (200, 200, 100, 50))
    assert "band_ok" in rb
    expect = all(band_spread_ok(rb[f"win_{k}"]) for k in (1, 2, 3))
    assert bool(rb["band_ok"]) == expect
    # empty input: vacuously satisfied
    rb0 = build_rulebook(np.full((16, 3), -1, np.int32), 0, (5, 8, 8),
                         (16, 16, 8, 4))
    assert int(rb0["band_ok"]) == 1
