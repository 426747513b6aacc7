"""MPPNet: trajectory linking, geometry encoding, train/predict smoke."""
import jax
import jax.numpy as jnp
import numpy as np

from multimodal_gar_tpu.detection.mppnet import (MPPNetConfig,
                                                 MPPNetDetector,
                                                 MPPNetE2EDetector,
                                                 corner_proxy_points,
                                                 generate_trajectory,
                                                 spherical_coordinate)
from tests.test_detection import tiny_voxel_cfg


def test_corner_proxy_points():
    rois = jnp.asarray([[1.0, 2.0, 0.5, 4.0, 2.0, 1.5, 0.0]])
    p = corner_proxy_points(rois)
    assert p.shape == (1, 9, 3)
    np.testing.assert_allclose(p[0, 8], [1.0, 2.0, 0.5], atol=1e-6)
    # corners span the box extent
    assert np.asarray(p[0, :8, 0]).min() == pytest_approx(-1.0)
    assert np.asarray(p[0, :8, 0]).max() == pytest_approx(3.0)


def pytest_approx(v, tol=1e-5):
    class _A:
        def __eq__(self, other):
            return abs(other - v) < tol
    return _A()


def test_spherical_coordinate_unit():
    off = jnp.asarray([[0.0, 0.0, 2.0]])
    s = spherical_coordinate(off, jnp.asarray([2.0]))
    np.testing.assert_allclose(s[0], [1.0, 1.0, 0.0], atol=1e-5)


def test_generate_trajectory_links_by_iou():
    cur = jnp.asarray([[0.0, 0.0, 0.0, 4.0, 2.0, 1.5, 0.0]])
    prev = jnp.asarray([[[50.0, 0, 0, 4, 2, 1.5, 0],
                         [0.5, 0.1, 0, 4, 2, 1.5, 0]]])   # (1, P=2, 7)
    traj, valid = generate_trajectory(cur, prev)
    assert traj.shape == (2, 1, 7)
    # the overlapping proposal (IoU ~0.7) is linked; frame marked valid
    np.testing.assert_allclose(traj[1, 0, 0], 0.5, atol=1e-6)
    assert bool(valid[0, 0]) and bool(valid[1, 0])

    # no overlapping proposal: hypothesis kept, frame marked invalid
    far = jnp.asarray([[[50.0, 0, 0, 4, 2, 1.5, 0]]])
    traj2, valid2 = generate_trajectory(cur, far)
    np.testing.assert_allclose(np.asarray(traj2[1, 0]),
                               np.asarray(cur[0]), atol=1e-6)
    assert not bool(valid2[1, 0])


def _mf_inputs(t=3, n=128, r=6, seed=0):
    rng = np.random.default_rng(seed)
    pts = rng.uniform([0, -8, -1.5, 0], [16, 8, 1.5, 1],
                      size=(1, t, n, 4)).astype(np.float32)
    rois = np.zeros((1, t, r, 7), np.float32)
    rois[..., 0] = rng.uniform(2, 14, (1, t, r))
    rois[..., 1] = rng.uniform(-6, 6, (1, t, r))
    rois[..., 3:6] = rng.uniform(1, 4, (1, t, r, 3))
    return (jnp.asarray(pts), jnp.ones((1, t, n), bool),
            jnp.asarray(rois), jnp.ones((1, r), bool))


def test_mppnet_train_and_predict():
    cfg = tiny_voxel_cfg("SECOND")
    model = MPPNetDetector(cfg, MPPNetConfig(num_frames=3, points_per_roi=16,
                                             hidden=16, num_heads=2,
                                             num_layers=1))
    fp, pv, tr, rv = _mf_inputs()

    @jax.jit
    def run(fp, pv, tr, rv):
        variables = model.init(jax.random.PRNGKey(0), fp, pv, tr, rv)
        preds, _ = model.apply(variables, fp, pv, tr, rv, train=True,
                               mutable=["batch_stats"])
        return variables, preds

    variables, preds = run(fp, pv, tr, rv)
    gt = tr[:, 0, :2] + 0.1
    losses = model.loss(preds, gt, jnp.ones((1, 2), jnp.int32),
                        jnp.ones((1, 2), bool))
    assert jnp.isfinite(losses["loss"]), losses

    out = jax.jit(model.predict)(preds)
    assert out["boxes"].shape[-1] == 7


def test_mppnet_e2e_memory_bank():
    """The E2E bank holds per-step proxy GEOMETRY features; online steps
    crop only the current frame and reuse banked features for the past."""
    cfg = tiny_voxel_cfg("SECOND")
    mp = MPPNetConfig(num_frames=3, points_per_roi=16, hidden=16,
                      num_heads=2, num_layers=1)
    model = MPPNetE2EDetector(cfg, mp)
    fp, pv, tr, rv = _mf_inputs()

    variables = model.init(jax.random.PRNGKey(0), fp, pv, tr, rv)
    out1 = model.apply(variables, fp, pv, tr, rv)
    b, r = rv.shape
    assert out1["memory"].shape == (b, 2, r, mp.proxy_grid ** 3, mp.hidden)
    # the newest slot is the current frame's geometry features
    np.testing.assert_allclose(np.asarray(out1["memory"][:, 0]),
                               np.asarray(out1["geo_memory_out"]),
                               atol=1e-6)

    # ONLINE step: only the current frame's points are supplied; past
    # frames read the bank. Rolls: old slot 0 -> new slot 1; validity
    # rides along so never-written cold slots trigger the repeat-current
    # fallback instead of being consumed as real zeros.
    out2 = model.apply(variables, fp[:, :1], pv[:, :1], tr, rv,
                       memory=out1["memory"],
                       memory_valid=out1["memory_valid"])
    np.testing.assert_allclose(np.asarray(out2["memory"][:, 1]),
                               np.asarray(out1["memory"][:, 0]), atol=1e-6)
    assert np.asarray(out1["memory_valid"][:, 0]).all()       # step-1 slot
    assert not np.asarray(out1["memory_valid"][:, 1]).any()   # cold slot
    assert np.isfinite(np.asarray(out2["rcnn_cls"])).all()
    assert np.isfinite(np.asarray(out2["rcnn_reg"])).all()


def test_mppnet_architecture_structure():
    """The head carries the reference's structural pieces: proxy-grid
    pooling MLPs, per-axis spatial mixers, grouped encoder with inter-group
    cross-attention, shared class/bbox embeds, PointNet box branch."""
    cfg = tiny_voxel_cfg("SECOND")
    mp = MPPNetConfig(num_frames=4, num_groups=2, points_per_roi=16,
                      hidden=16, num_heads=2, num_layers=2)
    model = MPPNetDetector(cfg, mp)
    fp, pv, tr, rv = _mf_inputs(t=4)
    variables = jax.jit(lambda *a: model.init(jax.random.PRNGKey(0), *a))(
        fp, pv, tr, rv)
    head = variables["params"]["head"]
    assert "pool_mlp0" in head and "pool_mlp1" in head
    assert "up_dim_geometry" in head and "up_dim_motion" in head
    assert "seqboxembed" in head and "jointembed" in head
    assert "fusion_all_group" in head          # 4 frames / 2 groups
    enc0 = head["enc0"]
    assert "mixer" in enc0 and "mix_x" in enc0["mixer"]
    assert "cross0" in enc0 and "fusion_all" in enc0
    enc1 = head["enc1"]                        # last layer: no cross-att
    assert "cross0" not in enc1
    assert head["group_tokens"].shape == (2, 1, 1, 16)
    # shared heads: one class embed, one bbox embed per group
    assert "class_embed" in head
    assert "bbox_embed0" in head and "bbox_embed1" in head
