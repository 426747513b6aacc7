"""Detector zoo: anchors, coders, target assignment, NMS post, detectors."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_gar_tpu.detection.anchors import (AnchorClassConfig,
                                                  generate_anchors)
from multimodal_gar_tpu.detection.box_coders import (PointResidualCoder,
                                                     ResidualCoder)
from multimodal_gar_tpu.detection.detectors import (DetBatch, DetectorConfig,
                                                    available_detectors,
                                                    build_detector,
                                                    default_config)
from multimodal_gar_tpu.detection.dense_heads import (AnchorHeadConfig,
                                                      CenterHeadConfig,
                                                      gaussian_heatmap_targets)
from multimodal_gar_tpu.detection.post import (NMSConfig, class_agnostic_nms,
                                               generate_recall_record,
                                               post_processing)
from multimodal_gar_tpu.detection.target_assign import (assign_targets,
                                                        build_anchor_set)


# ---------------------------------------------------------------------------
# anchors
# ---------------------------------------------------------------------------

def test_generate_anchors_layout():
    cfgs = (AnchorClassConfig("Car", ((3.9, 1.6, 1.56),), (0.0, 1.57),
                              (-1.78,), False, 2, 0.6, 0.45),)
    anchors, npl = generate_anchors(cfgs, (8, 8), (0, -4, -3, 8, 4, 1))
    assert npl == [2]
    a = anchors[0]
    assert a.shape == (4 * 4 * 2, 7)
    # first location: x=0, y=-4 (align_center=False -> offset 0)
    np.testing.assert_allclose(a[0, :3], [0, -4, -1.78 + 1.56 / 2], atol=1e-5)
    np.testing.assert_allclose(a[0, 3:6], [3.9, 1.6, 1.56], atol=1e-6)
    assert a[0, 6] == 0.0 and abs(a[1, 6] - 1.57) < 1e-6
    # stride = range / (fmap - 1) = 8/3
    np.testing.assert_allclose(a[2, 0], 8 / 3, atol=1e-5)


def test_anchor_set_interleave():
    cfgs = (AnchorClassConfig("A", ((1, 1, 1),), (0.0,), (0.0,), False, 2,
                              0.6, 0.45),
            AnchorClassConfig("B", ((2, 2, 2),), (0.0,), (0.0,), False, 2,
                              0.5, 0.35))
    aset = build_anchor_set(cfgs, (4, 4), (0, 0, 0, 4, 4, 4))
    assert aset.num_per_loc == 2
    assert aset.anchors.shape == (2 * 2 * 2, 7)
    # per location: class-major
    np.testing.assert_array_equal(aset.class_ids[:4], [1, 2, 1, 2])
    np.testing.assert_allclose(aset.matched_thr[:2], [0.6, 0.5])


# ---------------------------------------------------------------------------
# box coders
# ---------------------------------------------------------------------------

def test_residual_coder_roundtrip_and_golden():
    coder = ResidualCoder()
    anchors = jnp.array([[1.0, 2.0, 0.0, 4.0, 2.0, 1.5, 0.3]])
    boxes = jnp.array([[2.0, 1.0, 0.5, 3.0, 2.5, 1.8, 0.9]])
    enc = coder.encode(boxes, anchors)
    dec = coder.decode(enc, anchors)
    np.testing.assert_allclose(dec, boxes, atol=1e-5)
    # golden: xt = (xg-xa)/diag, diag = sqrt(dxa^2+dya^2)
    diag = np.sqrt(16 + 4)
    np.testing.assert_allclose(enc[0, 0], 1.0 / diag, atol=1e-6)
    np.testing.assert_allclose(enc[0, 2], 0.5 / 1.5, atol=1e-6)
    np.testing.assert_allclose(enc[0, 3], np.log(3.0 / 4.0), atol=1e-6)
    np.testing.assert_allclose(enc[0, 6], 0.6, atol=1e-6)


def test_residual_coder_sincos():
    coder = ResidualCoder(encode_angle_by_sincos=True)
    anchors = jnp.array([[0.0, 0.0, 0.0, 2.0, 2.0, 2.0, 0.5]])
    boxes = jnp.array([[1.0, -1.0, 0.2, 2.0, 3.0, 1.0, 2.5]])
    dec = coder.decode(coder.encode(boxes, anchors), anchors)
    np.testing.assert_allclose(dec[0, :6], boxes[0, :6], atol=1e-5)
    # heading equal modulo 2pi
    assert abs((dec[0, 6] - boxes[0, 6] + np.pi) % (2 * np.pi) - np.pi) < 1e-5


def test_point_residual_coder_roundtrip():
    coder = PointResidualCoder(mean_size=((3.9, 1.6, 1.56),))
    pts = jnp.array([[1.0, 2.0, -0.5]])
    gt = jnp.array([[2.0, 2.5, 0.0, 4.0, 1.5, 1.6, 1.1]])
    cls = jnp.array([1])
    dec = coder.decode(coder.encode(gt, pts, cls), pts, cls)
    np.testing.assert_allclose(dec, gt, atol=1e-5)


# ---------------------------------------------------------------------------
# target assignment
# ---------------------------------------------------------------------------

def _toy_anchor_set():
    cfgs = (AnchorClassConfig("Car", ((4.0, 2.0, 1.5),), (0.0,), (0.0,),
                              False, 4, 0.6, 0.45),)
    return build_anchor_set(cfgs, (16, 16), (0, 0, -2, 16, 16, 2)), cfgs


def test_assign_targets_exact_match_and_background():
    aset, _ = _toy_anchor_set()
    coder = ResidualCoder()
    # GT sitting exactly on anchor 0's position
    a0 = aset.anchors[0]
    gt = jnp.array([[a0[0], a0[1], a0[2], 4.0, 2.0, 1.5, 0.0],
                    [0.0] * 7])
    labels, targets, weights = assign_targets(
        aset, coder, gt, jnp.array([1, 1]), jnp.array([True, False]))
    assert labels[0] == 1                       # perfect IoU -> foreground
    np.testing.assert_allclose(targets[0], 0.0, atol=1e-5)
    assert weights[0] == 1.0
    # far-away anchors are background (0), not ignore
    assert labels[-1] == 0 and weights[-1] == 0.0


def test_assign_targets_forced_match():
    aset, _ = _toy_anchor_set()
    coder = ResidualCoder()
    # small GT: IoU with every anchor < matched_thr, still must be matched
    # to its best anchor (axis_aligned_target_assigner.py:155-158)
    gt = jnp.array([[aset.anchors[0, 0] + 0.5, aset.anchors[0, 1], 0.0,
                     1.0, 1.0, 1.0, 0.0]])
    labels, _, _ = assign_targets(aset, coder, gt, jnp.array([1]),
                                  jnp.array([True]))
    assert (labels > 0).sum() >= 1


def test_assign_targets_no_valid_gt_all_background():
    aset, _ = _toy_anchor_set()
    coder = ResidualCoder()
    gt = jnp.zeros((2, 7))
    labels, _, weights = assign_targets(aset, coder, gt, jnp.array([1, 1]),
                                        jnp.array([False, False]))
    assert (labels == 0).all() and (weights == 0).all()


# ---------------------------------------------------------------------------
# NMS / post-processing
# ---------------------------------------------------------------------------

def test_class_agnostic_nms_suppression():
    boxes = jnp.array([
        [0.0, 0.0, 0.0, 4.0, 2.0, 1.5, 0.0],
        [0.1, 0.0, 0.0, 4.0, 2.0, 1.5, 0.0],      # overlaps box 0
        [20.0, 0.0, 0.0, 4.0, 2.0, 1.5, 0.0],     # far away
    ])
    scores = jnp.array([0.9, 0.8, 0.7])
    cfg = NMSConfig(nms_thresh=0.5, nms_pre_maxsize=3, nms_post_maxsize=3,
                    score_thresh=0.1)
    idx, sc, valid = class_agnostic_nms(scores, boxes, cfg)
    assert bool(valid[0]) and bool(valid[1])
    assert not bool(valid[2])                     # only 2 survive
    assert set(np.asarray(idx[valid]).tolist()) == {0, 2}


def test_post_processing_shapes_and_threshold():
    n, c = 10, 3
    rng = np.random.default_rng(0)
    cls = jnp.asarray(rng.normal(size=(2, n, c)), jnp.float32)
    boxes = jnp.asarray(
        np.concatenate([rng.uniform(0, 50, (2, n, 3)),
                        rng.uniform(1, 3, (2, n, 3)),
                        rng.uniform(-1, 1, (2, n, 1))], -1), jnp.float32)
    cfg = NMSConfig(nms_pre_maxsize=8, nms_post_maxsize=4, score_thresh=0.3)
    out = post_processing(cls, boxes, cfg)
    assert out["boxes"].shape == (2, 4, 7)
    assert out["scores"].shape == (2, 4)
    # every valid output satisfies the score threshold
    assert bool((out["scores"][out["valid"]] >= 0.3).all())
    assert bool((out["labels"][out["valid"]] >= 1).all())


def test_generate_recall_record():
    gt = jnp.array([[0.0, 0.0, 0.0, 4.0, 2.0, 1.5, 0.0],
                    [30.0, 0.0, 0.0, 4.0, 2.0, 1.5, 0.0]])
    preds = jnp.array([[0.05, 0.0, 0.0, 4.0, 2.0, 1.5, 0.0]])  # hits gt 0
    rec = generate_recall_record(preds, jnp.array([True]), gt,
                                 jnp.array([True, True]), (0.5,))
    assert int(rec["gt"]) == 2
    assert int(rec["rcnn_0.5"]) == 1


# ---------------------------------------------------------------------------
# CenterHead targets
# ---------------------------------------------------------------------------

def test_gaussian_heatmap_targets_peak():
    cfg = CenterHeadConfig(class_names=("Car",), feature_map_stride=1)
    grid = (16, 16, 1)
    gt = jnp.array([[4.5, 8.5, 0.0, 2.0, 2.0, 1.5, 0.0]])
    hm, reg, inds, mask = gaussian_heatmap_targets(
        cfg, grid, (1.0, 1.0, 4.0), (0, 0, -2, 16, 16, 2),
        gt, jnp.array([1]), jnp.array([True]))
    assert hm.shape == (16, 16, 1)
    assert bool(mask[0])
    # peak of 1.0 at the integer center cell (y=8, x=4)
    np.testing.assert_allclose(hm[8, 4, 0], 1.0, atol=1e-6)
    assert int(inds[0]) == 8 * 16 + 4
    np.testing.assert_allclose(reg[0, :2], [0.5, 0.5], atol=1e-5)


# ---------------------------------------------------------------------------
# full detectors (tiny configs)
# ---------------------------------------------------------------------------

def tiny_voxel_cfg(name="SECOND"):
    anchors = (
        AnchorClassConfig("Car", ((3.9, 1.6, 1.56),), (0.0, 1.57), (-1.0,),
                          False, 8, 0.55, 0.4),
        AnchorClassConfig("Pedestrian", ((0.8, 0.6, 1.73),), (0.0, 1.57),
                          (-0.6,), False, 8, 0.5, 0.35),
    )
    base = default_config(name)
    return dataclasses.replace(
        base,
        class_names=("Car", "Pedestrian"),
        point_cloud_range=(0.0, -8.0, -1.5, 16.0, 8.0, 1.5),
        voxel_size=(0.25, 0.25, 0.125),        # grid 64 x 64 x 24
        max_voxels_per_stage=(256, 128, 64, 32),
        anchors=anchors,
        head=AnchorHeadConfig(num_class=2),
        center_head=CenterHeadConfig(class_names=("Car", "Pedestrian"),
                                     shared_conv_channels=16),
        nms=NMSConfig(nms_pre_maxsize=64, nms_post_maxsize=16,
                      score_thresh=0.05),
        bev_layer_nums=(1, 1), bev_layer_strides=(1, 2),
        bev_num_filters=(32, 32), bev_upsample_strides=(1, 2),
        bev_num_upsample_filters=(32, 32))


def tiny_pillar_cfg(name="PointPillar"):
    anchors = (
        AnchorClassConfig("Car", ((3.9, 1.6, 1.56),), (0.0, 1.57), (-1.0,),
                          False, 2, 0.55, 0.4),
    )
    base = default_config(name)
    return dataclasses.replace(
        base,
        class_names=("Car",),
        point_cloud_range=(0.0, -8.0, -2.0, 16.0, 8.0, 2.0),
        voxel_size=(0.5, 0.5, 4.0),            # pillars: grid 32 x 32 x 1
        anchors=anchors,
        head=AnchorHeadConfig(num_class=1),
        nms=NMSConfig(nms_pre_maxsize=32, nms_post_maxsize=8,
                      score_thresh=0.05),
        # output stride 2 to match the anchors' feature_map_stride=2
        bev_layer_nums=(1, 1), bev_layer_strides=(2, 2),
        bev_num_filters=(16, 32), bev_upsample_strides=(1, 2),
        bev_num_upsample_filters=(16, 16),
        pillar_filters=(16,))


def det_batch(cfg: DetectorConfig, batch_size=1, m=64, p=5, g=4, seed=0):
    rng = np.random.default_rng(seed)
    pr = cfg.point_cloud_range
    nx, ny, nz = cfg.grid_size
    pts = rng.uniform(low=[pr[0], pr[1], pr[2], 0.0],
                      high=[pr[3], pr[4], pr[5], 1.0],
                      size=(batch_size, m, p, 4)).astype(np.float32)
    vs = np.asarray(cfg.voxel_size)
    cxyz = ((pts[:, :, 0, :3] - np.asarray(pr[:3])) // vs).astype(np.int32)
    cxyz = np.clip(cxyz, 0, np.asarray([nx - 1, ny - 1, nz - 1]))
    coords = cxyz[..., ::-1].copy()
    num = rng.integers(1, p + 1, size=(batch_size, m)).astype(np.int32)
    valid = np.ones((batch_size, m), bool)
    # dedupe coords (voxelizer invariant)
    for b in range(batch_size):
        keys = (coords[b, :, 0].astype(np.int64) * ny + coords[b, :, 1]) \
            * nx + coords[b, :, 2]
        _, first = np.unique(keys, return_index=True)
        dup = np.ones(m, bool)
        dup[first] = False
        valid[b, dup] = False
        coords[b, ~valid[b]] = -1
        order = np.argsort(~valid[b], kind="stable")
        coords[b], pts[b] = coords[b][order], pts[b][order]
        num[b], valid[b] = num[b][order], valid[b][order]

    gt = np.zeros((batch_size, g, 7), np.float32)
    gt[..., 0] = rng.uniform(pr[0] + 2, pr[3] - 2, (batch_size, g))
    gt[..., 1] = rng.uniform(pr[1] + 2, pr[4] - 2, (batch_size, g))
    gt[..., 2] = rng.uniform(-0.5, 0.5, (batch_size, g))
    gt[..., 3:6] = rng.uniform(0.5, 4.0, (batch_size, g, 3))
    gt[..., 6] = rng.uniform(-np.pi, np.pi, (batch_size, g))
    gtc = rng.integers(1, len(cfg.class_names) + 1,
                       (batch_size, g)).astype(np.int32)
    gtv = np.ones((batch_size, g), bool)
    gtv[:, -1] = False
    return DetBatch(
        voxels=jnp.asarray(pts), voxel_coords=jnp.asarray(coords),
        voxel_num_points=jnp.asarray(num), voxel_valid=jnp.asarray(valid),
        gt_boxes=jnp.asarray(gt), gt_classes=jnp.asarray(gtc),
        gt_valid=jnp.asarray(gtv))


@pytest.mark.parametrize("name,cfg_fn", [
    ("SECOND", tiny_voxel_cfg),
    ("PointPillar", tiny_pillar_cfg),
])
def test_anchor_detector_train_and_predict(name, cfg_fn):
    cfg = cfg_fn(name)
    model = build_detector(name, cfg)
    batch = det_batch(cfg)

    @jax.jit
    def init_and_loss(rng, batch):
        variables = model.init(rng, batch, train=False)
        preds = model.apply(variables, batch, train=True,
                            mutable=["batch_stats"])[0]
        losses = model.loss(preds, batch)
        return variables, preds, losses

    variables, preds, losses = init_and_loss(jax.random.PRNGKey(0), batch)
    assert jnp.isfinite(losses["rpn_loss"])
    assert losses["rpn_loss_cls"] > 0 and losses["rpn_loss_loc"] >= 0

    # gradients flow to both heads and trunk
    def total(params):
        p = model.apply({"params": params,
                         "batch_stats": variables["batch_stats"]},
                        batch, train=True, mutable=["batch_stats"])[0]
        return model.loss(p, batch)["rpn_loss"]

    grads = jax.jit(jax.grad(total))(variables["params"])
    gnorm = jnp.sqrt(sum(jnp.sum(g ** 2)
                         for g in jax.tree_util.tree_leaves(grads)))
    assert jnp.isfinite(gnorm) and gnorm > 0

    out = jax.jit(lambda v, b: model.predict(model.apply(v, b, train=False)))(
        variables, batch)
    k = cfg.nms.nms_post_maxsize
    assert out["boxes"].shape == (1, k, 7)
    assert out["valid"].dtype == jnp.bool_


def test_centerpoint_train_and_predict():
    cfg = tiny_voxel_cfg("CenterPoint")
    model = build_detector("CenterPoint", cfg)
    batch = det_batch(cfg)

    @jax.jit
    def run(rng, batch):
        variables = model.init(rng, batch, train=False)
        preds = model.apply(variables, batch, train=True,
                            mutable=["batch_stats"])[0]
        return variables, model.loss(preds, batch)

    variables, losses = run(jax.random.PRNGKey(0), batch)
    assert jnp.isfinite(losses["center_loss"])
    assert losses["hm_loss"] > 0

    out = jax.jit(lambda v, b: model.predict(model.apply(v, b, train=False)))(
        variables, batch)
    assert out["boxes"].shape[0] == 1 and out["boxes"].shape[2] == 7

    # circle-NMS variant (center_head.py:277: NMS_TYPE == 'circle_nms'):
    # predict is a pure function of (preds, cfg), so reuse the eval preds
    import dataclasses as dc
    cfg2 = dc.replace(cfg, nms=dc.replace(cfg.nms, nms_type="circle_nms",
                                          nms_thresh=4.0))
    model2 = build_detector("CenterPoint", cfg2)
    preds = jax.jit(lambda v, b: model.apply(v, b, train=False))(variables,
                                                                 batch)
    out2 = jax.jit(model2.predict)(preds)
    assert out2["boxes"].shape == out["boxes"].shape
    # kept centers are pairwise farther than the squared-distance threshold
    xy = np.asarray(out2["boxes"][0, :, :2])
    vd = np.asarray(out2["valid"][0])
    kept = xy[vd]
    if len(kept) > 1:
        d2 = ((kept[:, None] - kept[None, :]) ** 2).sum(-1)
        d2[np.arange(len(kept)), np.arange(len(kept))] = np.inf
        assert d2.min() > 4.0


def test_registry_lists_detectors():
    names = available_detectors()
    for expect in ["SECOND", "PointPillar", "CenterPoint", "PillarNet"]:
        assert expect in names
