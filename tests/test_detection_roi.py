"""Two-stage detectors: RoI sampling, canonical targets, end-to-end smoke."""
import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_gar_tpu.detection import build_detector
from multimodal_gar_tpu.detection.box_coders import ResidualCoder
from multimodal_gar_tpu.detection.post import NMSConfig
from multimodal_gar_tpu.detection.roi_detectors import RoIHeadConfig
from multimodal_gar_tpu.detection.roi_heads import (RoISamplerConfig,
                                                    canonical_gt_transform,
                                                    decode_roi_boxes,
                                                    roi_grid_points,
                                                    sample_rois_for_rcnn)
from tests.test_detection import det_batch, tiny_voxel_cfg


# ---------------------------------------------------------------------------
# sampler + canonical transform units
# ---------------------------------------------------------------------------

def test_sample_rois_balances_fg_bg():
    cfg = RoISamplerConfig(roi_per_image=8, fg_ratio=0.5)
    n = 32
    rng = np.random.default_rng(0)
    gt = jnp.asarray([[10.0, 10.0, 0.0, 4.0, 2.0, 1.5, 0.0]])
    # half the rois sit exactly on the GT (fg), half far away (easy bg)
    rois = np.tile([50.0, 50.0, 0.0, 4.0, 2.0, 1.5, 0.0], (n, 1))
    rois[:16] = [10.0, 10.0, 0.0, 4.0, 2.0, 1.5, 0.0]
    out = sample_rois_for_rcnn(
        jax.random.PRNGKey(0), cfg, jnp.asarray(rois, jnp.float32),
        jnp.ones((n,)), jnp.ones((n,), jnp.int32), jnp.ones((n,), bool),
        gt, jnp.asarray([1], jnp.int32), jnp.asarray([True]))
    ious = np.asarray(out["gt_iou_of_rois"])
    # quota: 4 fg (iou 1.0) + 4 bg (iou 0.0)
    assert (ious > 0.9).sum() == 4, ious
    assert (ious < 0.1).sum() == 4, ious
    assert bool(out["roi_valid"].all())
    # roi_iou soft labels: fg -> 1, easy bg -> 0
    labels = np.asarray(out["rcnn_cls_labels"])
    assert np.allclose(np.sort(labels), [0, 0, 0, 0, 1, 1, 1, 1])


def test_sample_rois_no_fg_degrades_to_bg():
    cfg = RoISamplerConfig(roi_per_image=4)
    n = 8
    rois = np.tile([50.0, 50.0, 0.0, 4.0, 2.0, 1.5, 0.0], (n, 1))
    gt = jnp.asarray([[10.0, 10.0, 0.0, 4.0, 2.0, 1.5, 0.0]])
    out = sample_rois_for_rcnn(
        jax.random.PRNGKey(1), cfg, jnp.asarray(rois, jnp.float32),
        jnp.ones((n,)), jnp.ones((n,), jnp.int32), jnp.ones((n,), bool),
        gt, jnp.asarray([1], jnp.int32), jnp.asarray([True]))
    assert bool(out["roi_valid"].all())
    assert np.asarray(out["reg_valid_mask"]).sum() == 0


def test_canonical_transform_identity_roi():
    """GT == RoI -> canonical residual is the zero box at the origin."""
    roi = jnp.asarray([[5.0, -3.0, 1.0, 4.0, 2.0, 1.5, 0.7]])
    ct = canonical_gt_transform(roi, roi)
    np.testing.assert_allclose(ct[0, :3], 0.0, atol=1e-6)
    np.testing.assert_allclose(ct[0, 6], 0.0, atol=1e-6)
    np.testing.assert_allclose(ct[0, 3:6], roi[0, 3:6], atol=1e-6)


def test_canonical_transform_heading_flip():
    """Opposite-facing GT flips into (-pi/2, pi/2)."""
    roi = jnp.asarray([[0.0, 0.0, 0.0, 4.0, 2.0, 1.5, 0.0]])
    gt = roi.at[0, 6].set(jnp.pi - 0.1)     # nearly opposite
    ct = canonical_gt_transform(roi, gt)
    assert abs(float(ct[0, 6])) <= np.pi / 2 + 1e-6


def test_decode_roi_boxes_inverts_canonical_encode():
    coder = ResidualCoder()
    rois = jnp.asarray([[5.0, -3.0, 1.0, 4.0, 2.0, 1.5, 0.7]])
    gt = jnp.asarray([[5.5, -2.5, 1.2, 4.4, 1.8, 1.6, 0.9]])
    ct = canonical_gt_transform(rois, gt)
    rois_anchor = rois.at[:, 0:3].set(0.0).at[:, 6].set(0.0)
    enc = coder.encode(ct, rois_anchor)
    dec = decode_roi_boxes(coder, enc, rois)
    np.testing.assert_allclose(dec[0, :6], gt[0, :6], atol=1e-4)
    # heading equal modulo pi (canonical flip can change it by pi)
    dh = abs(float(dec[0, 6] - gt[0, 6]))
    assert min(dh % np.pi, np.pi - dh % np.pi) < 1e-4


def test_roi_grid_points_inside_box():
    rois = jnp.asarray([[2.0, 3.0, -1.0, 4.0, 2.0, 1.0, 0.5]])
    pts = roi_grid_points(rois, 4)
    assert pts.shape == (1, 64, 3)
    # all grid points inside the (enlarged-by-eps) box
    from multimodal_gar_tpu.ops.boxes3d import points_in_boxes
    inside = points_in_boxes(pts[0], rois * jnp.asarray([1, 1, 1, 1.001,
                                                         1.001, 1.001, 1]))
    assert bool(inside[:, 0].all())


# ---------------------------------------------------------------------------
# end-to-end two-stage smoke
# ---------------------------------------------------------------------------

def _tiny_roi_cfg():
    return RoIHeadConfig(
        shared_fc=(32, 32), cls_fc=(16,), reg_fc=(16,), grid_size=3,
        sampler=RoISamplerConfig(roi_per_image=16),
        train_nms=NMSConfig(nms_thresh=0.8, nms_pre_maxsize=32,
                            nms_post_maxsize=24, score_thresh=0.0),
        test_nms=NMSConfig(nms_thresh=0.7, nms_pre_maxsize=32,
                           nms_post_maxsize=16, score_thresh=0.0),
        pool_radii=(0.8,), pool_nsamples=(8,), pool_mlps=((16, 16),),
        bev_grid_size=3)


@pytest.mark.parametrize("name", ["VoxelRCNN-Det", "SECONDNetIoU"])
def test_two_stage_detector_train_and_predict(name):
    from multimodal_gar_tpu.detection.roi_detectors import (
        SECONDIoUDetector, VoxelRCNNDetector)
    cfg = tiny_voxel_cfg(name="SECOND")
    roi_cfg = _tiny_roi_cfg()
    model = VoxelRCNNDetector(cfg, roi_cfg) if name == "VoxelRCNN-Det" \
        else SECONDIoUDetector(cfg, dataclasses.replace(
            roi_cfg, use_corner_loss=False))
    batch = det_batch(cfg)

    @jax.jit
    def run(rng, batch):
        variables = model.init(
            {"params": rng, "sampler": jax.random.PRNGKey(7)},
            batch, train=True)
        preds, _ = model.apply(variables, batch, train=True,
                               mutable=["batch_stats"],
                               rngs={"sampler": jax.random.PRNGKey(8),
                                     "dropout": jax.random.PRNGKey(9)})
        return variables, preds

    variables, preds = run(jax.random.PRNGKey(0), batch)
    losses = model.loss(preds, batch)
    assert jnp.isfinite(losses["loss"]), losses
    assert "rpn_loss" in losses

    eval_preds = jax.jit(lambda v, b: model.apply(v, b, train=False))(
        variables, batch)
    out = jax.jit(model.predict)(eval_preds)
    assert out["boxes"].shape[-1] == 7
    assert out["valid"].dtype == jnp.bool_


def test_pvrcnn_train_smoke():
    from multimodal_gar_tpu.detection.pfe import SALayerConfig, VSAConfig
    from multimodal_gar_tpu.detection.roi_detectors import PVRCNNDetector
    cfg = tiny_voxel_cfg("SECOND")
    vsa = VSAConfig(
        num_keypoints=64, num_output_features=32,
        sa_layers=(
            SALayerConfig("raw_points", 1, (0.8,), (8,), ((16, 16),)),
            SALayerConfig("x_conv3", 4, (1.6,), (8,), ((16, 16),)),
        ),
        use_bev=True, bev_stride=8)
    model = PVRCNNDetector(cfg, _tiny_roi_cfg(), vsa)
    batch = det_batch(cfg)
    rng = np.random.default_rng(3)
    pts = rng.uniform(low=[0, -8, -1.5, 0], high=[16, 8, 1.5, 1],
                      size=(1, 256, 4)).astype(np.float32)
    batch = batch.replace(points=jnp.asarray(pts),
                          point_valid=jnp.ones((1, 256), bool))

    @jax.jit
    def run(batch):
        variables = model.init(
            {"params": jax.random.PRNGKey(0),
             "sampler": jax.random.PRNGKey(7)}, batch, train=True)
        preds, _ = model.apply(variables, batch, train=True,
                               mutable=["batch_stats"],
                               rngs={"sampler": jax.random.PRNGKey(8),
                                     "dropout": jax.random.PRNGKey(9)})
        return variables, preds

    variables, preds = run(batch)
    losses = model.loss(preds, batch)
    assert jnp.isfinite(losses["loss"])
    assert "point_loss_cls" in losses

    eval_preds = jax.jit(lambda v, b: model.apply(v, b, train=False))(
        variables, batch)
    out = jax.jit(model.predict)(eval_preds)
    assert out["boxes"].shape[-1] == 7


def test_post_processing_label_override():
    """has_class_labels path: RoI labels ride through NMS selection
    (the rcnn score is class-agnostic, so argmax-derived labels would
    collapse every detection to class 1)."""
    import jax.numpy as jnp

    from multimodal_gar_tpu.detection.post import NMSConfig, post_processing

    boxes = jnp.asarray([[[0, 0, 0, 4, 2, 1.5, 0.0],
                          [20, 0, 0, 0.8, 0.8, 1.7, 0.0],
                          [40, 0, 0, 1.8, 0.6, 1.7, 0.0]]], jnp.float32)
    scores = jnp.asarray([[0.9, 0.8, 0.7]])[..., None]
    labels = jnp.asarray([[1, 2, 3]], jnp.int32)
    out = post_processing(scores, boxes, NMSConfig(nms_post_maxsize=3,
                                                   score_thresh=0.1),
                          cls_preds_normalized=True, labels=labels)
    got = sorted(int(x) for x in out["labels"][0] if int(x) > 0)
    assert got == [1, 2, 3]
