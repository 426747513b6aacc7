"""Point-based stack: PointNet2 backbone, point heads, PointRCNN detector."""
import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_gar_tpu.detection.point_heads import (PointHeadConfig,
                                                      assign_point_targets)
from multimodal_gar_tpu.detection.pointnet2 import (PointNet2Config,
                                                    PointNet2MSG)
from tests.test_detection import det_batch, tiny_voxel_cfg


def _tiny_pn2():
    return PointNet2Config(
        npoints=(64, 16),
        radii=((0.5,), (1.0,)),
        nsamples=((8,), (8,)),
        sa_mlps=(((16, 16),), ((32, 32),)),
        fp_mlps=((32, 32), (32, 32)))


def test_pointnet2_backbone_shapes_and_grads():
    cfg = _tiny_pn2()
    model = PointNet2MSG(cfg)
    rng = np.random.default_rng(0)
    pts = jnp.asarray(rng.uniform(-5, 5, (2, 128, 4)), jnp.float32)
    valid = jnp.ones((2, 128), bool).at[1, 100:].set(False)

    @jax.jit
    def run(rng):
        variables = model.init(rng, pts, valid, train=False)
        out = model.apply(variables, pts, valid, train=False)
        return variables, out

    variables, out = run(jax.random.PRNGKey(0))
    assert out.shape == (2, 128, 32)
    assert bool(jnp.isfinite(out).all())
    # invalid points produce zero features
    assert bool((out[1, 100:] == 0).all())


def test_assign_point_targets_labels():
    gt = jnp.asarray([[0.0, 0.0, 0.0, 4.0, 4.0, 2.0, 0.0]])
    pts = jnp.asarray([[0.0, 0.0, 0.0],          # inside
                       [2.05, 0.0, 0.0],         # in the ignore ring
                       [10.0, 10.0, 10.0]])      # outside
    labels, gt_of, _ = assign_point_targets(
        pts, jnp.ones(3, bool), gt, jnp.asarray([2]), jnp.asarray([True]),
        extra_width=(0.2, 0.2, 0.2))
    assert int(labels[0]) == 2
    assert int(labels[1]) == -1
    assert int(labels[2]) == 0
    np.testing.assert_allclose(gt_of[0], gt[0])


def test_pointrcnn_train_and_predict():
    from multimodal_gar_tpu.detection.point_rcnn import (PointRCNNDetector,
                                                         PointRCNNRoIConfig)
    from multimodal_gar_tpu.detection.post import NMSConfig
    from multimodal_gar_tpu.detection.roi_detectors import RoIHeadConfig
    from multimodal_gar_tpu.detection.roi_heads import RoISamplerConfig

    cfg = tiny_voxel_cfg("SECOND")
    roi_cfg = RoIHeadConfig(
        shared_fc=(32,), cls_fc=(16,), reg_fc=(16,),
        sampler=RoISamplerConfig(roi_per_image=8),
        train_nms=NMSConfig(nms_thresh=0.8, nms_pre_maxsize=32,
                            nms_post_maxsize=16, score_thresh=0.0),
        test_nms=NMSConfig(nms_thresh=0.7, nms_pre_maxsize=32,
                           nms_post_maxsize=8, score_thresh=0.0))
    pool_cfg = PointRCNNRoIConfig(
        num_sampled_points=32, xyz_up_layer=(16,),
        sa_npoints=(16, -1), sa_radii=(0.4, 100.0), sa_nsamples=(8, 8),
        sa_mlps=((16, 16), (16, 32)))
    model = PointRCNNDetector(cfg, roi_cfg, _tiny_pn2(), pool_cfg)

    batch = det_batch(cfg)
    rng = np.random.default_rng(5)
    pts = rng.uniform(low=[0, -8, -1.5, 0], high=[16, 8, 1.5, 1],
                      size=(1, 128, 4)).astype(np.float32)
    batch = batch.replace(points=jnp.asarray(pts),
                          point_valid=jnp.ones((1, 128), bool))

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
    for k in ["point_loss_cls", "point_loss_box", "rcnn_loss_cls", "loss"]:
        assert jnp.isfinite(losses[k]), (k, losses[k])

    eval_preds = jax.jit(lambda v, b: model.apply(v, b, train=False))(
        variables, batch)
    out = jax.jit(model.predict)(eval_preds)
    assert out["boxes"].shape[-1] == 7
