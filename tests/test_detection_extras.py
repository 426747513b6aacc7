"""Extras: multi-head RPN, dynamic pillar VFE, FPN trunk, 2D sparse pillars,
focal sparse conv."""
import jax
import jax.numpy as jnp
import numpy as np

from multimodal_gar_tpu.detection.anchors import AnchorClassConfig
from multimodal_gar_tpu.detection.dense_heads import AnchorHeadConfig
from multimodal_gar_tpu.detection.extras import (AnchorHeadMulti,
                                                 BaseBEVBackboneV1,
                                                 DynamicPillarVFE,
                                                 FocalSparseConv,
                                                 PillarRes18Backbone)
from tests.test_detection_sparse import _tiny_sparse


def test_anchor_head_multi_loss_and_decode():
    anchors = (
        AnchorClassConfig("Car", ((3.9, 1.6, 1.56),), (0.0, 1.57), (-1.0,),
                          False, 2, 0.55, 0.4),
        AnchorClassConfig("Pedestrian", ((0.8, 0.6, 1.73),), (0.0, 1.57),
                          (-0.6,), False, 2, 0.5, 0.35),
        AnchorClassConfig("Cyclist", ((1.76, 0.6, 1.73),), (0.0, 1.57),
                          (-0.6,), False, 2, 0.5, 0.35),
    )
    class_names = ("Car", "Pedestrian", "Cyclist")
    model = AnchorHeadMulti(
        head_cfg=AnchorHeadConfig(num_class=1),
        class_groups=(("Car",), ("Pedestrian", "Cyclist")),
        anchors=anchors, grid_size=(16, 16),
        point_cloud_range=(0, -8, -2, 16, 8, 2), shared_channels=8)
    bev = jnp.zeros((1, 8, 8, 16))
    variables = model.init(jax.random.PRNGKey(0), bev)
    preds = model.apply(variables, bev)
    assert len(preds["heads"]) == 2

    gt = jnp.asarray([[[4.0, 0.0, -0.2, 3.9, 1.6, 1.56, 0.0],
                       [8.0, 2.0, 0.3, 0.8, 0.6, 1.73, 0.0]]])
    gtc = jnp.asarray([[1, 2]], jnp.int32)
    gtv = jnp.asarray([[True, True]])
    losses = model.loss(preds, gt, gtc, gtv, class_names)
    assert jnp.isfinite(losses["rpn_loss"])
    assert "head0_rpn_loss" in losses and "head1_rpn_loss" in losses

    cls, boxes = model.decode(preds, class_names)
    assert cls.shape[-1] == 3 and boxes.shape[-1] == 7
    # head 0 only scores Car: its Ped/Cyc slots stay at the -1e4 floor
    n0 = 8 * 8 * 2
    assert bool((cls[0, :n0, 1] <= -1e3).all())


def test_dynamic_pillar_vfe_matches_grid():
    rng = np.random.default_rng(0)
    pts = rng.uniform([0, -8, -2, 0], [16, 8, 2, 1],
                      size=(1, 256, 4)).astype(np.float32)
    model = DynamicPillarVFE(num_filters=(8,), voxel_size=(1.0, 1.0, 4.0),
                             point_cloud_range=(0, -8, -2, 16, 8, 2),
                             max_pillars=128)
    valid = jnp.ones((1, 256), bool)

    @jax.jit
    def run(rng_):
        v = model.init(rng_, jnp.asarray(pts), valid, train=False)
        return model.apply(v, jnp.asarray(pts), valid, train=False)

    feats, coords, uvalid = run(jax.random.PRNGKey(0))
    assert feats.shape == (1, 128, 8)
    n = int(uvalid.sum())
    # number of distinct occupied pillars on a 16x16 grid
    ix = np.floor(pts[0, :, 0]).astype(int)
    iy = np.floor(pts[0, :, 1] + 8).astype(int)
    expect = len(set(zip(ix.tolist(), iy.tolist())))
    assert n == min(expect, 128)
    # invalid slots zero
    assert bool((np.asarray(feats)[~np.asarray(uvalid)] == 0).all())


def test_base_bev_backbone_v1():
    model = BaseBEVBackboneV1(layer_nums=(1, 1), num_filters=(8, 16),
                              upsample_strides=(1, 2),
                              num_upsample_filters=(8, 8))
    m1 = jnp.zeros((1, 16, 16, 8))
    m2 = jnp.zeros((1, 8, 8, 16))
    v = model.init(jax.random.PRNGKey(0), [m1, m2], train=False)
    out = model.apply(v, [m1, m2], train=False)
    assert out.shape == (1, 16, 16, 16)


def test_pillar_res18_backbone():
    st = _tiny_sparse(c=8)
    st = st.replace(coords=st.coords.at[..., 0].set(
        jnp.where(st.valid, 0, -1)),
        spatial_shape=(1, 16, 16))
    model = PillarRes18Backbone(channels=(8, 16, 16, 32),
                                max_voxels_per_stage=(32, 32, 16, 8))

    @jax.jit
    def run(rng):
        v = model.init(rng, st, train=False)
        return model.apply(v, st, train=False)

    ms = run(jax.random.PRNGKey(0))
    assert ms["x_conv1"].features.shape[-1] == 8
    assert ms["x_conv4"].features.shape[-1] == 32
    assert ms["x_conv4"].spatial_shape == (1, 2, 2)


def test_focal_sparse_conv_topk():
    st = _tiny_sparse(c=8)
    model = FocalSparseConv(out_channels=8, top_k=8)

    @jax.jit
    def run(rng):
        v = model.init(rng, st, train=False)
        return model.apply(v, st, train=False)

    new, imp = run(jax.random.PRNGKey(0))
    assert new.features.shape[1] == 8
    assert imp.shape == st.valid.shape
    assert int(new.valid.sum()) <= 8
