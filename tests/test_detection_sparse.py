"""Sparse backbones (residual, UNet) and PartA2 end-to-end."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_gar_tpu.detection.sparse_backbones import (SparseBasicBlock,
                                                           SparseInverseConv3d,
                                                           UNetV2,
                                                           VoxelResBackbone8x)
from multimodal_gar_tpu.models.sparse_backbone import SparseTensor
from tests.test_detection import det_batch, tiny_voxel_cfg


def _tiny_sparse(seed=0, m=32, c=4):
    rng = np.random.default_rng(seed)
    shape = (9, 16, 16)
    coords = np.stack([rng.integers(0, s, m) for s in shape], -1)
    # dedupe
    keys = (coords[:, 0] * shape[1] + coords[:, 1]) * shape[2] + coords[:, 2]
    _, first = np.unique(keys, return_index=True)
    valid = np.zeros(m, bool)
    valid[first] = True
    order = np.argsort(~valid, kind="stable")
    coords, valid = coords[order], valid[order]
    coords[~valid] = -1
    feats = rng.normal(size=(m, c)).astype(np.float32) * valid[:, None]
    return SparseTensor(
        features=jnp.asarray(feats)[None], coords=jnp.asarray(
            coords.astype(np.int32))[None],
        valid=jnp.asarray(valid)[None], spatial_shape=shape)


def test_sparse_basic_block_residual_and_mask():
    st = _tiny_sparse(c=8)
    model = SparseBasicBlock(8)

    @jax.jit
    def run(rng):
        v = model.init(rng, st, train=False)
        return model.apply(v, st, train=False)

    out = run(jax.random.PRNGKey(0))
    assert out.features.shape == st.features.shape
    assert bool((out.features[~out.valid] == 0).all())
    assert bool(jnp.isfinite(out.features).all())


def test_inverse_conv_targets_fine_set():
    """Down-then-inverse round trip lands on the original active set."""
    from multimodal_gar_tpu.models.sparse_backbone import SparseConv3dDown
    st = _tiny_sparse(c=4)

    down = SparseConv3dDown(8, stride=2, padding=1, max_out_voxels=32)
    inv = SparseInverseConv3d(4, stride=2, padding=1)

    @jax.jit
    def run(rng):
        dv = down.init(rng, st)
        coarse = down.apply(dv, st)
        iv = inv.init(rng, coarse, st.coords, st.valid, st.spatial_shape)
        fine = inv.apply(iv, coarse, st.coords, st.valid, st.spatial_shape)
        return coarse, fine

    coarse, fine = run(jax.random.PRNGKey(0))
    assert fine.features.shape[1] == st.features.shape[1]
    np.testing.assert_array_equal(np.asarray(fine.coords),
                                  np.asarray(st.coords))
    # every valid fine voxel has at least one coarse neighbor -> nonzero
    f = np.asarray(fine.features)[np.asarray(fine.valid)]
    assert np.isfinite(f).all()
    assert (np.abs(f).sum(-1) > 0).any()


def test_voxel_res_backbone_shapes():
    st = _tiny_sparse(c=4)
    model = VoxelResBackbone8x(max_voxels_per_stage=(32, 16, 8, 8))

    @jax.jit
    def run(rng):
        v = model.init(rng, st, train=False)
        return model.apply(v, st, train=False)

    ms = run(jax.random.PRNGKey(0))
    assert ms["x_conv1"].features.shape[-1] == 16
    assert ms["x_conv2"].features.shape[-1] == 32
    assert ms["x_conv3"].features.shape[-1] == 64
    assert ms["x_conv4"].features.shape[-1] == 128


def test_unet_decoder_returns_stride1_features():
    st = _tiny_sparse(c=4)
    model = UNetV2(max_voxels_per_stage=(32, 16, 8, 8))

    @jax.jit
    def run(rng):
        v = model.init(rng, st, train=False)
        return model.apply(v, st, train=False)

    x_up1, ms = run(jax.random.PRNGKey(0))
    # decoder output lives on the stride-1 active set with 16 channels
    np.testing.assert_array_equal(np.asarray(x_up1.coords),
                                  np.asarray(st.coords))
    assert x_up1.features.shape[-1] == 16
    assert bool(jnp.isfinite(x_up1.features).all())


def test_parta2_train_and_predict():
    from multimodal_gar_tpu.detection.parta2 import (PartA2Config,
                                                     PartA2Detector)
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
    model = PartA2Detector(cfg, roi_cfg,
                           PartA2Config(pool_size=4,
                                        part_conv_channels=(8,),
                                        seg_conv_channels=(8,)))
    batch = det_batch(cfg, m=48)

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
    for k in ["rpn_loss", "point_loss_seg", "point_loss_part", "loss"]:
        assert jnp.isfinite(losses[k]), (k, losses[k])

    eval_preds = jax.jit(lambda v, b: model.apply(v, b, train=False))(
        variables, batch)
    out = jax.jit(model.predict)(eval_preds)
    assert out["boxes"].shape[-1] == 7
