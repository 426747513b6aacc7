"""VoxelNeXt and PV-RCNN++ end-to-end smoke + unit pieces."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from tests.test_detection import det_batch, tiny_voxel_cfg


def test_sector_fps_covers_sectors():
    from multimodal_gar_tpu.detection.pv_rcnn_pp import sector_fps
    rng = np.random.default_rng(0)
    pts = rng.uniform(-10, 10, (256, 3)).astype(np.float32)
    kp = sector_fps(jnp.asarray(pts), jnp.ones(256, bool), 24, 6)
    assert kp.shape == (24, 3)
    ang = np.arctan2(np.asarray(kp)[:, 1], np.asarray(kp)[:, 0]) + np.pi
    sectors = (ang / (2 * np.pi / 6)).astype(int).clip(0, 5)
    # quota per sector respected: 4 keypoints in each
    assert (np.bincount(sectors, minlength=6) == 4).all()


def test_sample_points_with_roi_mask():
    from multimodal_gar_tpu.detection.pv_rcnn_pp import sample_points_with_roi
    pts = jnp.asarray([[0.0, 0.0, 0.0], [50.0, 50.0, 0.0]])
    rois = jnp.asarray([[0.0, 0.0, 0.0, 4.0, 2.0, 1.5, 0.0]])
    near = sample_points_with_roi(pts, jnp.ones(2, bool), rois,
                                  jnp.ones(1, bool), 1.6)
    assert bool(near[0]) and not bool(near[1])


def test_vector_pool_local_agg_shapes():
    from multimodal_gar_tpu.detection.pv_rcnn_pp import VectorPoolLocalAgg
    rng = np.random.default_rng(1)
    sup = jnp.asarray(rng.uniform(-2, 2, (64, 3)), jnp.float32)
    f = jnp.asarray(rng.normal(size=(64, 8)), jnp.float32)
    q = jnp.asarray(rng.uniform(-1, 1, (10, 3)), jnp.float32)
    mod = VectorPoolLocalAgg(16, 1.0, 2)
    v = mod.init(jax.random.PRNGKey(0), sup, f, jnp.ones(64, bool), q)
    out = mod.apply(v, sup, f, jnp.ones(64, bool), q)
    assert out.shape == (10, 16)
    assert bool(jnp.isfinite(out).all())


def test_downsample_active_set_reports_dropped_sites():
    """Fixed-size active-set derivation counts (does not hide) truncation."""
    from multimodal_gar_tpu.models.sparse_backbone import \
        _downsample_active_set
    rng = np.random.default_rng(3)
    in_shape = (8, 16, 16)
    m = 64
    coords = np.stack([rng.integers(0, s, m) for s in in_shape],
                      -1).astype(np.int32)
    valid = np.ones((m,), bool)
    out_shape = tuple((d + 2 * 1 - 3) // 2 + 1 for d in in_shape)

    # brute-force expected output active set (spconv SparseConv3d semantics)
    outs = set()
    for z, y, x in coords:
        for kz in range(3):
            for ky in range(3):
                for kx in range(3):
                    num = np.array([z, y, x]) + 1 - np.array([kz, ky, kx])
                    if (num % 2 == 0).all():
                        o = num // 2
                        if ((o >= 0) & (o < np.array(out_shape))).all():
                            outs.add(tuple(o))
    n_unique = len(outs)
    assert n_unique > 8

    for max_out, want_drop in [(n_unique + 8, 0), (n_unique - 5, 5)]:
        oc, ov, dropped = _downsample_active_set(
            jnp.asarray(coords)[None], jnp.asarray(valid)[None],
            in_shape, out_shape, 3, 2, 1, max_out)
        assert int(dropped[0]) == want_drop
        assert int(ov[0].sum()) == min(n_unique, max_out)


def test_voxelnext_train_and_predict():
    from multimodal_gar_tpu.detection.voxelnext import (VoxelNeXtConfig,
                                                        VoxelNeXtDetector)
    cfg = tiny_voxel_cfg("SECOND")
    model = VoxelNeXtDetector(cfg, VoxelNeXtConfig(
        channels=(8, 8, 16, 16, 16), out_channel=16, max_bev_voxels=64,
        max_boxes=16))
    batch = det_batch(cfg, m=48)

    @jax.jit
    def run(batch):
        variables = model.init(jax.random.PRNGKey(0), batch, train=False)
        preds, _ = model.apply(variables, batch, train=True,
                               mutable=["batch_stats"])
        return variables, preds

    variables, preds = run(batch)
    losses = model.loss(preds, batch)
    assert jnp.isfinite(losses["loss"]), losses
    assert losses["hm_loss"] > 0

    eval_preds, inter = jax.jit(lambda v, b: model.apply(
        v, b, train=False, mutable=["intermediates"]))(variables, batch)
    out = jax.jit(model.predict)(eval_preds)
    assert out["boxes"].shape == (1, 16, 7)

    # BEV conv_out truncation is observable (ADVICE r3: dropped sites are
    # scored locations in the reference — must not be silent)
    leaves = {"/".join(str(k) for k in path): v for path, v in
              jax.tree_util.tree_flatten_with_path(inter)[0]}
    drop_keys = [k for k in leaves if "conv_out" in k and "dropped" in k]
    assert drop_keys, list(leaves)
    # per-item counts, shape (B,): this tiny scene fits the cap
    assert int(jnp.asarray(leaves[drop_keys[0]]).sum()) == 0


def test_pvrcnn_pp_train_and_predict():
    from multimodal_gar_tpu.detection.post import NMSConfig
    from multimodal_gar_tpu.detection.pv_rcnn_pp import (PVPPConfig,
                                                         PVRCNNPlusPlusDetector)
    from multimodal_gar_tpu.detection.roi_detectors import RoIHeadConfig
    from multimodal_gar_tpu.detection.roi_heads import RoISamplerConfig

    cfg = tiny_voxel_cfg("SECOND")
    roi_cfg = RoIHeadConfig(
        shared_fc=(32,), cls_fc=(16,), reg_fc=(16,), grid_size=3,
        sampler=RoISamplerConfig(roi_per_image=8),
        train_nms=NMSConfig(nms_thresh=0.8, nms_pre_maxsize=32,
                            nms_post_maxsize=16, score_thresh=0.0),
        test_nms=NMSConfig(nms_thresh=0.7, nms_pre_maxsize=32,
                           nms_post_maxsize=8, score_thresh=0.0),
        pool_radii=(1.6,))
    pp = PVPPConfig(num_keypoints=36, num_sectors=6, vp_mlp=8,
                    num_output_features=16, vp_radii=(0.8,),
                    vsa_sources=(("x_conv4", 8, 2.4),))
    model = PVRCNNPlusPlusDetector(cfg, roi_cfg, pp)
    batch = det_batch(cfg, m=48)
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
    assert jnp.isfinite(losses["loss"]), losses

    eval_preds = jax.jit(lambda v, b: model.apply(v, b, train=False))(
        variables, batch)
    out = jax.jit(model.predict)(eval_preds)
    assert out["boxes"].shape[-1] == 7


def test_full_registry():
    from multimodal_gar_tpu.detection import available_detectors
    names = available_detectors()
    for expect in ["SECOND", "PointPillar", "CenterPoint", "PillarNet",
                   "VoxelRCNN-Det", "PVRCNN", "SECONDNetIoU", "PointRCNN",
                   "PartA2", "VoxelNeXt", "PVRCNNPlusPlus"]:
        assert expect in names, names
