"""CaDDN: depth binning, frustum-to-voxel sampling, end-to-end smoke."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_gar_tpu.detection.caddn import (CaDDNConfig, CaDDNDetector,
                                                bin_depths, frustum_to_voxel)
from tests.test_detection import det_batch, tiny_voxel_cfg


def test_bin_depths_modes():
    d = jnp.asarray([2.0, 10.0, 46.0])
    for mode in ["UD", "LID", "SID"]:
        idx = bin_depths(d, mode, 2.0, 46.8, 80, target=True)
        assert idx.shape == (3,)
        assert int(idx[0]) == 0
        assert 0 < int(idx[1]) < int(idx[2]) <= 80
    # out-of-range / non-finite depths land in the sky bin under target mode
    bad = jnp.asarray([jnp.inf, 100.0])
    idx = bin_depths(bad, "LID", 2.0, 46.8, 80, target=True)
    assert (np.asarray(idx) == 80).all()


def test_frustum_to_voxel_projects_known_voxel():
    """A frustum with a delta at one (u, v, depth-bin) lands in the voxel
    whose center projects there."""
    cfg = CaDDNConfig(num_depth_bins=8, depth_min=1.0, depth_max=17.0,
                      disc_mode="UD", downsample_factor=1)
    grid = (8, 8, 4)
    pc_range = (0.0, -4.0, -2.0, 16.0, 4.0, 2.0)
    # identity-ish calibration: camera == lidar axes permuted so that
    # x_lidar = depth. cam frame: x_c = -y_l, y_c = -z_l, z_c = x_l
    l2c = jnp.asarray([[0., -1., 0., 0.],
                       [0., 0., -1., 0.],
                       [1., 0., 0., 0.],
                       [0., 0., 0., 1.]])
    # pinhole: f=8, center (8, 8), image 16x16
    k = jnp.asarray([[8., 0., 8., 0.],
                     [0., 8., 8., 0.],
                     [0., 0., 1., 0.]])
    hf = wf = 16
    frustum = jnp.zeros((hf, wf, 8, 3))
    # voxel (ix=4, iy=4, iz=2): center x=9, y=1, z=0.25 (vs=(2,1,1))
    cx, cy, cz = 9.0, 1.0, 0.25
    u = 8 * (-cy) / cx + 8
    v = 8 * (-cz) / cx + 8
    db = (cx - 1.0) / 2.0        # UD bins of width 2
    frustum = frustum.at[int(round(v)), int(round(u)),
                         int(np.floor(db))].set(jnp.asarray([1., 2., 3.]))
    out = frustum_to_voxel(frustum, l2c, k, (16, 16), grid, pc_range, cfg)
    assert out.shape == (4, 8, 8, 3)
    # the target voxel received nonzero mass
    assert float(jnp.abs(out[2, 4, 4]).sum()) > 0.1


def test_caddn_train_and_predict():
    from multimodal_gar_tpu.detection.anchors import AnchorClassConfig
    base = tiny_voxel_cfg("SECOND")
    # CaDDN's BEV canvas is at voxel resolution (stride 1): use stride-2
    # anchors with a /2 BEV trunk, and a coarser z so nz*C stays small
    cfg = dataclasses.replace(
        base,
        voxel_size=(0.25, 0.25, 0.75),           # grid 64 x 64 x 4
        anchors=tuple(dataclasses.replace(a, feature_map_stride=2)
                      for a in base.anchors),
        bev_layer_nums=(1, 1), bev_layer_strides=(2, 2),
        bev_num_filters=(16, 32), bev_upsample_strides=(1, 2),
        bev_num_upsample_filters=(16, 16))
    cd = CaDDNConfig(ddn_arch="compact", num_depth_bins=8, depth_min=1.0,
                     depth_max=17.0, ddn_channels=(8, 16), channel_reduce=8,
                     bev_collapse_channels=16, downsample_factor=4)
    model = CaDDNDetector(cfg, cd)
    batch = det_batch(cfg, m=16)
    rng = np.random.default_rng(2)
    h, w = 32, 64
    l2c = np.broadcast_to(np.asarray(
        [[0., -1., 0., 0.], [0., 0., -1., 0.],
         [1., 0., 0., 0.], [0., 0., 0., 1.]], np.float32), (1, 4, 4))
    k = np.broadcast_to(np.asarray(
        [[30., 0., 32., 0.], [0., 30., 16., 0.], [0., 0., 1., 0.]],
        np.float32), (1, 3, 4))
    batch = batch.replace(
        images=jnp.asarray(rng.normal(size=(1, h, w, 3)), jnp.float32),
        lidar_to_cam=jnp.asarray(l2c), cam_to_img=jnp.asarray(k),
        depth_maps=jnp.asarray(rng.uniform(1, 17, (1, h, w)), jnp.float32))

    @jax.jit
    def run(batch):
        variables = model.init(jax.random.PRNGKey(0), batch, train=False)
        preds, _ = model.apply(variables, batch, train=True,
                               mutable=["batch_stats"])
        return variables, preds

    variables, preds = run(batch)
    losses = model.loss(preds, batch)
    assert jnp.isfinite(losses["loss"]), losses
    assert "ddn_loss" in losses and jnp.isfinite(losses["ddn_loss"])

    eval_preds = jax.jit(lambda v, b: model.apply(v, b, train=False))(
        variables, batch)
    out = jax.jit(model.predict)(eval_preds)
    assert out["boxes"].shape[-1] == 7


def test_deeplabv3_ddn_contract():
    """DeepLabV3 DDN (ddn_deeplab.py): layer1-resolution features (256 ch,
    stride 4) + upsampled depth logits, torchvision trunk structure."""
    from multimodal_gar_tpu.detection.ddn_deeplab import DeepLabV3DDN

    model = DeepLabV3DDN(num_classes=9, backbone_name="ResNet50")
    x = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (1, 32, 64, 3)),
                    jnp.float32)

    @jax.jit
    def run(x):
        variables = model.init(jax.random.PRNGKey(0), x, train=False)
        return variables, model.apply(variables, x, train=False)

    variables, (feats, logits) = run(x)
    assert feats.shape == (1, 8, 16, 256)          # stride 4, layer1 width
    assert logits.shape == (1, 8, 16, 9)           # resized to feat shape
    assert bool(jnp.isfinite(feats).all()) and bool(
        jnp.isfinite(logits).all())

    params = variables["params"]["backbone"]
    # torchvision resnet50 stage depths [3, 4, 6, 3]
    for li, n in zip(range(1, 5), (3, 4, 6, 3)):
        rows = [k for k in params if k.startswith(f"layer{li}_")]
        assert len(rows) == n, (li, rows)
    # output stride 8: layer3/4 first blocks keep stride 1 (dilated)
    aspp = variables["params"]["aspp"]
    assert aspp["b1_conv"]["kernel"].shape == (3, 3, 2048, 256)
