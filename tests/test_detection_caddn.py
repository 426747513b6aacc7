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


def test_deeplabv3_ddn_matches_torchvision():
    """Golden parity: our DeepLabV3DDN == an independently wired torch
    replica of torchvision's deeplabv3_resnet50 (the exact model the
    reference constructs, ddn_deeplabv3.py) on a fabricated torchvision-
    style state dict — validates BOTH the architecture and the
    load_torchvision_deeplab converter mapping."""
    import torch
    import torch.nn.functional as F
    from multimodal_gar_tpu.detection.ddn_deeplab import (
        DeepLabV3DDN, load_torchvision_deeplab)

    rng = np.random.default_rng(0)
    sd = {}

    def add_conv(prefix, cout, cin, k):
        sd[f"{prefix}.weight"] = torch.tensor(
            (rng.normal(size=(cout, cin, k, k)) * 0.05).astype(np.float32))

    def add_bn(prefix, c):
        sd[f"{prefix}.weight"] = torch.tensor(
            rng.uniform(0.5, 1.5, c).astype(np.float32))
        sd[f"{prefix}.bias"] = torch.tensor(
            rng.normal(0, 0.1, c).astype(np.float32))
        sd[f"{prefix}.running_mean"] = torch.tensor(
            rng.normal(0, 0.1, c).astype(np.float32))
        sd[f"{prefix}.running_var"] = torch.tensor(
            rng.uniform(0.5, 1.5, c).astype(np.float32))

    add_conv("backbone.conv1", 64, 3, 7)
    add_bn("backbone.bn1", 64)
    layers = {1: (3, 64, 64), 2: (4, 128, 256), 3: (6, 256, 512),
              4: (3, 512, 1024)}
    for li, (blocks, planes, cin0) in layers.items():
        cin = cin0
        for bi in range(blocks):
            p = f"backbone.layer{li}.{bi}"
            add_conv(f"{p}.conv1", planes, cin, 1)
            add_bn(f"{p}.bn1", planes)
            add_conv(f"{p}.conv2", planes, planes, 3)
            add_bn(f"{p}.bn2", planes)
            add_conv(f"{p}.conv3", planes * 4, planes, 1)
            add_bn(f"{p}.bn3", planes * 4)
            if bi == 0:
                add_conv(f"{p}.downsample.0", planes * 4, cin, 1)
                add_bn(f"{p}.downsample.1", planes * 4)
            cin = planes * 4
    add_conv("classifier.0.convs.0.0", 256, 2048, 1)
    add_bn("classifier.0.convs.0.1", 256)
    for i in (1, 2, 3):
        add_conv(f"classifier.0.convs.{i}.0", 256, 2048, 3)
        add_bn(f"classifier.0.convs.{i}.1", 256)
    add_conv("classifier.0.convs.4.1", 256, 2048, 1)
    add_bn("classifier.0.convs.4.2", 256)
    add_conv("classifier.0.project.0", 256, 1280, 1)
    add_bn("classifier.0.project.1", 256)
    add_conv("classifier.1", 256, 256, 3)
    add_bn("classifier.2", 256)
    add_conv("classifier.4", 9, 256, 1)
    sd["classifier.4.bias"] = torch.tensor(
        rng.normal(0, 0.1, 9).astype(np.float32))

    def bn(x, p):
        sh = (1, -1, 1, 1)
        return (x - sd[f"{p}.running_mean"].view(sh)) \
            / torch.sqrt(sd[f"{p}.running_var"].view(sh) + 1e-5) \
            * sd[f"{p}.weight"].view(sh) + sd[f"{p}.bias"].view(sh)

    def bottleneck(x, p, stride, dil, down):
        y = torch.relu(bn(F.conv2d(x, sd[f"{p}.conv1.weight"]), f"{p}.bn1"))
        y = torch.relu(bn(F.conv2d(y, sd[f"{p}.conv2.weight"], stride=stride,
                                   padding=dil, dilation=dil), f"{p}.bn2"))
        y = bn(F.conv2d(y, sd[f"{p}.conv3.weight"]), f"{p}.bn3")
        if down:
            x = bn(F.conv2d(x, sd[f"{p}.downsample.0.weight"],
                            stride=stride), f"{p}.downsample.1")
        return torch.relu(x + y)

    def torch_forward(xn):
        t = torch.tensor(np.transpose(xn, (0, 3, 1, 2)))
        t = torch.relu(bn(F.conv2d(t, sd["backbone.conv1.weight"], stride=2,
                                   padding=3), "backbone.bn1"))
        t = F.max_pool2d(t, 3, 2, padding=1)
        # torchvision replace_stride_with_dilation=[False, True, True]
        stage = {1: (1, 1, 1), 2: (2, 1, 1), 3: (1, 1, 2), 4: (1, 2, 4)}
        feats = None
        for li, (blocks, _, _) in layers.items():
            stride, d_first, d_rest = stage[li]
            for bi in range(blocks):
                t = bottleneck(t, f"backbone.layer{li}.{bi}",
                               stride if bi == 0 else 1,
                               d_first if bi == 0 else d_rest, bi == 0)
            if li == 1:
                feats = t
        # ASPP
        br = [torch.relu(bn(F.conv2d(t, sd["classifier.0.convs.0.0.weight"]),
                            "classifier.0.convs.0.1"))]
        for i, r in zip((1, 2, 3), (12, 24, 36)):
            br.append(torch.relu(bn(
                F.conv2d(t, sd[f"classifier.0.convs.{i}.0.weight"],
                         padding=r, dilation=r),
                f"classifier.0.convs.{i}.1")))
        g = t.mean((2, 3), keepdim=True)
        g = torch.relu(bn(F.conv2d(g, sd["classifier.0.convs.4.1.weight"]),
                          "classifier.0.convs.4.2"))
        br.append(g.expand_as(br[0]))
        y = torch.cat(br, 1)
        y = torch.relu(bn(F.conv2d(y, sd["classifier.0.project.0.weight"]),
                          "classifier.0.project.1"))
        y = torch.relu(bn(F.conv2d(y, sd["classifier.1.weight"], padding=1),
                          "classifier.2"))
        y = F.conv2d(y, sd["classifier.4.weight"],
                     bias=sd["classifier.4.bias"])
        y = F.interpolate(y, size=feats.shape[-2:], mode="bilinear",
                          align_corners=False)
        return feats, y

    model = DeepLabV3DDN(num_classes=9, backbone_name="ResNet50")
    x = rng.uniform(0.05, 0.95, (1, 40, 56, 3)).astype(np.float32)
    variables = jax.jit(lambda xx: model.init(
        jax.random.PRNGKey(0), xx, train=False))(jnp.asarray(x))
    variables = load_torchvision_deeplab(variables, sd)
    feats, logits = jax.jit(lambda v, xx: model.apply(
        v, xx, train=False))(variables, jnp.asarray(x))

    mean = np.array([0.485, 0.456, 0.406], np.float32)
    std = np.array([0.229, 0.224, 0.225], np.float32)
    with torch.no_grad():
        ref_feats, ref_logits = torch_forward((x - mean) / std)
    ref_feats = np.transpose(ref_feats.numpy(), (0, 2, 3, 1))
    ref_logits = np.transpose(ref_logits.numpy(), (0, 2, 3, 1))

    np.testing.assert_allclose(np.asarray(feats), ref_feats,
                               atol=2e-3, rtol=2e-3)
    np.testing.assert_allclose(np.asarray(logits), ref_logits,
                               atol=5e-3, rtol=5e-3)
