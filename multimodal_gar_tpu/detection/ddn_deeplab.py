"""DeepLabV3 + ResNet depth-distribution network for CaDDN.

Capability parity with the reference's DDNDeepLabV3
(pcdet/models/backbones_3d/vfe/image_vfe_modules/ffn/ddn/ddn_deeplabv3.py +
ddn_template.py:107-142, constructed from
torchvision.models.segmentation.deeplabv3_resnet{50,101}):

  - torchvision ResNet v1 trunk: 7x7/2 stem + 3x3/2 maxpool, bottleneck
    stages [3, 4, {6|23}, 3] with ``replace_stride_with_dilation =
    [False, True, True]`` (layer3 dilation 2, layer4 dilation 4 -> output
    stride 8), as deeplabv3_resnet* builds it;
  - the DDN feature tap is ``layer1`` (CaDDN's FEAT_EXTRACT_LAYER,
    tools/cfgs/kitti_models/CaDDN.yaml): stride-4, 256-channel features;
  - the classifier is DeepLabHead = ASPP(rates 12/24/36 + image pooling,
    256 ch) -> 3x3 conv 256 + BN + ReLU -> 1x1 conv to num_classes
    (= depth bins + 1), bilinearly upsampled to the layer1 feature shape
    (ddn_template.py:128-132, align_corners=False).

TPU-native notes: NHWC layout throughout; the ASPP global-pooling branch
broadcasts instead of resizing a 1x1 map; bilinear upsampling is
jax.image.resize (linear, matching align_corners=False semantics).
"""
from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

RESNET_LAYERS = {"ResNet50": (3, 4, 6, 3), "ResNet101": (3, 4, 23, 3)}


class Bottleneck(nn.Module):
    """torchvision Bottleneck: 1x1 -> 3x3 (stride/dilation) -> 1x1 x4."""
    planes: int
    stride: int = 1
    dilation: int = 1
    downsample: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        bn = lambda name: nn.BatchNorm(use_running_average=not train,
                                       momentum=0.9, epsilon=1e-5, name=name)
        y = nn.Conv(self.planes, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv1")(x)
        y = nn.relu(bn("bn1")(y))
        y = nn.Conv(self.planes, (3, 3), strides=(self.stride, self.stride),
                    kernel_dilation=(self.dilation, self.dilation),
                    padding=((self.dilation, self.dilation),
                             (self.dilation, self.dilation)),
                    use_bias=False, dtype=self.dtype, name="conv2")(y)
        y = nn.relu(bn("bn2")(y))
        y = nn.Conv(self.planes * 4, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv3")(y)
        y = bn("bn3")(y)
        if self.downsample:
            x = nn.Conv(self.planes * 4, (1, 1),
                        strides=(self.stride, self.stride), use_bias=False,
                        dtype=self.dtype, name="down_conv")(x)
            x = bn("down_bn")(x)
        return nn.relu(x + y)


class ResNetDeepLabTrunk(nn.Module):
    """ResNet v1 trunk with output stride 8 (dilated layer3/layer4).

    Returns (layer1_features, layer4_features): the DDN feature tap and the
    ASPP input (ddn_template.py return_layers {'layer1': 'features',
    'layer4': 'out'}).
    """
    layers: Tuple[int, int, int, int]
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False):
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)),
                    use_bias=False, dtype=self.dtype, name="conv1")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, name="bn1")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        feats_l1 = None
        # (planes, stride, dilation) per stage; strides replaced by dilation
        # in layers 3/4 (torchvision replace_stride_with_dilation[1:] = True)
        specs = [(64, 1, 1), (128, 2, 1), (256, 1, 2), (512, 1, 4)]
        for li, ((planes, stride, dil), blocks) in enumerate(
                zip(specs, self.layers), start=1):
            for bi in range(blocks):
                first = bi == 0
                # torchvision: the first block of a dilated stage uses the
                # PREVIOUS dilation for its 3x3 (dilation grows after)
                d = max(dil // (2 if first and dil > 1 else 1), 1)
                x = Bottleneck(planes, stride=stride if first else 1,
                               dilation=d, downsample=first,
                               dtype=self.dtype,
                               name=f"layer{li}_{bi}")(x, train)
            if li == 1:
                feats_l1 = x
        return feats_l1, x


class ASPP(nn.Module):
    """Atrous spatial pyramid pooling (DeepLabV3), rates 12/24/36."""
    out_channels: int = 256
    rates: Sequence[int] = (12, 24, 36)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        bn = lambda name: nn.BatchNorm(use_running_average=not train,
                                       momentum=0.9, epsilon=1e-5, name=name)
        branches = []
        y = nn.Conv(self.out_channels, (1, 1), use_bias=False,
                    dtype=self.dtype, name="b0_conv")(x)
        branches.append(nn.relu(bn("b0_bn")(y)))
        for i, r in enumerate(self.rates, start=1):
            y = nn.Conv(self.out_channels, (3, 3),
                        kernel_dilation=(r, r), padding=((r, r), (r, r)),
                        use_bias=False, dtype=self.dtype,
                        name=f"b{i}_conv")(x)
            branches.append(nn.relu(bn(f"b{i}_bn")(y)))
        # image-pooling branch: global mean -> 1x1 conv -> broadcast back
        g = jnp.mean(x, axis=(1, 2), keepdims=True)
        g = nn.Conv(self.out_channels, (1, 1), use_bias=False,
                    dtype=self.dtype, name="pool_conv")(g)
        g = nn.relu(bn("pool_bn")(g))
        branches.append(jnp.broadcast_to(g, branches[0].shape))

        y = jnp.concatenate(branches, axis=-1)
        y = nn.Conv(self.out_channels, (1, 1), use_bias=False,
                    dtype=self.dtype, name="proj_conv")(y)
        y = nn.relu(bn("proj_bn")(y))
        # torchvision ASPP has a Dropout(0.5) here; inference-only CaDDN
        # frustum features never see it, but keep train-mode parity
        y = nn.Dropout(0.5, deterministic=not train)(y)
        return y


class DeepLabV3DDN(nn.Module):
    """DDNDeepLabV3 with the DDNTemplate forward contract.

    __call__(images NHWC in [0, 1]) -> (features, logits), both at the
    layer1 (stride 4) resolution; ``num_classes`` logits channels.
    """
    num_classes: int
    backbone_name: str = "ResNet101"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, images: jnp.ndarray, train: bool = False):
        # DDNTemplate.preprocess: ImageNet normalize, padded (zero) pixels
        # forced back to zero
        mean = jnp.asarray([0.485, 0.456, 0.406], images.dtype)
        std = jnp.asarray([0.229, 0.224, 0.225], images.dtype)
        x = (images - mean) / std
        x = jnp.where(images == 0, 0.0, x)

        feats, out = ResNetDeepLabTrunk(RESNET_LAYERS[self.backbone_name],
                                        dtype=self.dtype,
                                        name="backbone")(x, train)
        y = ASPP(dtype=self.dtype, name="aspp")(out, train)
        y = nn.Conv(256, (3, 3), padding=((1, 1), (1, 1)), use_bias=False,
                    dtype=self.dtype, name="cls_conv")(y)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, name="cls_bn")(y)
        y = nn.relu(y)
        logits = nn.Conv(self.num_classes, (1, 1), dtype=self.dtype,
                         name="cls_out")(y)
        # ddn_template.py:131: F.interpolate(..., size=feat_shape,
        # mode='bilinear', align_corners=False)
        b, hf, wf, _ = feats.shape
        logits = jax.image.resize(
            logits, (b, hf, wf, logits.shape[-1]), method="linear")
        return feats, logits


def _t2f_conv(w):
    import numpy as np
    return np.transpose(np.asarray(w), (2, 3, 1, 0))     # OIHW -> HWIO


def load_torchvision_deeplab(variables, state_dict):
    """Overlay a torchvision deeplabv3_resnet{50,101} state dict onto a
    DeepLabV3DDN variable tree (the reference loads exactly these weights,
    ddn_template.py:60-83). Keys covered: backbone conv/bn/downsample,
    ASPP branches + projection, classifier head. Returns new variables;
    raises KeyError on any missing torch twin.
    """
    import numpy as np
    import flax

    params = flax.core.unfreeze(variables["params"])
    stats = flax.core.unfreeze(variables["batch_stats"])

    def put_bn(fparent, sparent, fname, tprefix):
        fparent[fname]["scale"] = np.asarray(state_dict[f"{tprefix}.weight"])
        fparent[fname]["bias"] = np.asarray(state_dict[f"{tprefix}.bias"])
        sparent[fname]["mean"] = np.asarray(
            state_dict[f"{tprefix}.running_mean"])
        sparent[fname]["var"] = np.asarray(
            state_dict[f"{tprefix}.running_var"])

    bb_p, bb_s = params["backbone"], stats["backbone"]
    bb_p["conv1"]["kernel"] = _t2f_conv(state_dict["backbone.conv1.weight"])
    put_bn(bb_p, bb_s, "bn1", "backbone.bn1")
    for name in list(bb_p):
        if not name.startswith("layer"):
            continue
        li, bi = name[5:].split("_")
        t = f"backbone.layer{li}.{bi}"
        blk_p, blk_s = bb_p[name], bb_s[name]
        for n in (1, 2, 3):
            blk_p[f"conv{n}"]["kernel"] = _t2f_conv(
                state_dict[f"{t}.conv{n}.weight"])
            put_bn(blk_p, blk_s, f"bn{n}", f"{t}.bn{n}")
        if "down_conv" in blk_p:
            blk_p["down_conv"]["kernel"] = _t2f_conv(
                state_dict[f"{t}.downsample.0.weight"])
            put_bn(blk_p, blk_s, "down_bn", f"{t}.downsample.1")

    ap, as_ = params["aspp"], stats["aspp"]
    ap["b0_conv"]["kernel"] = _t2f_conv(
        state_dict["classifier.0.convs.0.0.weight"])
    put_bn(ap, as_, "b0_bn", "classifier.0.convs.0.1")
    for i in (1, 2, 3):
        ap[f"b{i}_conv"]["kernel"] = _t2f_conv(
            state_dict[f"classifier.0.convs.{i}.0.weight"])
        put_bn(ap, as_, f"b{i}_bn", f"classifier.0.convs.{i}.1")
    ap["pool_conv"]["kernel"] = _t2f_conv(
        state_dict["classifier.0.convs.4.1.weight"])
    put_bn(ap, as_, "pool_bn", "classifier.0.convs.4.2")
    ap["proj_conv"]["kernel"] = _t2f_conv(
        state_dict["classifier.0.project.0.weight"])
    put_bn(ap, as_, "proj_bn", "classifier.0.project.1")

    params["cls_conv"]["kernel"] = _t2f_conv(
        state_dict["classifier.1.weight"])
    put_bn(params, stats, "cls_bn", "classifier.2")
    params["cls_out"]["kernel"] = _t2f_conv(state_dict["classifier.4.weight"])
    params["cls_out"]["bias"] = np.asarray(state_dict["classifier.4.bias"])

    return {"params": flax.core.freeze(params) if isinstance(
        variables["params"], flax.core.FrozenDict) else params,
        "batch_stats": stats}
