"""Checkpoint-converter key-manifest guards (VERDICT r3 #8).

The real pretrained artifacts (rgb_imagenet.pt, pcdet SECOND .pth,
torchvision deeplabv3_resnet50) are not present in this image, so the
published checkpoints' key NAME lists are pinned under tests/data/ and each
converter must account for every key: either map it into the Flax tree or
deliberately ignore it (BN bookkeeping buffers, bookkeeping scalars, heads
beyond the truncation point, the aux classifier). Any key a converter would
silently skip turns these tests red.

Manifest provenance:
  - manifest_i3d_rgb_imagenet.txt: the torch InceptionI3d module tree the
    reference instantiates (backbone.py:254-425, the public pytorch-i3d
    layout rgb_imagenet.pt was saved from): 57 Unit3Ds x (conv3d.weight +
    5 bn leaves) + logits conv weight/bias.
  - manifest_pcdet_second.txt: detector3d_template._load_state_dict naming
    for the SECOND config (layer_nums=(5,5)) + pcdet's global_step.
  - manifest_torchvision_deeplabv3_resnet50.txt: torchvision
    deeplabv3_resnet50 (the exact model the reference builds,
    ddn_deeplabv3.py), incl. the aux_classifier the loader must skip.
"""
import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

DATA = os.path.join(os.path.dirname(__file__), "data")


def _manifest(name):
    with open(os.path.join(DATA, name)) as f:
        return [ln.strip() for ln in f if ln.strip()]


def test_i3d_converter_consumes_full_manifest():
    from multimodal_gar_tpu.models.i3d_convert import (convert_state_dict,
                                                       unconsumed_keys)
    from tests.test_i3d import _fabricate_full_i3d_state_dict

    manifest = _manifest("manifest_i3d_rgb_imagenet.txt")
    # the fabricated golden-parity state dict matches the pinned manifest
    # exactly — parity tests therefore exercise the real key universe
    assert sorted(_fabricate_full_i3d_state_dict()) == sorted(manifest)
    # every manifest key is either mapped or deliberately ignored
    assert unconsumed_keys(dict.fromkeys(manifest)) == []
    # ...and a checkpoint with unknown naming IS flagged
    bad = dict.fromkeys(manifest + ["Mixed_3b.b0.conv3d.weigth",
                                    "features.0.weight"])
    assert sorted(unconsumed_keys(bad)) == ["Mixed_3b.b0.conv3d.weigth",
                                            "features.0.weight"]
    # mapped keys all land in the overlay trees (count check: every
    # non-ignored manifest key produces exactly one overlay leaf)
    shapes = _fabricate_full_i3d_state_dict()
    p, s = convert_state_dict(shapes)

    def count(d):
        return sum(count(v) if isinstance(v, dict) else 1 for v in d.values())

    n_expected = sum(1 for k in manifest
                     if not k.endswith("num_batches_tracked"))
    assert count(p) + count(s) == n_expected


def test_pcdet_second_converter_consumes_full_manifest():
    from multimodal_gar_tpu.detection.convert import unconsumed_pcdet_keys

    manifest = _manifest("manifest_pcdet_second.txt")
    assert len(manifest) == 163
    assert unconsumed_pcdet_keys(dict.fromkeys(manifest), (5, 5)) == []
    bad = dict.fromkeys(manifest + ["backbone_3d.conv5.0.0.weight",
                                    "roi_head.shared_fc.0.weight"])
    assert sorted(unconsumed_pcdet_keys(bad, (5, 5))) == [
        "backbone_3d.conv5.0.0.weight", "roi_head.shared_fc.0.weight"]


class _RecordingDict(dict):
    def __init__(self, *a, **kw):
        super().__init__(*a, **kw)
        self.read = set()

    def __getitem__(self, k):
        self.read.add(k)
        return super().__getitem__(k)


def _torchvision_deeplab_sd(num_classes=9):
    """Manifest-shaped deeplabv3_resnet50 state dict with correct shapes."""
    rng = np.random.default_rng(0)
    sd = {}

    def conv(p, cout, cin, k):
        sd[f"{p}.weight"] = rng.normal(size=(cout, cin, k, k)).astype(
            np.float32) * 0.05

    def bn(p, c):
        sd[f"{p}.weight"] = rng.uniform(0.5, 1.5, c).astype(np.float32)
        sd[f"{p}.bias"] = rng.normal(0, 0.1, c).astype(np.float32)
        sd[f"{p}.running_mean"] = rng.normal(0, 0.1, c).astype(np.float32)
        sd[f"{p}.running_var"] = rng.uniform(0.5, 1.5, c).astype(np.float32)
        sd[f"{p}.num_batches_tracked"] = np.asarray(10)

    conv("backbone.conv1", 64, 3, 7)
    bn("backbone.bn1", 64)
    for li, (blocks, planes, cin0) in {1: (3, 64, 64), 2: (4, 128, 256),
                                       3: (6, 256, 512),
                                       4: (3, 512, 1024)}.items():
        cin = cin0
        for bi in range(blocks):
            p = f"backbone.layer{li}.{bi}"
            conv(f"{p}.conv1", planes, cin, 1)
            bn(f"{p}.bn1", planes)
            conv(f"{p}.conv2", planes, planes, 3)
            bn(f"{p}.bn2", planes)
            conv(f"{p}.conv3", planes * 4, planes, 1)
            bn(f"{p}.bn3", planes * 4)
            if bi == 0:
                conv(f"{p}.downsample.0", planes * 4, cin, 1)
                bn(f"{p}.downsample.1", planes * 4)
            cin = planes * 4
    conv("classifier.0.convs.0.0", 256, 2048, 1)
    bn("classifier.0.convs.0.1", 256)
    for i in (1, 2, 3):
        conv(f"classifier.0.convs.{i}.0", 256, 2048, 3)
        bn(f"classifier.0.convs.{i}.1", 256)
    conv("classifier.0.convs.4.1", 256, 2048, 1)
    bn("classifier.0.convs.4.2", 256)
    conv("classifier.0.project.0", 256, 1280, 1)
    bn("classifier.0.project.1", 256)
    conv("classifier.1", 256, 256, 3)
    bn("classifier.2", 256)
    conv("classifier.4", num_classes, 256, 1)
    sd["classifier.4.bias"] = rng.normal(0, 0.1, num_classes).astype(
        np.float32)
    conv("aux_classifier.0", 256, 1024, 3)
    bn("aux_classifier.1", 256)
    conv("aux_classifier.4", 21, 256, 1)
    sd["aux_classifier.4.bias"] = rng.normal(0, 0.1, 21).astype(np.float32)
    return sd


def test_torchvision_deeplab_loader_reads_full_manifest():
    from multimodal_gar_tpu.detection.ddn_deeplab import (
        DeepLabV3DDN, load_torchvision_deeplab)

    manifest = _manifest("manifest_torchvision_deeplabv3_resnet50.txt")
    sd = _RecordingDict(_torchvision_deeplab_sd())
    assert sorted(sd) == sorted(manifest)   # fabrication matches the pin

    model = DeepLabV3DDN(num_classes=9, backbone_name="ResNet50")
    variables = jax.jit(partial(model.init, train=False))(
        jax.random.PRNGKey(0), jnp.zeros((1, 32, 64, 3)))
    load_torchvision_deeplab(variables, sd)

    unread = set(manifest) - sd.read
    allowed = {k for k in manifest
               if k.endswith("num_batches_tracked")
               or k.startswith("aux_classifier.")}
    assert unread <= allowed, sorted(unread - allowed)
    # every backbone/classifier tensor was actually consumed
    assert not {k for k in manifest if k not in allowed} - sd.read
