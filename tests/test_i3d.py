"""I3D semantics: SAME padding parity with torch, checkpoint conversion."""
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from multimodal_gar_tpu.models.i3d import InceptionI3d, Unit3D


def _torch_same_pad_conv3d(x, w, stride):
    """TF-SAME conv3d in torch (independent re-derivation of the rule)."""
    _, _, t, h, wd = x.shape
    kt, kh, kw = w.shape[2:]
    pads = []
    for dim, k, s in zip((t, h, wd), (kt, kh, kw), stride):
        p = max(k - s, 0) if dim % s == 0 else max(k - dim % s, 0)
        pads.append((p // 2, p - p // 2))
    x = F.pad(x, (pads[2][0], pads[2][1], pads[1][0], pads[1][1],
                  pads[0][0], pads[0][1]))
    return F.conv3d(x, w, stride=stride)


def test_unit3d_same_padding_matches_torch():
    rng = np.random.default_rng(0)
    for shape, kernel, stride in [
        ((1, 7, 9, 11, 3), (7, 7, 7), (2, 2, 2)),
        ((1, 5, 8, 8, 4), (3, 3, 3), (1, 1, 1)),
        ((2, 4, 6, 10, 2), (1, 3, 3), (1, 2, 2)),
    ]:
        x = rng.normal(size=shape).astype(np.float32)
        cin = shape[-1]
        cout = 6
        w = rng.normal(size=(cout, cin) + kernel).astype(np.float32) * 0.1

        ref = _torch_same_pad_conv3d(
            torch.tensor(np.transpose(x, (0, 4, 1, 2, 3))),
            torch.tensor(w), stride).numpy()
        ref = np.transpose(ref, (0, 2, 3, 4, 1))

        m = Unit3D(out_channels=cout, kernel=kernel, stride=stride,
                   use_batch_norm=False, activation=False)
        v = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
        v = jax.tree_util.tree_map(np.asarray, v)
        v["params"]["conv3d"]["kernel"] = np.transpose(w, (2, 3, 4, 1, 0))
        out = np.asarray(m.apply(v, jnp.asarray(x)))
        np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-4)


def test_i3d_output_shape_and_stride():
    x = jnp.zeros((1, 15, 64, 96, 3))
    m = InceptionI3d(final_endpoint="Mixed_4f")
    v = jax.jit(partial(m.init, train=False))(jax.random.PRNGKey(0), x)
    out = jax.jit(partial(m.apply, train=False))(v, x)
    # temporal stride 4 (ceil division), spatial stride 16, 832 channels
    assert out.shape == (1, 4, 4, 6, 832)


def test_checkpoint_conversion_overlays_weights():
    from multimodal_gar_tpu.models.i3d_convert import (convert_state_dict,
                                                       load_i3d_checkpoint)
    from multimodal_gar_tpu.models.rgb_backbone import RGBBackbone
    from tests.util import tiny_config

    cfg = tiny_config()
    model = RGBBackbone(cfg.model.rgb)
    images = jnp.zeros((1, 3, 32, 48, 3))
    boxes = jnp.zeros((1, 4, 4))
    variables = model.init(jax.random.PRNGKey(0), images, boxes)

    # fabricate a torch-style state dict with matching shapes
    rng = np.random.default_rng(1)
    sd = {
        "Conv3d_1a_7x7.conv3d.weight":
            rng.normal(size=(64, 3, 7, 7, 7)).astype(np.float32),
        "Conv3d_1a_7x7.bn.weight": np.ones(64, np.float32) * 2.0,
        "Conv3d_1a_7x7.bn.bias": np.zeros(64, np.float32),
        "Conv3d_1a_7x7.bn.running_mean": np.zeros(64, np.float32),
        "Conv3d_1a_7x7.bn.running_var": np.ones(64, np.float32),
        "Mixed_3b.b1a.conv3d.weight":
            rng.normal(size=(96, 192, 1, 1, 1)).astype(np.float32),
    }
    p, s = convert_state_dict(sd)
    assert p["Conv3d_1a_7x7"]["conv3d"]["kernel"].shape == (7, 7, 7, 3, 64)

    # wrap variables so the overlay path (scope='') targets this backbone
    wrapped = {"params": {"x": {"i3d": variables["params"]["i3d"]}},
               "batch_stats": {"x": {"i3d": variables["batch_stats"]["i3d"]}}}
    out = load_i3d_checkpoint(wrapped, sd, scope="x")
    got = np.asarray(out["params"]["x"]["i3d"]["Conv3d_1a_7x7"]["conv3d"]["kernel"])
    np.testing.assert_allclose(
        got, sd["Conv3d_1a_7x7.conv3d.weight"].transpose(2, 3, 4, 1, 0))
    got_scale = np.asarray(out["params"]["x"]["i3d"]["Conv3d_1a_7x7"]["bn"]["scale"])
    assert np.allclose(got_scale, 2.0)


def test_checkpoint_conversion_shape_mismatch_raises():
    from multimodal_gar_tpu.models.i3d_convert import load_i3d_checkpoint
    from multimodal_gar_tpu.models.i3d import InceptionI3d
    m = InceptionI3d(final_endpoint="Mixed_3b")
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 3, 16, 16, 3)))
    bad = {"Conv3d_1a_7x7.conv3d.weight": np.zeros((8, 3, 7, 7, 7), np.float32)}
    wrapped = {"params": {"s": {"i3d": v["params"]}},
               "batch_stats": {"s": {"i3d": v["batch_stats"]}}}
    import pytest
    with pytest.raises(ValueError):
        load_i3d_checkpoint(wrapped, bad, scope="s")


def test_s2d_stem_matches_direct_conv():
    """The space-to-depth stem path must equal the plain SAME conv exactly."""
    import jax.numpy as jnp
    from multimodal_gar_tpu.models.i3d import _stem_conv_s2d
    rng = np.random.default_rng(3)
    for t, h, w in [(15, 36, 64), (15, 37, 63), (7, 20, 20)]:
        x = jnp.asarray(rng.normal(size=(1, t, h, w, 3)).astype(np.float32))
        k = jnp.asarray(rng.normal(size=(7, 7, 7, 3, 8)).astype(np.float32)) * 0.1
        direct = jax.lax.conv_general_dilated(
            x, k, (2, 2, 2), "SAME",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
        fast = _stem_conv_s2d(x, k)
        assert fast.shape == direct.shape, (fast.shape, direct.shape)
        np.testing.assert_allclose(np.asarray(fast), np.asarray(direct),
                                   rtol=1e-4, atol=1e-4)
