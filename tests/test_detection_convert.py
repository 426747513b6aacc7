"""pcdet SECOND checkpoint conversion: full-tree fabricated state dict."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_gar_tpu.detection import build_detector
from multimodal_gar_tpu.detection.convert import (bev_input_channel_perm,
                                                  convert_pcdet_second,
                                                  normalize_spconv_kernel,
                                                  torch_conv2d_to_nhwc)
from tests.test_detection import det_batch, tiny_voxel_cfg


def test_normalize_spconv_kernel_all_layouts():
    k = np.arange(27 * 4 * 8, dtype=np.float32).reshape(3, 3, 3, 4, 8)
    # spconv 2.x passes through
    np.testing.assert_array_equal(
        normalize_spconv_kernel(k, 4, 8), k.reshape(27, 4, 8))
    # spconv 1.x (kz,ky,kx,c_out,c_in) transposes back
    v1 = np.swapaxes(k, -1, -2)
    np.testing.assert_array_equal(
        normalize_spconv_kernel(v1, 4, 8), k.reshape(27, 4, 8))
    # implicit gemm (c_out,kz,ky,kx,c_in)
    vig = np.moveaxis(k, -1, 0)
    np.testing.assert_array_equal(
        normalize_spconv_kernel(vig, 4, 8), k.reshape(27, 4, 8))


def test_torch_conv2d_layout():
    w = np.arange(8 * 4 * 3 * 3, dtype=np.float32).reshape(8, 4, 3, 3)
    out = torch_conv2d_to_nhwc(w)
    assert out.shape == (3, 3, 4, 8)
    np.testing.assert_array_equal(out[1, 2, 3, 5], w[5, 3, 1, 2])


def test_bev_first_conv_forward_parity():
    """Converted first-BEV-conv weights must compute the same map on our
    d-major channel stacking (sparse_to_dense_bev) as torch does on pcdet's
    c-major HeightCompression view — channel permute + explicit (1,1) pad."""
    rng = np.random.default_rng(1)
    B, C, D, H, W, CO = 1, 6, 2, 8, 8, 5
    dense = rng.normal(size=(B, C, D, H, W)).astype(np.float32)
    w_t = rng.normal(size=(CO, C * D, 3, 3)).astype(np.float32)
    stride = 2

    # pcdet: (B, C, D, H, W).view(B, C*D, H, W) then ZeroPad2d(1) + conv
    x_torch = dense.reshape(B, C * D, H, W)
    ref = jax.lax.conv_general_dilated(
        jnp.asarray(x_torch), jnp.asarray(w_t), (stride, stride),
        [(1, 1), (1, 1)], dimension_numbers=("NCHW", "OIHW", "NCHW"))

    # ours: d-major NHWC stacking (bev.py sparse_to_dense_bev tail)
    x_ours = np.transpose(dense, (0, 3, 4, 2, 1)).reshape(B, H, W, D * C)
    w_ours = torch_conv2d_to_nhwc(w_t[:, bev_input_channel_perm(D, C)])
    got = jax.lax.conv_general_dilated(
        jnp.asarray(x_ours), jnp.asarray(w_ours), (stride, stride),
        [(1, 1), (1, 1)], dimension_numbers=("NHWC", "HWIO", "NHWC"))
    np.testing.assert_allclose(
        np.transpose(np.asarray(ref), (0, 2, 3, 1)), np.asarray(got),
        rtol=1e-4, atol=1e-4)


def _fabricate_state_dict(variables, layer_nums):
    """Build a COMPLETE torch-style SECOND state dict (reference naming,
    detector3d_template._load_state_dict consumers) from the Flax shapes."""
    import jax

    from multimodal_gar_tpu.detection.convert import (SECOND_NAME_MAP,
                                                      _bev_block_map)
    name_map = dict(SECOND_NAME_MAP)
    name_map.update(_bev_block_map(layer_nums))
    rng = np.random.default_rng(0)
    params = jax.device_get(variables["params"])
    stats = jax.device_get(variables.get("batch_stats", {}))
    sd = {}
    for torch_base, (path, kind) in name_map.items():
        node = params
        ok = True
        for p in path.split("/"):
            if p not in node:
                ok = False
                break
            node = node[p]
        if not ok:
            continue
        if kind == "sparse":
            k3, cin, cout = node["kernel"].shape
            k = int(round(k3 ** (1 / 3)))
            if k ** 3 != k3:     # anisotropic (3,1,1) out conv
                kz, ky, kx = 3, 1, 1
            else:
                kz = ky = kx = k
            sd[f"{torch_base}.weight"] = rng.normal(
                size=(kz, ky, kx, cout, cin)).astype(np.float32)  # spconv 1.x
        elif kind == "conv2d":
            kh, kw, cin, cout = node["kernel"].shape
            sd[f"{torch_base}.weight"] = rng.normal(
                size=(cout, cin, kh, kw)).astype(np.float32)
            if "bias" in node:
                sd[f"{torch_base}.bias"] = rng.normal(
                    size=(cout,)).astype(np.float32)
        elif kind == "deconv2d":
            kh, kw, cin, cout = node["kernel"].shape
            sd[f"{torch_base}.weight"] = rng.normal(
                size=(cin, cout, kh, kw)).astype(np.float32)
        elif kind == "bn":
            c = node["scale"].shape[0]
            sd[f"{torch_base}.weight"] = rng.normal(size=(c,)).astype(
                np.float32)
            sd[f"{torch_base}.bias"] = rng.normal(size=(c,)).astype(
                np.float32)
            sd[f"{torch_base}.running_mean"] = rng.normal(size=(c,)).astype(
                np.float32)
            sd[f"{torch_base}.running_var"] = rng.uniform(
                0.5, 2.0, size=(c,)).astype(np.float32)
            sd[f"{torch_base}.num_batches_tracked"] = np.asarray(10)
    return sd


def test_convert_full_second_tree():
    cfg = tiny_voxel_cfg("SECOND")
    model = build_detector("SECOND", cfg)
    batch = det_batch(cfg)
    variables = jax.jit(lambda r, b: model.init(r, b, train=False))(
        jax.random.PRNGKey(0), batch)
    layer_nums = cfg.bev_layer_nums
    sd = _fabricate_state_dict(variables, layer_nums)
    assert len(sd) > 40                       # a real full tree

    new_vars, loaded = convert_pcdet_second(sd, variables, layer_nums)
    expect = len([k for k in sd if not k.endswith("num_batches_tracked")])
    assert loaded == expect, (loaded, expect)

    # a sparse kernel round-trips through the spconv-1.x layout
    w = sd["backbone_3d.conv_input.0.weight"]
    got = np.asarray(
        new_vars["params"]["trunk"]["backbone_3d"]["conv_input"]["conv"]
        ["kernel"])
    np.testing.assert_allclose(
        got, np.swapaxes(w, -1, -2).reshape(got.shape), atol=1e-6)
    # BN running stats landed in batch_stats
    np.testing.assert_allclose(
        np.asarray(new_vars["batch_stats"]["trunk"]["backbone_3d"]
                   ["conv_input"]["bn"]["mean"]),
        sd["backbone_3d.conv_input.1.running_mean"], atol=1e-6)

    # the converted model still runs
    preds = jax.jit(lambda v, b: model.apply(v, b, train=False))(
        jax.tree_util.tree_map(jnp.asarray, new_vars), batch)
    assert jnp.isfinite(preds["cls_preds"]).all()
