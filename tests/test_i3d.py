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


def _fabricate_full_i3d_state_dict():
    """A COMPLETE rgb_imagenet.pt-style state dict: every endpoint the torch
    InceptionI3d(final_endpoint='Logits') registers (backbone.py:254-425),
    every Unit3D carrying conv3d.weight + 4 bn buffers + num_batches_tracked.
    Each tensor is filled with a unique constant so any naming drift shows up
    as a value mismatch."""
    units = {}   # prefix -> (cin, cout, k)
    for name, (cin, cout, k) in {
        "Conv3d_1a_7x7": (3, 64, 7),
        "Conv3d_2b_1x1": (64, 64, 1),
        "Conv3d_2c_3x3": (64, 192, 3),
    }.items():
        units[name] = (cin, cout, k)
    mixed = {
        "Mixed_3b": (192, [64, 96, 128, 16, 32, 32]),
        "Mixed_3c": (256, [128, 128, 192, 32, 96, 64]),
        "Mixed_4b": (480, [192, 96, 208, 16, 48, 64]),
        "Mixed_4c": (512, [160, 112, 224, 24, 64, 64]),
        "Mixed_4d": (512, [128, 128, 256, 24, 64, 64]),
        "Mixed_4e": (512, [112, 144, 288, 32, 64, 64]),
        "Mixed_4f": (528, [256, 160, 320, 32, 128, 128]),
        "Mixed_5b": (832, [256, 160, 320, 32, 128, 128]),
        "Mixed_5c": (832, [384, 192, 384, 48, 128, 128]),
    }
    for name, (cin, o) in mixed.items():
        for b, (bc_in, bc_out, k) in {
            "b0": (cin, o[0], 1), "b1a": (cin, o[1], 1), "b1b": (o[1], o[2], 3),
            "b2a": (cin, o[3], 1), "b2b": (o[3], o[4], 3), "b3b": (cin, o[5], 1),
        }.items():
            units[f"{name}.{b}"] = (bc_in, bc_out, k)

    sd, expected, i = {}, {}, 0

    def const(shape):
        nonlocal i
        i += 1
        return np.full(shape, 0.5 + 0.001 * i, np.float32)

    for prefix, (cin, cout, k) in units.items():
        sd[f"{prefix}.conv3d.weight"] = const((cout, cin, k, k, k))
        for leaf in ("weight", "bias", "running_mean", "running_var"):
            sd[f"{prefix}.bn.{leaf}"] = const((cout,))
        sd[f"{prefix}.bn.num_batches_tracked"] = np.asarray(7, np.int64)
    # Logits head (backbone.py:383-385): Unit3D without bn, with bias
    sd["logits.conv3d.weight"] = const((400, 1024, 1, 1, 1))
    sd["logits.conv3d.bias"] = const((400,))
    return sd


def test_full_tree_checkpoint_conversion():
    """Zero unmatched keys in BOTH directions for a complete Kinetics-style
    checkpoint: every flax leaf under the Mixed_4f tree is overwritten with
    its torch twin's unique constant, and deeper torch layers (Mixed_5*,
    logits) are ignored cleanly (VERDICT round-1 item 7)."""
    from multimodal_gar_tpu.models.i3d_convert import load_i3d_checkpoint

    sd = _fabricate_full_i3d_state_dict()
    m = InceptionI3d(final_endpoint="Mixed_4f")
    v = jax.jit(partial(m.init, train=False))(
        jax.random.PRNGKey(0), jnp.zeros((1, 4, 32, 32, 3)))
    wrapped = {"params": {"s": {"i3d": v["params"]}},
               "batch_stats": {"s": {"i3d": v["batch_stats"]}}}
    out = load_i3d_checkpoint(wrapped, sd, scope="s")

    leaf_to_torch = {"kernel": "weight", "scale": "weight", "bias": "bias",
                     "mean": "running_mean", "var": "running_var"}

    def walk(tree, path, collection, n_checked=0):
        for key, val in tree.items():
            p = path + (key,)
            if isinstance(val, dict):
                n_checked = walk(val, p, collection, n_checked)
                continue
            # flax path -> torch key
            layer, leaf = p[-2], p[-1]
            torch_leaf = leaf_to_torch[leaf]
            torch_key = ".".join(p[:-1]) + "." + torch_leaf
            assert torch_key in sd, f"no torch twin for flax leaf {p}"
            src = sd[torch_key]
            if leaf == "kernel":
                src = src.transpose(2, 3, 4, 1, 0)
            np.testing.assert_array_equal(
                np.asarray(val), src, err_msg=str(p))
            n_checked += 1
        return n_checked

    n_p = walk(jax.tree_util.tree_map(np.asarray,
                                      out["params"]["s"]["i3d"]), (), sd)
    n_s = walk(jax.tree_util.tree_map(np.asarray,
                                      out["batch_stats"]["s"]["i3d"]), (), sd)
    # 45 Unit3D units up to Mixed_4f (3 stem convs + 7 mixed blocks x 6
    # branches): each has kernel+bn scale+bn bias params and mean+var stats
    assert n_p == 45 * 3, n_p
    assert n_s == 45 * 2, n_s


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


def test_unit3d_pallas_stem_matches_xla_path(monkeypatch):
    """The integrated Pallas stem (interpret mode on CPU) must reproduce the
    XLA conv+BN+ReLU stem with the SAME variable tree (BN fold check)."""
    monkeypatch.setenv("MGAR_PALLAS_INTERPRET", "1")
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.normal(size=(1, 7, 20, 36, 3)).astype(np.float32))

    mk = partial(Unit3D, out_channels=64, kernel=(7, 7, 7), stride=(2, 2, 2),
                 s2d_stem=True)
    m_ref = mk(pallas_stem=False)
    m_pal = mk(pallas_stem=True)
    variables = m_ref.init(jax.random.PRNGKey(0), x, train=False)
    # non-trivial BN stats so the fold actually matters
    variables = jax.tree_util.tree_map(np.asarray, variables)
    variables["batch_stats"]["bn"]["mean"] = rng.normal(
        size=(64,)).astype(np.float32) * 0.1
    variables["batch_stats"]["bn"]["var"] = rng.uniform(
        0.5, 2.0, size=(64,)).astype(np.float32)
    variables["params"]["bn"]["scale"] = rng.normal(
        size=(64,)).astype(np.float32)
    variables = jax.tree_util.tree_map(jnp.asarray, variables)

    ref = m_ref.apply(variables, x, train=False)
    got = m_pal.apply(variables, x, train=False)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-3, atol=1e-3)
    # identical variable trees: pallas path init must create the same tree
    v2 = m_pal.init(jax.random.PRNGKey(0), x, train=False)
    assert jax.tree_util.tree_structure(v2) == \
        jax.tree_util.tree_structure(variables)


def test_i3d_remat_same_outputs_and_grads():
    """remat=True must be numerically identical (forward AND grads) — it only
    changes what's stored vs recomputed in the backward pass."""
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(size=(1, 7, 16, 16, 3)).astype(np.float32))
    m0 = InceptionI3d(final_endpoint="Mixed_3b", remat=False)
    m1 = InceptionI3d(final_endpoint="Mixed_3b", remat=True)
    v = m0.init(jax.random.PRNGKey(0), x, train=False)

    def loss(m, variables):
        def f(p):
            out, _ = m.apply({"params": p, "batch_stats": v["batch_stats"]},
                             x, train=True, mutable=["batch_stats"])
            return jnp.sum(out ** 2)
        return jax.value_and_grad(f)(variables["params"])

    l0, g0 = loss(m0, v)
    l1, g1 = loss(m1, v)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(g0),
                    jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)


def test_unit3d_pallas_stem_differentiable(monkeypatch):
    """The train step differentiates through the (frozen, eval-mode) stem;
    the Pallas path must expose a working VJP (custom_vjp over the XLA
    reference — pallas_call itself has no AD rule)."""
    monkeypatch.setenv("MGAR_PALLAS_INTERPRET", "1")
    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.normal(size=(1, 7, 12, 20, 3)).astype(np.float32))
    m = Unit3D(out_channels=64, kernel=(7, 7, 7), stride=(2, 2, 2),
               s2d_stem=True, pallas_stem=True)
    v = m.init(jax.random.PRNGKey(0), x, train=False)

    def f(params, xx):
        return m.apply({"params": params,
                        "batch_stats": v["batch_stats"]}, xx,
                       train=False).sum()

    gp, gx = jax.grad(f, argnums=(0, 1))(v["params"], x)
    ref = Unit3D(out_channels=64, kernel=(7, 7, 7), stride=(2, 2, 2),
                 s2d_stem=True, pallas_stem=False)

    def fr(params, xx):
        return ref.apply({"params": params,
                          "batch_stats": v["batch_stats"]}, xx,
                         train=False).sum()

    gp_r, gx_r = jax.grad(fr, argnums=(0, 1))(v["params"], x)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_r),
                               rtol=1e-3, atol=1e-3)
    for a, b in zip(jax.tree_util.tree_leaves(gp),
                    jax.tree_util.tree_leaves(gp_r)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-3)


def test_unit3d_t2d_matches_3d_conv():
    """t2d (3 shifted 2D convs) == the 3D conv on the folded eval path."""
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 5, 6, 7, 3)), jnp.float32)
    ref = Unit3D(8, (3, 3, 3), t2d=False)
    alt = Unit3D(8, (3, 3, 3), t2d=True)
    variables = ref.init(jax.random.PRNGKey(0), x, train=False)
    # non-trivial BN stats so the fold actually scales
    variables = jax.tree_util.tree_map(
        lambda v: v + 0.01 * jnp.arange(v.size).reshape(v.shape), variables)
    a = ref.apply(variables, x, train=False)
    b = alt.apply(variables, x, train=False)
    # same sums in a different association order (3 dt groups vs one K=81
    # contraction): bitwise equality is not expected
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               atol=1e-4, rtol=1e-4)


def _torch_same_pad_pool3d(x, k, s):
    """TF-SAME max pool in torch (pad with -inf)."""
    _, _, t, h, wd = x.shape
    pads = []
    for dim, kk, ss in zip((t, h, wd), k, s):
        p = max(kk - ss, 0) if dim % ss == 0 else max(kk - dim % ss, 0)
        pads.append((p // 2, p - p // 2))
    x = F.pad(x, (pads[2][0], pads[2][1], pads[1][0], pads[1][1],
                  pads[0][0], pads[0][1]), value=float("-inf"))
    return F.max_pool3d(x, k, s)


def test_i3d_full_forward_matches_torch_replica():
    """The COMPOSED I3D trunk (stem -> pools -> 2b/2c -> Mixed_3b..4f)
    matches an independently wired torch replica on transplanted weights —
    catches inter-module wiring mistakes the per-op tests cannot."""
    from multimodal_gar_tpu.models.i3d import _INCEPTION_CFG

    rng = np.random.default_rng(0)
    x = rng.normal(size=(1, 9, 32, 40, 3)).astype(np.float32) * 0.5

    model = InceptionI3d(final_endpoint="Mixed_4f", pallas_stem=False)
    variables = jax.jit(partial(model.init, train=False))(
        jax.random.PRNGKey(0), jnp.asarray(x))
    # non-trivial BN stats/affine so folding and placement actually matter
    variables = jax.tree_util.tree_map(
        lambda v: v + 0.01 * (jnp.arange(v.size) % 7).reshape(v.shape),
        variables)
    ours = np.asarray(jax.jit(partial(model.apply, train=False))(
        variables, jnp.asarray(x)))

    params = jax.tree_util.tree_map(np.asarray, variables["params"])
    stats = jax.tree_util.tree_map(np.asarray, variables["batch_stats"])

    def unit(xt, p, s, stride=(1, 1, 1)):
        w = torch.tensor(np.transpose(p["conv3d"]["kernel"],
                                      (4, 3, 0, 1, 2)))
        y = _torch_same_pad_conv3d(xt, w, stride)
        sh = (1, -1, 1, 1, 1)
        y = (y - torch.tensor(s["bn"]["mean"]).view(sh)) \
            / torch.sqrt(torch.tensor(s["bn"]["var"]).view(sh) + 1e-3) \
            * torch.tensor(p["bn"]["scale"]).view(sh) \
            + torch.tensor(p["bn"]["bias"]).view(sh)
        return torch.relu(y)

    def mixed(xt, name):
        p, s = params[name], stats[name]
        b0 = unit(xt, p["b0"], s["b0"])
        b1 = unit(unit(xt, p["b1a"], s["b1a"]), p["b1b"], s["b1b"])
        b2 = unit(unit(xt, p["b2a"], s["b2a"]), p["b2b"], s["b2b"])
        b3 = unit(_torch_same_pad_pool3d(xt, (3, 3, 3), (1, 1, 1)),
                  p["b3b"], s["b3b"])
        return torch.cat([b0, b1, b2, b3], dim=1)

    with torch.no_grad():
        t = torch.tensor(np.transpose(x, (0, 4, 1, 2, 3)))
        t = unit(t, params["Conv3d_1a_7x7"], stats["Conv3d_1a_7x7"],
                 (2, 2, 2))
        t = _torch_same_pad_pool3d(t, (1, 3, 3), (1, 2, 2))
        t = unit(t, params["Conv3d_2b_1x1"], stats["Conv3d_2b_1x1"])
        t = unit(t, params["Conv3d_2c_3x3"], stats["Conv3d_2c_3x3"])
        t = _torch_same_pad_pool3d(t, (1, 3, 3), (1, 2, 2))
        t = mixed(t, "Mixed_3b")
        t = mixed(t, "Mixed_3c")
        t = _torch_same_pad_pool3d(t, (3, 3, 3), (2, 2, 2))
        for name in ("Mixed_4b", "Mixed_4c", "Mixed_4d", "Mixed_4e",
                     "Mixed_4f"):
            t = mixed(t, name)
    ref = np.transpose(t.numpy(), (0, 2, 3, 4, 1))

    assert ours.shape == ref.shape, (ours.shape, ref.shape)
    np.testing.assert_allclose(ours, ref, rtol=2e-3, atol=2e-3)


def test_center_slice_matches_full_center():
    """Temporal-cone culling (InceptionI3d.center_slice) is exact: its single
    output slice equals full_output[:, T4 // 2] (the slice the model consumes,
    reference gat_model.py:1050) to f32 rounding (measured 4e-8 max — XLA
    schedules the shorter-T convs differently, so not bitwise). Covers T4=4
    (flagship 15-frame regime: Mixed_4f culled to 1/4, Mixed_4e to 3/4) and
    T4=5 (interior cone on both sides)."""
    rng = np.random.default_rng(7)
    full = InceptionI3d(final_endpoint="Mixed_4f")
    culled = InceptionI3d(final_endpoint="Mixed_4f", center_slice=True)
    for t in (15, 17):
        x = jnp.asarray(rng.normal(size=(1, t, 32, 48, 3)).astype(np.float32))
        v = jax.jit(partial(full.init, train=False))(jax.random.PRNGKey(1), x)
        out_full = jax.jit(partial(full.apply, train=False))(v, x)
        out_cull = jax.jit(partial(culled.apply, train=False))(v, x)
        t4 = out_full.shape[1]
        assert out_cull.shape == (1, 1) + out_full.shape[2:]
        np.testing.assert_allclose(np.asarray(out_cull[:, 0]),
                                   np.asarray(out_full[:, t4 // 2]),
                                   rtol=1e-5, atol=1e-6)


def test_batch_unroll_matches_batched():
    """The eval-path batch unroll (InceptionI3d.batch_unroll: batched stem +
    per-clip body, the sparse-gather-unroll fix applied to the I3D body —
    ROUND5_NOTES batch-scaling table) is exact: same module instances, so the
    param tree is identical, and eval-mode BN makes per-item == batched.
    Also covers composition with center_slice (the default eval config)."""
    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.normal(size=(3, 15, 32, 48, 3)).astype(np.float32))
    for center in (False, True):
        batched = InceptionI3d(final_endpoint="Mixed_4f", center_slice=center)
        unrolled = InceptionI3d(final_endpoint="Mixed_4f",
                                center_slice=center, batch_unroll=True)
        v = jax.jit(partial(batched.init, train=False))(
            jax.random.PRNGKey(2), x)
        # identical param/stat trees (the unroll re-calls shared instances)
        vu = jax.jit(partial(unrolled.init, train=False))(
            jax.random.PRNGKey(2), x)
        assert (jax.tree_util.tree_structure(v)
                == jax.tree_util.tree_structure(vu))
        out_b = jax.jit(partial(batched.apply, train=False))(v, x)
        out_u = jax.jit(partial(unrolled.apply, train=False))(v, x)
        assert out_u.shape == out_b.shape
        np.testing.assert_allclose(np.asarray(out_u), np.asarray(out_b),
                                   rtol=1e-5, atol=1e-6)
