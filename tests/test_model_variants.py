"""Backbone attention options, GAT, legacy models, alt 2D backbones."""
import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.util import synthetic_batch, tiny_config

B, N, D = 1, 6, 512


def test_gatv2_layer_masks_and_shapes(rng):
    from multimodal_gar_tpu.models.gat import GATv2Layer
    x = jnp.asarray(rng.normal(size=(B, N, D)).astype(np.float32))
    valid = jnp.asarray([[True] * 4 + [False] * 2])
    m = GATv2Layer(D, num_heads=4)
    v = m.init(jax.random.PRNGKey(0), x, valid)
    out = m.apply(v, x, valid)
    assert out.shape == (B, N, D)
    assert np.allclose(np.asarray(out)[0, 4:], 0)
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.parametrize("flag", ["two_stage_att", "inter_person", "gat_module"])
def test_rgb_backbone_variants(flag, rng):
    from multimodal_gar_tpu.models.rgb_backbone import RGBBackbone
    cfg = tiny_config()
    rcfg = dataclasses.replace(cfg.model.rgb, **{flag: True})
    images = jnp.asarray(rng.normal(size=(1, 3, 32, 48, 3)).astype(np.float32))
    boxes = jnp.asarray(rng.uniform(1, 20, (1, N, 4)).astype(np.float32))
    boxes = boxes.at[..., 2:].add(10)
    valid = jnp.ones((1, N), bool)
    m = RGBBackbone(rcfg)
    v = jax.jit(partial(m.init, train=False))(jax.random.PRNGKey(0), images,
                                              boxes, valid=valid)
    out = jax.jit(partial(m.apply, train=False))(v, images, boxes, valid=valid)
    assert out.shape == (1, N, rcfg.embedding_dim)
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.parametrize("variant", ["inter_person", "two_stage", "shared_fc"])
def test_lidar_backbone_variants(variant, rng):
    from multimodal_gar_tpu.models.lidar_backbone import LiDARBackbone
    cfg = tiny_config()
    over = {"inter_person": {"self_att_inter_person": True},
            "two_stage": {"two_stage_att": True},
            "shared_fc": {"self_att_use": False}}[variant]
    lcfg = dataclasses.replace(cfg.model.lidar, **over)
    batch = synthetic_batch(cfg, 1)
    m = LiDARBackbone(lcfg, cfg.data.point_cloud)
    args = (batch.voxels, batch.voxel_coords, batch.voxel_num_points,
            batch.voxel_valid, batch.boxes3d, batch.person_valid)
    v = jax.jit(partial(m.init, train=False))(jax.random.PRNGKey(0), *args)
    out = jax.jit(partial(m.apply, train=False))(v, *args)
    assert out.shape == (1, cfg.data.num_boxes, lcfg.embedding_dim)
    assert np.isfinite(np.asarray(out)).all()


def test_garnet_legacy(rng):
    from multimodal_gar_tpu.models.legacy import GARNet
    feats = jnp.asarray(rng.normal(size=(B, N, 1024)).astype(np.float32))
    boxes = jnp.asarray(rng.uniform(0, 50, (B, N, 4)).astype(np.float32))
    boxes = boxes.at[..., 2:].add(10)
    gids = jnp.asarray([[0, 0, 1, 1, 2, 2]], jnp.int32)
    valid = jnp.ones((B, N), bool)
    m = GARNet()
    v = m.init(jax.random.PRNGKey(0), feats, boxes, gids, valid)
    d_sim, pose, inter = m.apply(v, feats, boxes, gids, valid)
    assert d_sim.shape == (B, N, N)
    assert (np.asarray(d_sim) >= 0).all() and (np.asarray(d_sim) <= 1).all()
    assert pose[0].shape == (B, N, 4) and inter[3].shape == (B, N, 5)


def test_tran_sg_legacy(rng):
    from multimodal_gar_tpu.models.legacy import TranSG
    feats = jnp.asarray(rng.normal(size=(B, N, 512)).astype(np.float32))
    boxes = jnp.asarray(rng.uniform(0, 1, (B, N, 4)).astype(np.float32))
    valid = jnp.asarray([[True] * 5 + [False]])
    m = TranSG(num_layers=2)
    v = m.init(jax.random.PRNGKey(0), feats, boxes, valid)
    a = m.apply(v, feats, boxes, valid)
    assert a.shape == (B, N, N)
    a = np.asarray(a)
    assert (a >= 0).all() and (a <= 1 + 1e-6).all()
    assert np.allclose(a[0, 5, :], 0)      # masked row


def test_act_baseline_legacy(rng):
    from multimodal_gar_tpu.models.legacy import ActBaseline
    feats = jnp.asarray(rng.normal(size=(B, N, 256)).astype(np.float32))
    boxes = jnp.asarray(rng.uniform(0, 50, (B, N, 4)).astype(np.float32))
    boxes = boxes.at[..., 2:].add(5)
    valid = jnp.ones((B, N), bool)
    m = ActBaseline()
    v = m.init(jax.random.PRNGKey(0), feats, boxes, valid)
    a = m.apply(v, feats, boxes, valid)
    assert a.shape == (B, N, N)


def test_vgg_and_inception_backbones(rng):
    from multimodal_gar_tpu.models.backbones2d import (InceptionV3Features,
                                                       VGG16, VGG19)
    x = jnp.asarray(rng.normal(size=(1, 64, 64, 3)).astype(np.float32))
    for mk, expect_ch in ((VGG16, 512), (VGG19, 512)):
        m = mk()
        v = jax.jit(m.init)(jax.random.PRNGKey(0), x)
        (out,) = jax.jit(m.apply)(v, x)
        assert out.shape == (1, 2, 2, expect_ch)
    xi = jnp.asarray(rng.normal(size=(1, 96, 96, 3)).astype(np.float32))
    m = InceptionV3Features()
    v = jax.jit(partial(m.init, train=False))(jax.random.PRNGKey(0), xi)
    o1, o2 = jax.jit(partial(m.apply, train=False))(v, xi)
    assert o1.shape[-1] == 288 and o2.shape[-1] == 768


def test_registry_builds_models():
    from multimodal_gar_tpu.models import available_models, build_model
    cfg = tiny_config()
    assert "MGAR" in available_models()
    m = build_model(cfg, "MGAR")
    assert type(m).__name__ == "MGAR"
    assert type(build_model(cfg, "TranSG")).__name__ == "TranSG"
    with pytest.raises(KeyError):
        build_model(cfg, "nope")


def test_round3_perf_flag_variants_run():
    """Every round-3 perf-flag combination the hardware sweep
    (tools/bench_r3_flags.py) will exercise compiles and runs end-to-end
    on the tiny config: i3d_t2d, pool_approx_nsample, x_window off."""
    import dataclasses
    from functools import partial

    import jax
    import jax.numpy as jnp
    import numpy as np

    from multimodal_gar_tpu.models import MGAR
    from multimodal_gar_tpu.utils.testing import synthetic_batch, tiny_config

    base = tiny_config()
    batch = synthetic_batch(base, batch_size=1)

    def patch(x_window, t2d, pool_approx, fused=False, bf16_body=False):
        model = dataclasses.replace(
            base.model,
            lidar=dataclasses.replace(base.model.lidar, x_window=x_window,
                                      x_window_fused=fused,
                                      pool_approx_nsample=pool_approx),
            rgb=dataclasses.replace(base.model.rgb, i3d_t2d=t2d,
                                    i3d_bf16_body=bf16_body))
        return dataclasses.replace(base, model=model)

    for cfg in [patch(False, False, False), patch(True, True, False),
                patch(True, False, True),
                patch(True, False, False, fused=True, bf16_body=True)]:
        model = MGAR(cfg)
        variables = jax.jit(partial(model.init, train=False))(
            jax.random.PRNGKey(0), batch)
        out = jax.jit(partial(model.apply, train=False))(variables, batch)
        assert np.isfinite(np.asarray(out.card)).all()
