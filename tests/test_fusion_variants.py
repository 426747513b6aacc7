"""All fusion variants / modalities / similarity learners run end-to-end.

Exercises GARFusionNet directly on synthetic per-person features (the
backbones are covered by test_model_forward) so each variant compiles in
seconds instead of recompiling I3D + the sparse backbone.
"""
import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_gar_tpu.models import GARFusionNet
from tests.util import tiny_config

B, N, D = 2, 8, 512


def _inputs(seed=0):
    rng = np.random.default_rng(seed)
    rgb = jnp.asarray(rng.normal(size=(B, N, D)).astype(np.float32))
    lidar = jnp.asarray(rng.normal(size=(B, N, D)).astype(np.float32))
    boxes2d = np.zeros((B, N, 4), np.float32)
    xy = rng.uniform(0, 50, (B, N, 2))
    boxes2d[..., :2] = xy
    boxes2d[..., 2:] = xy + rng.uniform(4, 10, (B, N, 2))
    boxes3d = np.zeros((B, N, 7), np.float32)
    boxes3d[..., :3] = rng.uniform(-4, 4, (B, N, 3))
    boxes3d[..., 3:6] = 1.0
    valid = np.zeros((B, N), bool)
    valid[:, :5] = True
    return (rgb, lidar, jnp.asarray(boxes2d * valid[..., None]),
            jnp.asarray(boxes3d * valid[..., None]), jnp.asarray(valid))


def _run(**fusion_overrides):
    cfg = tiny_config()
    mcfg = dataclasses.replace(
        cfg.model, fusion=dataclasses.replace(cfg.model.fusion,
                                              **fusion_overrides))
    rgb, lidar, b2, b3, valid = _inputs()
    if mcfg.fusion.modality == "RGB":
        lidar = None
    elif mcfg.fusion.modality == "LiDAR":
        rgb = None
    net = GARFusionNet(mcfg)
    v = net.init(jax.random.PRNGKey(0), rgb, lidar, b2, b3, valid, False)
    out = net.apply(v, rgb, lidar, b2, b3, valid, False)
    a = np.asarray(out.a_theta)
    assert np.isfinite(a).all()
    assert (a >= 0).all() and (a <= 1 + 1e-6).all()
    invalid = ~np.asarray(valid)
    assert np.allclose(a[invalid], 0)
    return out


@pytest.mark.parametrize("fusion,feature_dim", [
    ("sum", 512),
    ("concat", 1024),
    ("crossAtt", 1024),
    ("catandAtt", 1024),
    ("Attention_normal", 1024),
    ("Attention_gaussian", 1024),
    ("Attention_multi", 1024),
    ("Attention_MMCA_sty", 1024),
    ("Attention_pe", 1024),
])
def test_fusion_variant_forward(fusion, feature_dim):
    _run(fusion=fusion, feature_dim=feature_dim)


@pytest.mark.parametrize("social_layer", ["mlp", "encoder"])
def test_social_layer_variants(social_layer):
    """Social_Layer / Social_Encoder (gat_model.py:1144-1147): Dv must come
    from the transformed features — outputs change vs the plain cosine path
    while remaining valid adjacency matrices."""
    out_plain = _run()
    out_social = _run(social_layer=social_layer)
    assert not np.allclose(np.asarray(out_plain.a_theta),
                           np.asarray(out_social.a_theta))


def test_attention_pe_position_sensitivity():
    """Attention_pe concatenates bbox centers into Q/K — moving the actors
    (without changing De... actually De changes too, but pe has NO distance
    prior, so sensitivity must come through the positional concat)."""
    cfg = tiny_config()
    mcfg = dataclasses.replace(
        cfg.model, fusion=dataclasses.replace(cfg.model.fusion,
                                              fusion="Attention_pe",
                                              feature_dim=1024))
    rgb, lidar, b2, b3, valid = _inputs()
    net = GARFusionNet(mcfg)
    v = net.init(jax.random.PRNGKey(0), rgb, lidar, b2, b3, valid, False)
    out1 = net.apply(v, rgb, lidar, b2, b3, valid, False)
    # shift only x/y centers; pe layers see centers, De ignored by pe
    b3_shift = b3.at[:, :, :2].add(3.0 * jnp.asarray(
        np.random.default_rng(1).normal(size=(B, N, 2)).astype(np.float32)))
    out2 = net.apply(v, rgb, lidar, b2, b3_shift, valid, False)
    assert not np.allclose(np.asarray(out1.fused_features),
                           np.asarray(out2.fused_features))


@pytest.mark.parametrize("modality", ["RGB", "LiDAR"])
def test_single_modality(modality):
    _run(modality=modality, feature_dim=512)


@pytest.mark.parametrize("sim", ["Graph", "Graph2", "Graph3", "Graph4"])
def test_similarity_learners(sim):
    _run(sim=sim)


def test_non_euclidean_adjacency_head():
    _run(euclidean=False)


def test_sg_feat_org_and_no_ind_concat():
    _run(sg_feat_org=True, ind_action_concat=False, feature_dim=1024)


def test_dafm_distance_sensitivity():
    """The DAFM prior must change outputs when De changes (distance-aware)."""
    cfg = tiny_config()
    rgb, lidar, b2, b3, valid = _inputs()
    net = GARFusionNet(cfg.model)
    v = net.init(jax.random.PRNGKey(0), rgb, lidar, b2, b3, valid, False)
    out1 = net.apply(v, rgb, lidar, b2, b3, valid, False)
    b3_far = b3.at[:, :, :3].multiply(10.0)
    out2 = net.apply(v, rgb, lidar, b2, b3_far, valid, False)
    assert not np.allclose(np.asarray(out1.fused_features),
                           np.asarray(out2.fused_features))
