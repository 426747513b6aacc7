"""Detection loss library golden tests (vs torch formulations)."""
import jax
import jax.numpy as jnp
import numpy as np
import torch

from multimodal_gar_tpu.train import loss_lib as L


def test_sigmoid_focal_matches_manual(rng):
    logits = rng.normal(size=(4, 6)).astype(np.float32)
    targets = (rng.uniform(size=(4, 6)) < 0.5).astype(np.float32)
    w = np.ones((4,), np.float32)
    ours = np.asarray(L.sigmoid_focal_loss(jnp.asarray(logits),
                                           jnp.asarray(targets),
                                           jnp.asarray(w)))
    # manual torch: alpha-weighted focal on BCE-with-logits
    t = torch.tensor(targets); x = torch.tensor(logits)
    p = torch.sigmoid(x)
    bce = torch.nn.functional.binary_cross_entropy_with_logits(
        x, t, reduction="none")
    pt = t * (1 - p) + (1 - t) * p
    ref = (0.25 * t + 0.75 * (1 - t)) * pt ** 2 * bce
    np.testing.assert_allclose(ours, ref.numpy(), rtol=1e-5, atol=1e-6)


def test_smooth_l1_matches_torch(rng):
    pred = rng.normal(size=(5, 7)).astype(np.float32)
    tgt = rng.normal(size=(5, 7)).astype(np.float32)
    beta = 1.0 / 9.0
    ours = np.asarray(L.smooth_l1_loss(jnp.asarray(pred), jnp.asarray(tgt),
                                       beta=beta))
    ref = torch.nn.functional.smooth_l1_loss(
        torch.tensor(pred), torch.tensor(tgt), reduction="none", beta=beta)
    np.testing.assert_allclose(ours, ref.numpy(), rtol=1e-5, atol=1e-6)


def test_weighted_ce(rng):
    logits = rng.normal(size=(3, 5)).astype(np.float32)
    onehot = np.eye(5, dtype=np.float32)[[0, 2, 4]]
    w = np.asarray([1.0, 0.5, 2.0], np.float32)
    ours = np.asarray(L.weighted_cross_entropy(
        jnp.asarray(logits), jnp.asarray(onehot), jnp.asarray(w)))
    ref = torch.nn.functional.cross_entropy(
        torch.tensor(logits), torch.tensor([0, 2, 4]), reduction="none")
    np.testing.assert_allclose(ours, ref.numpy() * w, rtol=1e-5)


def test_corner_loss_zero_for_identical_and_flipped():
    b = jnp.asarray([[1, 2, 0, 2, 4, 2, 0.3]], jnp.float32)
    assert float(L.corner_loss(b, b)[0]) < 1e-9
    flipped = b.at[:, 6].add(np.pi)
    assert float(L.corner_loss(b, flipped)[0]) < 1e-5


def test_gaussian_focal_runs():
    hm = jnp.zeros((1, 8, 8)).at[0, 4, 4].set(1.0)
    pred = jnp.full((1, 8, 8), 0.1)
    loss = float(L.gaussian_focal_loss(pred, hm))
    assert np.isfinite(loss) and loss > 0


def test_point_feature_encoding():
    from multimodal_gar_tpu.data.processor import encode_point_features
    pts = np.arange(20, dtype=np.float32).reshape(4, 5)
    out = encode_point_features(pts, ("x", "y", "z", "intensity"),
                                ("x", "y", "z", "pad", "intensity"))
    assert out.shape == (4, 4)
    np.testing.assert_allclose(out[:, 3], pts[:, 4])
