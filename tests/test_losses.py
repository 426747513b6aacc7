"""Golden tests for loss semantics against torch (CPU) reference formulas."""
import numpy as np
import jax.numpy as jnp
import torch

from multimodal_gar_tpu.train import losses as L
from multimodal_gar_tpu.train.labels import partition_action_labels


def test_bce_matches_torch(rng):
    p = rng.uniform(0.01, 0.99, (5, 7)).astype(np.float32)
    t = (rng.uniform(size=(5, 7)) < 0.5).astype(np.float32)
    ours = np.asarray(L._bce(jnp.asarray(p), jnp.asarray(t)))
    ref = torch.nn.BCELoss(reduction="none")(torch.tensor(p), torch.tensor(t))
    np.testing.assert_allclose(ours, ref.numpy(), rtol=1e-5)


def test_ce_on_probs_matches_torch(rng):
    # reference feeds softmaxed outputs + multi-hot float targets into
    # torch CrossEntropyLoss (train_func.py:209)
    probs = torch.softmax(torch.tensor(rng.normal(size=(6, 4)).astype(np.float32)), -1)
    target = (torch.rand(6, 4) < 0.4).float()
    ref = torch.nn.CrossEntropyLoss()(probs, target).item()
    valid = jnp.ones((1, 6), bool)
    ours = float(L.ce_on_probs(jnp.asarray(probs.numpy())[None],
                               jnp.asarray(target.numpy())[None], valid))
    assert abs(ours - ref) < 1e-5


def test_ce_on_probs_masks_padding(rng):
    probs = jnp.asarray(rng.uniform(0.1, 0.9, (1, 4, 4)).astype(np.float32))
    target = jnp.asarray((rng.uniform(size=(1, 4, 4)) < 0.4).astype(np.float32))
    valid_all = jnp.ones((1, 4), bool)
    valid_half = jnp.asarray([[True, True, False, False]])
    full = float(L.ce_on_probs(probs, target, valid_all))
    half = float(L.ce_on_probs(probs, target, valid_half))
    expect_half = float(L.ce_on_probs(probs[:, :2], target[:, :2],
                                      jnp.ones((1, 2), bool)))
    assert abs(half - expect_half) < 1e-6
    assert abs(full - half) > 1e-8


def test_partition_action_labels_reference_semantics(rng):
    """Check against a direct transcription of train_utils.py:189-211."""
    n = 5
    a = (rng.uniform(size=(1, n, 27)) < 0.3).astype(np.float32)
    valid = np.ones((1, n), bool)
    parts = partition_action_labels(jnp.asarray(a), jnp.asarray(valid))
    a0 = a[0]
    np.testing.assert_allclose(
        np.asarray(parts[0])[0],
        np.concatenate([a0[:, :3], a0[:, 3:10].max(1, keepdims=True)], 1))
    np.testing.assert_allclose(
        np.asarray(parts[1])[0],
        np.concatenate([a0[:, 3:6], a0[:, 6:10].max(1, keepdims=True)], 1))
    np.testing.assert_allclose(np.asarray(parts[2])[0], a0[:, 6:10])
    i1 = a0[:, 11:25].max(1, keepdims=True)
    np.testing.assert_allclose(np.asarray(parts[3])[0],
                               np.concatenate([i1, 1 - i1], 1))
    np.testing.assert_allclose(
        np.asarray(parts[4])[0],
        np.concatenate([a0[:, 11:14], a0[:, 14:25].max(1, keepdims=True)], 1))
    np.testing.assert_allclose(
        np.asarray(parts[5])[0],
        np.concatenate([a0[:, 14:20], a0[:, 20:25].max(1, keepdims=True)], 1))
    np.testing.assert_allclose(np.asarray(parts[6])[0], a0[:, 20:25])


def test_gt_adjacency_and_num_groups():
    import jax
    from multimodal_gar_tpu.ops.grouping import gt_adjacency, num_groups
    sgid = jnp.asarray([3, 3, 7, 5, -1, -1], jnp.int32)
    valid = jnp.asarray([True, True, True, True, False, False])
    a = np.asarray(gt_adjacency(sgid, valid))
    expect = np.zeros((6, 6), np.float32)
    expect[:4, :4] = np.eye(4)
    expect[0, 1] = expect[1, 0] = 1
    np.testing.assert_allclose(a, expect)
    assert float(num_groups(sgid, valid)) == 3.0


def test_eig_loss_zero_for_perfect_prediction(rng):
    """If A_theta equals A_hat exactly, e^T L^T L e = 0 for zero-eigvecs."""
    sgid = np.asarray([[0, 0, 1, 1, -1]], np.int32)
    valid = np.asarray([[True] * 4 + [False]])
    from multimodal_gar_tpu.ops.grouping import gt_adjacency
    import jax
    a_hat = np.asarray(jax.vmap(gt_adjacency)(jnp.asarray(sgid),
                                              jnp.asarray(valid)))
    e, k = L.zero_eigvecs_host(a_hat[0], 4, max_vecs=5)
    assert k == 2  # two connected components -> two zero eigvecs
    loss = float(L.eig_loss(jnp.asarray(a_hat), jnp.asarray(e)[None],
                            jnp.asarray([k]), jnp.asarray(valid)))
    # first term 0; second term alpha*exp(-beta*tr(...)) > 0 but small
    assert 0 <= loss <= 1.0 + 1e-6
