"""Eval harness tests: AP protocol golden cases, grouping buckets, writers."""
import numpy as np

from multimodal_gar_tpu.eval.ap import (box_iou, detection_ap,
                                        interpolated_ap, set_detection_ap)
from multimodal_gar_tpu.eval.jrdb_eval import ResultAccumulator


def test_box_iou_basic():
    a = np.array([[0, 0, 2, 2]], float)
    b = np.array([[1, 1, 3, 3], [0, 0, 2, 2], [5, 5, 6, 6]], float)
    iou = box_iou(a, b)[0]
    np.testing.assert_allclose(iou, [1 / 7, 1.0, 0.0], atol=1e-9)


def test_perfect_detection_ap_is_one():
    gt = [("f0", np.array([0, 0, 10, 10.0])), ("f1", np.array([5, 5, 9, 9.0]))]
    det = [("f0", np.array([0, 0, 10, 10.0]), 0.9),
           ("f1", np.array([5, 5, 9, 9.0]), 0.8)]
    assert detection_ap(det, gt) == 1.0


def test_ap_with_false_positive():
    gt = [("f0", np.array([0, 0, 10, 10.0]))]
    det = [("f0", np.array([50, 50, 60, 60.0]), 0.95),   # FP ranked first
           ("f0", np.array([0, 0, 10, 10.0]), 0.9)]
    # recall curve: [0, 1], precision at the TP = 1/2 -> AP = 0.5
    assert abs(detection_ap(det, gt) - 0.5) < 1e-9


def test_interpolated_ap_monotone_envelope():
    r = np.array([0.5, 1.0])
    p = np.array([0.3, 0.6])
    # envelope lifts the first precision to 0.6
    assert abs(interpolated_ap(r, p) - 0.6) < 1e-9


def test_set_detection_ap_membership():
    boxes = np.array([[0, 0, 1, 1], [2, 2, 3, 3], [4, 4, 5, 5.0]])
    gt = [("f0", boxes[:2])]
    right = [("f0", boxes[:2], 0.9)]
    wrong = [("f0", boxes[:3], 0.9)]       # extra member -> size mismatch
    assert set_detection_ap(right, gt) == 1.0
    assert set_detection_ap(wrong, gt) == 0.0


def test_accumulator_end_to_end_perfect():
    """Perfect predictions -> overall grouping AP 1 and action mAP 1."""
    acc = ResultAccumulator()
    n = 4
    boxes = np.array([[i * 10, 0, i * 10 + 5, 5] for i in range(n)], float)
    valid = np.ones(n, bool)
    gt_actions = np.zeros((n, 27), np.float32)
    gt_actions[:, 2] = 1
    group_id = np.array([0, 0, 1, 1])
    scores = np.zeros((n, 27), np.float32)
    scores[:, 2] = 0.9
    acc.add_frame(0, 0, boxes, valid, gt_actions, gt_actions, group_id,
                  scores, scores, group_id)
    m = acc.evaluate_all()
    assert m["G2_AP"] == 1.0
    assert m["overall_AP"] == 1.0
    assert m["action_AP"] == 1.0
    assert m["activity_AP"] == 1.0


def test_accumulator_wrong_grouping():
    acc = ResultAccumulator()
    n = 4
    boxes = np.array([[i * 10, 0, i * 10 + 5, 5] for i in range(n)], float)
    valid = np.ones(n, bool)
    acts = np.zeros((n, 27), np.float32)
    acts[:, 0] = 1
    scores = np.zeros((n, 27), np.float32)
    scores[:, 0] = 0.5
    gt_groups = np.array([0, 0, 1, 1])
    pred_groups = np.array([0, 1, 2, 3])     # everyone alone
    acc.add_frame(0, 0, boxes, valid, acts, acts, gt_groups,
                  scores, scores, pred_groups)
    m = acc.evaluate_grouping()
    assert m["G2_AP"] == 0.0                 # no predicted pair matches


def test_group_decode_matches_reference_loop(rng):
    """decode_group_ids == the reference's threshold + first-nonzero-column
    loop (gat_model.py:1580-1592), checked against a literal python loop."""
    import jax
    import jax.numpy as jnp
    from multimodal_gar_tpu.ops.grouping import decode_group_ids
    n = 12
    a = rng.uniform(0, 1, (n, n)).astype(np.float32)
    a = (a + a.T) / 2
    valid = np.ones(n, bool)
    valid[9:] = False
    got = np.asarray(decode_group_ids(jnp.asarray(a), jnp.asarray(valid)))

    # literal reference semantics on the valid block
    tmp = a[:9, :9].copy()
    np.fill_diagonal(tmp, 1.0)
    pred = (tmp >= 0.5).astype(int)
    expect = [int(np.nonzero(row)[0][0]) for row in pred]
    np.testing.assert_array_equal(got[:9], expect)


def test_result_file_roundtrip(tmp_path):
    from multimodal_gar_tpu.eval.jrdb_eval import (read_results,
                                                   write_action_results)
    recs = [("0001:000007", np.array([1.0, 2.0, 3.0, 4.0]), 5, 0.75),
            ("0001:000008", np.array([9.5, 2.25, 30.0, 40.0]), 11, 0.5)]
    path = str(tmp_path / "action.txt")
    write_action_results(path, recs)
    back = read_results(path)
    assert len(back) == 2
    key, box, label, score = back[0]
    assert key == "0001:000007" and label == 5 and abs(score - 0.75) < 1e-9
    np.testing.assert_allclose(box, recs[0][1], atol=0.01)
