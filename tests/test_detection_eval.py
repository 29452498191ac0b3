"""Detection-eval tests: NMS semantics, VOC AP, APCalculator end-to-end."""
import numpy as np

from spacap3d_tpu.eval.detection import (
    APCalculator,
    box3d_iou_np,
    eval_det_cls,
    nms_3d_faster,
    nms_3d_faster_samecls,
    parse_groundtruths,
    parse_predictions,
    voc_ap,
)


def corners_from_minmax(lo, hi):
    lo, hi = np.asarray(lo, float), np.asarray(hi, float)
    c = np.zeros((8, 3))
    signs = [(1, 1, 1), (1, 0, 1), (0, 0, 1), (0, 1, 1),
             (1, 1, 0), (1, 0, 0), (0, 0, 0), (0, 1, 0)]
    for i, s in enumerate(signs):
        c[i] = [hi[d] if s[d] else lo[d] for d in range(3)]
    return c


def test_nms_3d_keeps_highest_and_suppresses():
    # boxes: two heavy overlaps + one separate
    boxes = np.array([
        [0, 0, 0, 1, 1, 1, 0.9],
        [0.05, 0, 0, 1.05, 1, 1, 0.8],   # IoU ~0.9 with first -> suppressed
        [5, 5, 5, 6, 6, 6, 0.7],
    ])
    pick = nms_3d_faster(boxes, 0.25)
    assert sorted(pick) == [0, 2]


def test_nms_samecls_only_suppresses_same_class():
    boxes = np.array([
        [0, 0, 0, 1, 1, 1, 0.9, 1],
        [0.05, 0, 0, 1.05, 1, 1, 0.8, 2],  # overlapping but other class -> kept
        [0.05, 0, 0, 1.05, 1, 1, 0.7, 1],  # overlapping same class -> suppressed
    ])
    pick = nms_3d_faster_samecls(boxes, 0.25)
    assert sorted(pick) == [0, 1]


def test_voc_ap_perfect():
    rec = np.array([0.5, 1.0])
    prec = np.array([1.0, 1.0])
    assert voc_ap(rec, prec) == 1.0


def test_eval_det_cls_simple():
    gt_box = corners_from_minmax([0, 0, 0], [1, 1, 1])
    far_box = corners_from_minmax([5, 5, 5], [6, 6, 6])
    pred = {"img0": [(gt_box, 0.9), (far_box, 0.8)]}
    gt = {"img0": [gt_box]}
    rec, prec, ap = eval_det_cls(pred, gt, ovthresh=0.25)
    np.testing.assert_allclose(rec, [1.0, 1.0])
    np.testing.assert_allclose(prec, [1.0, 0.5])
    np.testing.assert_allclose(ap, 1.0)


def test_duplicate_detection_is_fp():
    gt_box = corners_from_minmax([0, 0, 0], [1, 1, 1])
    pred = {"img0": [(gt_box, 0.9), (gt_box, 0.8)]}
    gt = {"img0": [gt_box]}
    _, prec, ap = eval_det_cls(pred, gt, 0.25)
    np.testing.assert_allclose(prec, [1.0, 0.5])
    np.testing.assert_allclose(ap, 1.0)


class _DC:
    num_class = 3


def test_parse_predictions_and_ap_end_to_end(rng):
    b, k, n = 1, 4, 200
    # scene points inside two clusters
    pts = np.concatenate([
        rng.rand(n // 2, 3) * 0.8 + 0.1,            # inside box A [0,1]
        rng.rand(n // 2, 3) * 0.8 + [4.1, 4.1, 4.1]  # inside box B [4,5]
    ]).astype(np.float32)

    centers = np.array([[0.5, 0.5, 0.5], [0.55, 0.5, 0.5],
                        [4.5, 4.5, 4.5], [8.0, 8.0, 8.0]])
    sizes = np.ones((k, 3))
    corners = np.stack([
        corners_from_minmax(c - s / 2, c + s / 2) for c, s in zip(centers, sizes)
    ])[None]
    obj = np.array([[[0.0, 4.0], [0.0, 3.0], [0.0, 4.0], [0.0, 4.0]]])
    sem_scores = np.zeros((b, k, 3))
    sem_scores[0, :, 0] = 5.0  # all class 0
    ep = {
        "bbox_corner": corners,
        "sem_cls": sem_scores.argmax(-1),
        "sem_cls_scores": sem_scores,
        "objectness_scores": obj,
        "point_clouds": pts[None],
    }
    config = {
        "remove_empty_box": True, "use_3d_nms": True, "nms_iou": 0.25,
        "use_old_type_nms": False, "cls_nms": True, "per_class_proposal": True,
        "conf_thresh": 0.05, "dataset_config": _DC(),
    }
    preds = parse_predictions(ep, config)
    # proposal 1 suppressed by NMS (overlap w/ 0, lower score); proposal 3
    # removed as empty (no points inside)
    np.testing.assert_array_equal(ep["pred_mask"], [[1, 0, 1, 0]])
    # per-class proposal expansion: 2 kept boxes x 3 classes
    assert len(preds[0]) == 6

    gt_ep = {
        "box_label_mask": np.array([[1, 1, 0]]),
        "sem_cls_label": np.array([[0, 0, 0]]),
        "gt_box_corner_label": corners[:, [0, 2, 3]],
    }
    gts = parse_groundtruths(gt_ep, config)
    assert len(gts[0]) == 2

    calc = APCalculator(ap_iou_thresh=0.25, class2type_map={0: "a", 1: "b", 2: "c"})
    calc.step(preds, gts)
    metrics = calc.compute_metrics(num_workers=1)
    np.testing.assert_allclose(metrics["a Average Precision"], 1.0)
    # per-class-proposal expansion creates (empty-GT) entries for classes
    # b and c with AP 0, which the reference includes in the mean
    np.testing.assert_allclose(metrics["mAP"], 1.0 / 3.0)
    np.testing.assert_allclose(metrics["a Recall"], 1.0)


def test_iou_np():
    a = corners_from_minmax([0, 0, 0], [2, 2, 2])
    b = corners_from_minmax([1, 0, 0], [3, 2, 2])
    np.testing.assert_allclose(box3d_iou_np(a, b), 8 / 24, rtol=1e-6)


def test_calc_iou_center_size():
    from spacap3d_tpu.eval.detection import calc_iou
    a = [0, 0, 0, 2, 2, 2]
    b = [1, 0, 0, 2, 2, 2]
    np.testing.assert_allclose(calc_iou(a, b), 4 / 12, rtol=1e-6)
    np.testing.assert_allclose(calc_iou(a, a), 1.0, rtol=1e-6)


def test_nms_crnr_dist():
    from spacap3d_tpu.eval.detection import nms_crnr_dist
    b1 = corners_from_minmax([0, 0, 0], [1, 1, 1]).reshape(-1)
    b2 = corners_from_minmax([0.01, 0, 0], [1.01, 1, 1]).reshape(-1)  # near-dup
    b3 = corners_from_minmax([5, 5, 5], [6, 6, 6]).reshape(-1)
    boxes = np.stack([b1, b2, b3])
    conf = np.array([0.9, 0.8, 0.7])
    pick = nms_crnr_dist(boxes, conf, overlap_threshold=0.9)
    assert sorted(pick) == [0, 2]  # near-duplicate suppressed


def test_pred_mask_uses_precomputed_nonempty_box():
    """The eval step now computes remove_empty_box in-device
    (train/step.py ``nonempty_box``); _pred_mask must honor it and make
    the same decisions as the host point-in-box path on identical f32
    values."""
    from spacap3d_tpu.data.scannet_config import ScannetDatasetConfig
    from spacap3d_tpu.eval.detection import _pred_mask

    rng = np.random.RandomState(0)
    B, K, N = 2, 16, 500
    centers = rng.rand(B, K, 3).astype(np.float32) * 4
    # mix of clearly-populated (big) and likely-empty (tiny) boxes so the
    # remove_empty_box decision is exercised in both directions
    sizes = np.where(rng.rand(B, K, 1) > 0.5,
                     rng.rand(B, K, 3) * 2.0 + 1.0,
                     rng.rand(B, K, 3) * 0.05 + 0.01).astype(np.float32)
    signs = np.array(
        [[1, 1, 1], [1, -1, 1], [-1, -1, 1], [-1, 1, 1],
         [1, 1, -1], [1, -1, -1], [-1, -1, -1], [-1, 1, -1]], np.float32)
    corners = centers[:, :, None, :] + 0.5 * sizes[:, :, None, :] * signs
    pc = (rng.rand(B, N, 4) * 4).astype(np.float32)
    ep_base = {
        "bbox_corner": corners,
        "sem_cls": rng.randint(0, 18, (B, K)),
        "sem_cls_scores": rng.randn(B, K, 18).astype(np.float32),
        "objectness_scores": rng.randn(B, K, 2).astype(np.float32),
    }
    config = dict(remove_empty_box=True, use_3d_nms=True, nms_iou=0.25,
                  cls_nms=True, dataset_config=ScannetDatasetConfig())

    # host path (native/numpy point-in-box)
    ep_host = dict(ep_base, point_clouds=pc)
    mask_host, *_ = _pred_mask(ep_host, config)

    # device-precomputed path: same f32 compares as the eval step emits
    lo, hi = corners.min(2), corners.max(2)
    inside = ((pc[:, None, :, :3] >= lo[:, :, None, :])
              & (pc[:, None, :, :3] <= hi[:, :, None, :])).all(-1)
    nonempty = inside.sum(-1) >= 5
    ep_dev = dict(ep_base, nonempty_box=nonempty)   # note: NO point_clouds
    mask_dev, *_ = _pred_mask(ep_dev, config)
    np.testing.assert_array_equal(mask_dev, mask_host)

    # and the jitted eval step's own output matches the host computation
    import jax.numpy as jnp
    from spacap3d_tpu.train.step import make_eval_step
    from spacap3d_tpu.models import init_spacap
    from spacap3d_tpu.config import ModelConfig
    import dataclasses
    import jax
    cfg = ModelConfig(
        num_points=N, num_proposals=K, num_layers=1, num_heads=2,
        d_model=16, d_ff=32, max_des_len=5, vocab_size=32,
        sa_npoints=(64, 32, 16, 8), sa_nsamples=(8, 8, 4, 4),
        sa_widths=((8, 8, 16), (16, 16, 32), (16, 16, 32), (16, 16, 32)),
        fp_width=32, seed_feature_dim=32, proposal_feature_dim=16,
    )
    dc = ScannetDatasetConfig()
    params, state = init_spacap(jax.random.PRNGKey(0), cfg, dc.mean_size_arr)
    step = make_eval_step(cfg)
    batch = {"point_clouds": jnp.asarray(pc),
             "center_label": jnp.asarray(rng.rand(B, 128, 3), jnp.float32)}
    out = step(params, state, batch)
    assert "nonempty_box" in out
    crn = np.asarray(out["bbox_corner"])
    lo2, hi2 = crn.min(2), crn.max(2)
    inside2 = ((pc[:, None, :, :3] >= lo2[:, :, None, :])
               & (pc[:, None, :, :3] <= hi2[:, :, None, :])).all(-1)
    np.testing.assert_array_equal(
        np.asarray(out["nonempty_box"]), inside2.sum(-1) >= 5
    )
