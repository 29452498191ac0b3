"""Detection evaluation: NMS, prediction/GT parsing, VOC AP.

Host-side numpy implementations matching the reference decision-for-
decision (utils/nms.py:39-150, lib/ap_helper.py:44-250,
utils/eval_det.py:21-253), with two TPU-era redesigns:

  * ``remove_empty_box`` uses a vectorized point-in-AABB test instead of
    the reference's per-box scipy Delaunay hull test
    (model_util_scannet.py:13-22). Equivalent because predicted boxes are
    axis-aligned (heading is always 0 on ScanNet), where the convex hull
    of the 8 corners IS the AABB — and orders of magnitude faster.
  * greedy NMS extracts per-box min/max corners vectorized rather than in
    python loops.

Greedy NMS semantics preserved exactly: sort ascending by score, pop the
highest, suppress others with IoU > threshold (and same class for
``cls_nms``; +1e-8 in that variant's union denominator).
"""
from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import numpy as np


def softmax_np(x: np.ndarray) -> np.ndarray:
    p = np.exp(x - x.max(axis=-1, keepdims=True))
    return p / p.sum(axis=-1, keepdims=True)


# -----------------------------------------------------------------------------
# box IoU (numpy, axis-aligned from corners)
# -----------------------------------------------------------------------------

def box3d_iou_np(corners1: np.ndarray, corners2: np.ndarray) -> float:
    """(8,3) x (8,3) -> IoU (reference utils/box_util.py:97-135)."""
    mn1, mx1 = corners1.min(0), corners1.max(0)
    mn2, mx2 = corners2.min(0), corners2.max(0)
    inter = np.prod(np.maximum(np.minimum(mx1, mx2) - np.maximum(mn1, mn2), 0))
    v1 = np.prod(mx1 - mn1)
    v2 = np.prod(mx2 - mn2)
    return inter / (v1 + v2 - inter + 1e-8)


# -----------------------------------------------------------------------------
# greedy NMS variants
# -----------------------------------------------------------------------------

def _greedy_nms(lo, hi, score, thresh, cls=None, union_eps=0.0):
    area = np.prod(hi - lo, axis=-1)
    order = np.argsort(score)  # ascending; pop from the end
    pick = []
    while order.size:
        i = int(order[-1])
        order = order[:-1]
        pick.append(i)
        if not order.size:
            break
        l = np.maximum(lo[i], lo[order])
        h = np.minimum(hi[i], hi[order])
        inter = np.prod(np.maximum(h - l, 0), axis=-1)
        o = inter / (area[i] + area[order] - inter + union_eps)
        if cls is not None:
            o = o * (cls[i] == cls[order])
        order = order[o <= thresh]
    return pick


def nms_2d_faster(boxes: np.ndarray, overlap_threshold: float, old_type=False):
    """boxes (n,5): x1,y1,x2,y2,score (reference utils/nms.py:39-69)."""
    lo = boxes[:, 0:2]
    hi = boxes[:, 2:4]
    if old_type:
        return _nms_old(lo, hi, boxes[:, 4], overlap_threshold)
    return _greedy_nms(lo, hi, boxes[:, 4], overlap_threshold)


def nms_3d_faster(boxes: np.ndarray, overlap_threshold: float, old_type=False):
    """boxes (n,7): x1,y1,z1,x2,y2,z2,score (reference :71-107)."""
    lo = boxes[:, 0:3]
    hi = boxes[:, 3:6]
    if old_type:
        return _nms_old(lo, hi, boxes[:, 6], overlap_threshold)
    return _greedy_nms(lo, hi, boxes[:, 6], overlap_threshold)


def nms_3d_faster_samecls(boxes: np.ndarray, overlap_threshold: float, old_type=False):
    """boxes (n,8): ...,score,cls — suppress only same-class overlaps
    (reference :110-150; note the 1e-8 union epsilon)."""
    lo = boxes[:, 0:3]
    hi = boxes[:, 3:6]
    return _greedy_nms(lo, hi, boxes[:, 6], overlap_threshold,
                       cls=boxes[:, 7], union_eps=1e-8)


def calc_iou(box_a, box_b):
    """Center+size AABB IoU (reference utils/metric_util.py:98-121).
    boxes: [cx, cy, cz, dx, dy, dz]."""
    a_lo = np.asarray(box_a[:3]) - np.asarray(box_a[3:6]) / 2.0
    a_hi = np.asarray(box_a[:3]) + np.asarray(box_a[3:6]) / 2.0
    b_lo = np.asarray(box_b[:3]) - np.asarray(box_b[3:6]) / 2.0
    b_hi = np.asarray(box_b[:3]) + np.asarray(box_b[3:6]) / 2.0
    inter = np.prod(np.maximum(np.minimum(a_hi, b_hi) - np.maximum(a_lo, b_lo), 0))
    va = np.prod(a_hi - a_lo)
    vb = np.prod(b_hi - b_lo)
    return inter / (va + vb - inter + 1e-8)


def bbox_corner_dist_measure(crnr1, crnr2):
    """Normalized corner-distance similarity (reference utils/pc_utils.py):
    1 - mean corner distance / diagonal."""
    crnr1 = np.asarray(crnr1).reshape(8, 3)
    crnr2 = np.asarray(crnr2).reshape(8, 3)
    dist = np.linalg.norm(crnr1 - crnr2, axis=1).mean()
    diag = np.linalg.norm(crnr1[0] - crnr1[6])
    return 1.0 - dist / (diag + 1e-8)


def nms_crnr_dist(boxes, conf, overlap_threshold):
    """Greedy NMS by corner-distance similarity (reference utils/nms.py:
    152-168): suppress boxes whose similarity to the kept box exceeds the
    threshold."""
    order = list(np.argsort(conf))
    pick = []
    while order:
        i = order.pop()
        pick.append(i)
        order = [
            j for j in order
            if bbox_corner_dist_measure(boxes[i], boxes[j]) <= overlap_threshold
        ]
    return pick


def _nms_old(lo, hi, score, thresh):
    # old_type variant: overlap = inter / area[other]
    area = np.prod(hi - lo, axis=-1)
    order = list(np.argsort(score))
    pick = []
    while order:
        i = order.pop()
        pick.append(i)
        if not order:
            break
        rest = np.array(order)
        l = np.maximum(lo[i], lo[rest])
        h = np.minimum(hi[i], hi[rest])
        inter = np.prod(np.maximum(h - l, 0), axis=-1)
        o = inter / area[rest]
        order = [j for j, ov in zip(order, o) if ov <= thresh]
    return pick


# -----------------------------------------------------------------------------
# parse predictions / groundtruths
# -----------------------------------------------------------------------------

def parse_predictions(ep: Dict[str, np.ndarray], config: Dict) -> List[List[Tuple]]:
    """reference lib/ap_helper.py:44-160. ``ep`` values are host numpy
    arrays. Writes ep['pred_mask'] and returns batch_pred_map_cls."""
    corners = np.asarray(ep["bbox_corner"])              # (B, K, 8, 3)
    bsize, k = corners.shape[:2]
    sem_cls = np.asarray(ep["sem_cls"])                  # (B, K)
    sem_probs = softmax_np(np.asarray(ep["sem_cls_scores"]))
    obj_prob = softmax_np(np.asarray(ep["objectness_scores"]))[:, :, 1]

    box_lo = corners.min(axis=2)                         # (B, K, 3)
    box_hi = corners.max(axis=2)

    nonempty = np.ones((bsize, k), bool)
    if config.get("remove_empty_box", False):
        from spacap3d_tpu.data.native import points_in_boxes_native

        pc = np.asarray(ep["point_clouds"])[:, :, :3]    # (B, N, 3)
        for i in range(bsize):
            # only counts >= 5 matters: cap lets the kernel stop early
            counts = points_in_boxes_native(pc[i], box_lo[i], box_hi[i],
                                            cap=5)
            if counts is None:
                inside = (
                    (pc[i][None, :, :] >= box_lo[i][:, None, :])
                    & (pc[i][None, :, :] <= box_hi[i][:, None, :])
                ).all(-1)                                 # (K, N)
                counts = inside.sum(-1)
            nonempty[i] = counts >= 5                     # "< 5 points" removed

    pred_mask = np.zeros((bsize, k))
    thresh = config["nms_iou"]
    for i in range(bsize):
        idx = np.where(nonempty[i])[0]
        if config.get("use_3d_nms", True) and config.get("cls_nms", True):
            boxes = np.concatenate(
                [box_lo[i, idx], box_hi[i, idx], obj_prob[i, idx, None],
                 sem_cls[i, idx, None]], axis=-1,
            )
            pick = nms_3d_faster_samecls(boxes, thresh, config.get("use_old_type_nms", False))
        elif config.get("use_3d_nms", True):
            boxes = np.concatenate(
                [box_lo[i, idx], box_hi[i, idx], obj_prob[i, idx, None]], axis=-1
            )
            pick = nms_3d_faster(boxes, thresh, config.get("use_old_type_nms", False))
        else:
            boxes = np.stack(
                [box_lo[i, idx, 0], box_lo[i, idx, 2],
                 box_hi[i, idx, 0], box_hi[i, idx, 2], obj_prob[i, idx]], axis=-1
            )
            pick = nms_2d_faster(boxes, thresh, config.get("use_old_type_nms", False))
        assert len(pick) > 0
        pred_mask[i, idx[pick]] = 1
    ep["pred_mask"] = pred_mask

    conf_thresh = config.get("conf_thresh", 0.05)
    num_class = config["dataset_config"].num_class
    batch_pred_map_cls = []
    for i in range(bsize):
        keep = [j for j in range(k)
                if pred_mask[i, j] == 1 and obj_prob[i, j] > conf_thresh]
        if config.get("per_class_proposal", True):
            cur = []
            for c in range(num_class):
                cur += [(c, corners[i, j], sem_probs[i, j, c] * obj_prob[i, j])
                        for j in keep]
            batch_pred_map_cls.append(cur)
        else:
            batch_pred_map_cls.append(
                [(int(sem_cls[i, j]), corners[i, j], obj_prob[i, j]) for j in keep]
            )
    return batch_pred_map_cls


def parse_groundtruths(ep: Dict[str, np.ndarray], config: Dict) -> List[List[Tuple]]:
    """reference lib/ap_helper.py:163-192."""
    box_mask = np.asarray(ep["box_label_mask"])
    sem_label = np.asarray(ep["sem_cls_label"])
    gt_corners = np.asarray(ep["gt_box_corner_label"])
    bsize = sem_label.shape[0]
    out = []
    for i in range(bsize):
        out.append(
            [(int(sem_label[i, j]), gt_corners[i, j])
             for j in range(gt_corners.shape[1]) if box_mask[i, j] == 1]
        )
    return out


# -----------------------------------------------------------------------------
# VOC AP
# -----------------------------------------------------------------------------

def voc_ap(rec: np.ndarray, prec: np.ndarray, use_07_metric=False) -> float:
    """reference utils/eval_det.py:21-52."""
    if use_07_metric:
        ap = 0.0
        for t in np.arange(0.0, 1.1, 0.1):
            p = np.max(prec[rec >= t]) if np.sum(rec >= t) > 0 else 0
            ap += p / 11.0
        return ap
    mrec = np.concatenate(([0.0], rec, [1.0]))
    mpre = np.concatenate(([0.0], prec, [0.0]))
    for i in range(mpre.size - 1, 0, -1):
        mpre[i - 1] = np.maximum(mpre[i - 1], mpre[i])
    idx = np.where(mrec[1:] != mrec[:-1])[0]
    return float(np.sum((mrec[idx + 1] - mrec[idx]) * mpre[idx + 1]))


def eval_det_cls(pred: Dict, gt: Dict, ovthresh=0.25, use_07_metric=False):
    """Per-class precision/recall/AP (reference utils/eval_det.py:73-158).

    pred: {img_id: [(corners, score)]}, gt: {img_id: [corners]}."""
    class_recs = {}
    npos = 0
    for img_id, boxes in gt.items():
        gtb = np.array(boxes)
        rec = {"bbox": gtb, "det": [False] * len(boxes)}
        if len(boxes):
            # cached per-GT AABBs: the greedy loop below computes each
            # det's IoU against ALL of an image's GTs in one vectorized
            # step (the reference called box3d_iou per pair in python,
            # utils/eval_det.py:113-121 — decision-identical, ~30x faster)
            rec["mn"] = gtb.astype(float).min(axis=1)      # (G, 3)
            rec["mx"] = gtb.astype(float).max(axis=1)
            rec["vol"] = np.prod(rec["mx"] - rec["mn"], -1)
        class_recs[img_id] = rec
        npos += len(boxes)
    for img_id in pred:
        if img_id not in class_recs:
            class_recs[img_id] = {"bbox": np.array([]), "det": []}

    image_ids, confidence, bbs = [], [], []
    for img_id, dets in pred.items():
        for box, score in dets:
            image_ids.append(img_id)
            confidence.append(score)
            bbs.append(box)
    confidence = np.array(confidence)
    order = np.argsort(-confidence)
    image_ids = [image_ids[i] for i in order]
    bbs = [bbs[i] for i in order]

    nd = len(image_ids)
    tp = np.zeros(nd)
    fp = np.zeros(nd)
    for d in range(nd):
        rec = class_recs[image_ids[d]]
        gtb = rec["bbox"]
        ovmax, jmax = -np.inf, -1
        if gtb.shape[0]:
            bb = np.asarray(bbs[d], float)
            mn1, mx1 = bb.min(0), bb.max(0)
            inter = np.prod(
                np.maximum(np.minimum(mx1, rec["mx"]) - np.maximum(mn1, rec["mn"]), 0),
                -1,
            )
            v1 = np.prod(mx1 - mn1)
            iou = inter / (v1 + rec["vol"] - inter + 1e-8)
            # argmax takes the FIRST maximum — same tie-break as the
            # reference's strict `iou > ovmax` scan
            jmax = int(np.argmax(iou))
            ovmax = iou[jmax]
        if ovmax > ovthresh:
            if not rec["det"][jmax]:
                tp[d] = 1.0
                rec["det"][jmax] = True
            else:
                fp[d] = 1.0
        else:
            fp[d] = 1.0

    fp = np.cumsum(fp)
    tp = np.cumsum(tp)
    recall = tp / float(npos + 1e-8)
    precision = tp / np.maximum(tp + fp, np.finfo(np.float64).eps)
    return recall, precision, voc_ap(recall, precision, use_07_metric)


def _eval_cls_worker(args):
    return eval_det_cls(*args)


def eval_det(pred_all: Dict, gt_all: Dict, ovthresh=0.25, use_07_metric=False,
             num_workers: int = 10):
    """Multi-class AP; classes evaluated in a process pool like the
    reference (utils/eval_det.py:207-253, Pool(10))."""
    pred: Dict = {}
    gt: Dict = {}
    for img_id, dets in pred_all.items():
        for classname, bbox, score in dets:
            pred.setdefault(classname, {}).setdefault(img_id, []).append((bbox, score))
            gt.setdefault(classname, {}).setdefault(img_id, [])
    for img_id, gts in gt_all.items():
        for classname, bbox in gts:
            gt.setdefault(classname, {}).setdefault(img_id, []).append(bbox)

    rec, prec, ap = {}, {}, {}
    todo = [c for c in gt if c in pred]
    args = [(pred[c], gt[c], ovthresh, use_07_metric) for c in todo]
    if num_workers > 1 and len(todo) > 1:
        # spawn (not fork): fork is unsafe in a process with live JAX threads
        from multiprocessing import get_context
        with get_context("spawn").Pool(processes=min(num_workers, len(todo))) as pool:
            results = pool.map(_eval_cls_worker, args)
    else:
        results = [eval_det_cls(*a) for a in args]
    for c, (r, p, a) in zip(todo, results):
        rec[c], prec[c], ap[c] = r, p, a
    for c in gt:
        if c not in pred:
            rec[c], prec[c], ap[c] = 0, 0, 0
    return rec, prec, ap


class APCalculator:
    """Accumulates per-scan predictions/GTs, computes mAP/AR
    (reference lib/ap_helper.py:195-250)."""

    def __init__(self, ap_iou_thresh=0.25, class2type_map=None):
        self.ap_iou_thresh = ap_iou_thresh
        self.class2type_map = class2type_map
        self.reset()

    def step(self, batch_pred_map_cls, batch_gt_map_cls):
        assert len(batch_pred_map_cls) == len(batch_gt_map_cls)
        for pred, gt in zip(batch_pred_map_cls, batch_gt_map_cls):
            self.gt_map_cls[self.scan_cnt] = gt
            self.pred_map_cls[self.scan_cnt] = pred
            self.scan_cnt += 1

    def compute_metrics(self, num_workers: int = 10):
        rec, _, ap = eval_det(
            self.pred_map_cls, self.gt_map_cls, ovthresh=self.ap_iou_thresh,
            num_workers=num_workers,
        )
        ret = {}
        for key in sorted(ap.keys()):
            name = self.class2type_map[key] if self.class2type_map else str(key)
            ret[f"{name} Average Precision"] = ap[key]
        ret["mAP"] = np.mean(list(ap.values()))
        rec_list = []
        for key in sorted(ap.keys()):
            name = self.class2type_map[key] if self.class2type_map else str(key)
            try:
                ret[f"{name} Recall"] = rec[key][-1]
                rec_list.append(rec[key][-1])
            except (TypeError, IndexError):
                ret[f"{name} Recall"] = 0
                rec_list.append(0)
        ret["AR"] = np.mean(rec_list)
        return ret

    def reset(self):
        self.gt_map_cls = {}
        self.pred_map_cls = {}
        self.scan_cnt = 0
