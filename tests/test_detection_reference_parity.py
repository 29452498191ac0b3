"""Detection-eval parity against the ACTUAL reference numpy code.

utils/nms.py, utils/box_util.py and utils/eval_det.py in the reference
are pure numpy — import them directly (stubbing the unused trimesh
dependency) and compare our NMS picks, box IoU, and VOC AP on randomized
boxes, decision for decision.
"""
import os
import sys
import types

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF, "utils")), reason="no reference"
)


@pytest.fixture(scope="module")
def ref_modules():
    # stub optional reference deps absent in this environment
    sys.modules.setdefault("trimesh", types.ModuleType("trimesh"))
    plyfile = types.ModuleType("plyfile")
    plyfile.PlyData = object
    plyfile.PlyElement = object
    sys.modules.setdefault("plyfile", plyfile)
    sys.path.insert(0, REF)
    try:
        from utils import box_util as ref_box
        from utils import eval_det as ref_eval
        from utils import nms as ref_nms
    finally:
        sys.path.pop(0)
    return ref_nms, ref_box, ref_eval


def random_boxes(rng, n):
    lo = rng.rand(n, 3) * 4
    hi = lo + 0.2 + rng.rand(n, 3) * 1.5
    return lo, hi


def test_nms_variants_match(ref_modules, rng):
    ref_nms, _, _ = ref_modules
    from spacap3d_tpu.eval.detection import nms_2d_faster, nms_3d_faster, nms_3d_faster_samecls

    for seed in range(5):
        r = np.random.RandomState(seed)
        lo, hi = random_boxes(r, 40)
        score = r.rand(40)
        cls = r.randint(0, 4, 40).astype(float)

        b3 = np.concatenate([lo, hi, score[:, None]], 1)
        assert nms_3d_faster(b3, 0.25) == ref_nms.nms_3d_faster(b3, 0.25)
        assert nms_3d_faster(b3, 0.25, True) == ref_nms.nms_3d_faster(b3, 0.25, True)

        b3c = np.concatenate([lo, hi, score[:, None], cls[:, None]], 1)
        assert nms_3d_faster_samecls(b3c, 0.25) == ref_nms.nms_3d_faster_samecls(b3c, 0.25)

        b2 = np.concatenate([lo[:, :2], hi[:, :2], score[:, None]], 1)
        assert nms_2d_faster(b2, 0.3) == ref_nms.nms_2d_faster(b2, 0.3)


def test_box_iou_matches(ref_modules, rng):
    _, ref_box, _ = ref_modules
    from spacap3d_tpu.eval.detection import box3d_iou_np
    from tests.test_detection_eval import corners_from_minmax

    for seed in range(3):
        r = np.random.RandomState(seed)
        lo, hi = random_boxes(r, 10)
        for i in range(9):
            c1 = corners_from_minmax(lo[i], hi[i])
            c2 = corners_from_minmax(lo[i + 1], hi[i + 1])
            np.testing.assert_allclose(
                box3d_iou_np(c1, c2), ref_box.box3d_iou(c1, c2), rtol=1e-12
            )


def test_voc_ap_and_eval_det_cls_match(ref_modules, rng):
    _, _, ref_eval = ref_modules
    from spacap3d_tpu.eval.detection import eval_det_cls, voc_ap
    from tests.test_detection_eval import corners_from_minmax

    r = np.random.RandomState(0)
    # random rec/prec curves
    for _ in range(3):
        rec = np.sort(r.rand(15))
        prec = r.rand(15)
        np.testing.assert_allclose(voc_ap(rec, prec), ref_eval.voc_ap(rec, prec),
                                   rtol=1e-12)
        np.testing.assert_allclose(voc_ap(rec, prec, True),
                                   ref_eval.voc_ap(rec, prec, True), rtol=1e-12)

    # full per-class PR/AP on random detections vs random GT
    for seed in range(3):
        r = np.random.RandomState(seed + 10)
        pred, gt = {}, {}
        for img in range(4):
            lo, hi = random_boxes(r, 6)
            gt[f"img{img}"] = [corners_from_minmax(lo[i], hi[i]) for i in range(3)]
            dets = []
            for i in range(6):
                jitter = r.randn(3) * 0.1
                dets.append((corners_from_minmax(lo[i] + jitter, hi[i] + jitter),
                             float(r.rand())))
            pred[f"img{img}"] = dets
        my = eval_det_cls({k: list(v) for k, v in pred.items()},
                          {k: list(v) for k, v in gt.items()}, 0.25)
        ref = ref_eval.eval_det_cls({k: list(v) for k, v in pred.items()},
                                    {k: list(v) for k, v in gt.items()}, 0.25,
                                    get_iou_func=ref_eval.get_iou_obb)
        np.testing.assert_allclose(my[0], ref[0], rtol=1e-12)  # rec
        np.testing.assert_allclose(my[1], ref[1], rtol=1e-12)  # prec
        np.testing.assert_allclose(my[2], ref[2], rtol=1e-12)  # ap
