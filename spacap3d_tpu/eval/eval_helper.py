"""Caption evaluation harness.

Port of reference lib/eval_helper.py:24-319 (prepare_corpus,
feed_scene_cap, eval_cap): run the model's greedy decode over every
proposal, post-process with class-NMS + objectness + IoU>min_iou
matching against assigned GT boxes, decode surviving captions keyed
``scene|object_id|object_name``, back-fill undetected objects with
"sos eos", and score with BLEU/CIDEr/ROUGE/METEOR.

TPU redesign vs the reference:
  * the device part (detector + all-proposal KV-cached decode + the
    detection losses that produce object_assignment) is ONE jitted
    forward, optionally sharded over scenes on the mesh ``data`` axis;
  * IoU vs assigned GT corners is computed in-device; only ids/captions
    and small per-proposal tensors cross to the host;
  * caption and detection evaluation share the same forward pass
    (the reference runs the whole detector twice per seed,
    scripts/eval.py:462-463).

POST_DICT parity: remove_empty_box, 3D class-NMS at IoU 0.25,
per_class_proposal, conf 0.05 (lib/eval_helper.py:135-144).
"""
from __future__ import annotations

import json
import os
from typing import Dict, List, Optional, Tuple

import numpy as np

from spacap3d_tpu.config import EVAL_MIN_IOU, MAX_DES_LEN
from spacap3d_tpu.data.scannet_config import ScannetDatasetConfig
from spacap3d_tpu.data.vocabulary import Vocabulary
from spacap3d_tpu.eval import capeval
from spacap3d_tpu.eval.detection import (
    APCalculator,
    parse_groundtruths,
    parse_groundtruths_arrays,
    parse_predictions,
    parse_predictions_arrays,
)
from spacap3d_tpu.eval.detection import softmax_np as _softmax_np


def prepare_corpus(raw_data: List[dict], max_len: int = MAX_DES_LEN) -> Dict[str, List[str]]:
    """reference lib/eval_helper.py:24-44."""
    corpus: Dict[str, List[str]] = {}
    for data in raw_data:
        key = "{}|{}|{}".format(
            data["scene_id"], data["object_id"], data["object_name"]
        )
        description = "sos " + " ".join(data["token"][:max_len]) + " eos"
        corpus.setdefault(key, []).append(description)
    return corpus


def check_candidates(corpus: Dict, candidates: Dict) -> Dict:
    """Back-fill undetected objects with 'sos eos' (reference :59-69)."""
    for key in corpus:
        if key not in candidates:
            candidates[key] = ["sos eos"]
    return candidates


def organize_candidates(corpus: Dict, candidates: Dict) -> Dict:
    return {key: candidates[key] for key in corpus}


def resolve_winning_proposals(keep_row, det_ids_row, organized, scene_id):
    """{scene|obj|name key -> winning proposal index} for one scene row.

    Several NMS-surviving proposals can map to the same object key; the
    LAST one in proposal order wins the dict write (reference
    lib/eval_helper.py:150-166), so only that one needs decoding.
    Detected ids without a corpus entry are skipped."""
    final_k = {}
    for k in np.where(keep_row)[0]:
        object_id = str(int(det_ids_row[k]))
        try:
            ann_list = list(organized[scene_id][object_id].keys())
            object_name = organized[scene_id][object_id][ann_list[0]][
                "object_name"]
        except KeyError:
            continue
        final_k[f"{scene_id}|{object_id}|{object_name}"] = int(k)
    return final_k


POST_DICT_DEFAULTS = dict(
    remove_empty_box=True, use_3d_nms=True, nms_iou=0.25,
    use_old_type_nms=False, cls_nms=True, per_class_proposal=True,
    conf_thresh=0.05,
)


def postprocess_batch(out: Dict, batch: Dict, post: Dict, min_iou: float,
                      with_detection: bool = True):
    """Host-side per-batch post-processing shared by the single-seed and
    grid (mul_eval) paths: class-NMS (writes out['pred_mask']), the
    nms AND objectness mask, per-proposal IoU against the assigned GT
    box, and AP-format parsed predictions/groundtruths.

    Mirrors reference lib/eval_helper.py:135-173 + ap_helper parsing.
    Returns (nms_mask, detected_object_ids, ious, preds, gts)."""
    ep_host = dict(out)
    if "point_clouds" in batch:
        ep_host["point_clouds"] = batch["point_clouds"]
    # (the indices-mode grid ships no host point_clouds; the compact eval
    # step computes nonempty_box in-device so parsing never needs them)
    preds = parse_predictions_arrays(ep_host, post)
    nms_mask = ep_host["pred_mask"] * (out["bbox_mask"] != 0)

    assign = out["object_assignment"].astype(np.int64)          # (B, K)
    detected_object_ids = np.take_along_axis(
        batch["scene_object_ids"], assign, axis=1
    )
    gt_corners = batch["gt_box_corner_label"]                   # (B, M, 8, 3)
    assigned_corners = np.take_along_axis(
        gt_corners, assign[:, :, None, None], axis=1
    )                                                           # (B, K, 8, 3)
    mn1, mx1 = assigned_corners.min(2), assigned_corners.max(2)
    if "bbox_corner" in out:
        det_corners = out["bbox_corner"]
        mn2, mx2 = det_corners.min(2), det_corners.max(2)
    else:  # compact eval step: extents precomputed in-device (exact)
        mn2, mx2 = out["bbox_lo"], out["bbox_hi"]
    inter = np.prod(np.maximum(np.minimum(mx1, mx2) - np.maximum(mn1, mn2), 0), -1)
    v1 = np.prod(mx1 - mn1, -1)
    v2 = np.prod(mx2 - mn2, -1)
    ious = inter / (v1 + v2 - inter + 1e-8)

    gts = None
    if with_detection:
        gts = parse_groundtruths_arrays(
            {k: batch[k] for k in
             ("box_label_mask", "sem_cls_label", "gt_box_corner_label")},
            post,
        )
    return nms_mask, detected_object_ids, ious, preds, gts


def feed_scene_cap(
    eval_step,
    params, state,
    dataset,
    loader,
    vocab: Vocabulary,
    organized: Dict,
    dc: ScannetDatasetConfig,
    min_iou: float = EVAL_MIN_IOU,
    also_detection: bool = False,
    batch_to_device=None,
    attn_dump_step=None,
    save_proposal: bool = False,
    input_filter=None,
) -> Tuple[Dict, Optional[APCalculator], Dict, Dict]:
    """Runs the jitted eval forward over the loader; returns (candidates,
    APCalculator when also_detection, attention intermediates, proposal
    dumps) — the latter two mirror the reference's --save_*_attn /
    --save_proposal outputs (lib/eval_helper.py:99-121, :224-243)."""
    candidates: Dict[str, List[str]] = {}
    intermediates: Dict = {}
    proposal_dump: Dict = {}
    post = dict(POST_DICT_DEFAULTS, dataset_config=dc)
    ap_calc = APCalculator(0.5, dc.class2type) if also_detection else None

    from spacap3d_tpu.train.step import eval_input_batch
    import jax as _jax
    if input_filter is None:
        # default: ship only the keys the jitted step reads (each pytree
        # leaf is a separate host->device transfer)
        input_filter = eval_input_batch

    for batch in loader:
        dev_batch = input_filter(batch)
        if batch_to_device:
            dev_batch = batch_to_device(dev_batch)
        out = eval_step(params, state, dev_batch)
        out = _jax.device_get(out)   # one batched fetch, not per-leaf

        captions = out["lang_cap"]                       # (B, K, T) int
        bsize, num_proposals = captions.shape[:2]
        # Rows padded by the loader's wrap-around are duplicates of scenes
        # already evaluated; skip them everywhere (candidates, dumps, AP)
        # so metrics match the reference's ragged-batch protocol.
        valid = np.asarray(batch.get("__valid__", np.ones(bsize, bool))).astype(bool)

        nms_mask, detected_object_ids, ious, preds, gts = postprocess_batch(
            out, batch, post, min_iou, with_detection=ap_calc is not None
        )
        det_corners = out["bbox_corner"]
        good = ious > min_iou

        enc_attn = dec_attn = None
        if attn_dump_step is not None:
            enc_attn, dec_attn = attn_dump_step(params, state, dev_batch,
                                                out["lang_cap"])
            enc_attn = np.asarray(enc_attn)
            dec_attn = np.asarray(dec_attn)

        keep = (nms_mask == 1) & good                    # (B, K)
        for b in range(bsize):
            if not valid[b]:
                continue
            ds_idx = int(batch["dataset_idx"][b])
            scene_id = dataset.annotations[ds_idx]["scene_id"]
            final_k = resolve_winning_proposals(
                keep[b], detected_object_ids[b], organized, scene_id
            )
            any_valid = bool(final_k)
            for key, k in final_k.items():
                caption_decoded = vocab.decode(captions[b, k])
                candidates[key] = [caption_decoded]
                if attn_dump_step is not None:
                    entry = {"token": caption_decoded.split(" "),
                             "prop_id": int(k)}
                    if enc_attn.size:
                        entry["encoder_attn_weights"] = enc_attn[:, b]
                    if dec_attn.size:
                        entry["decoder_attn_weights"] = dec_attn[
                            :, b * num_proposals + k
                        ]
                    intermediates[key] = entry
            if any_valid and save_proposal:
                obj_prob = _softmax_np(out["objectness_scores"][b])[:, 1]
                proposal_dump[scene_id] = {
                    "obj_id": detected_object_ids[b],
                    "obj_mask": np.asarray(out["bbox_mask"][b]),
                    "ious": ious[b],
                    "nms_mask": nms_mask[b],
                    "box_corners": det_corners[b],
                    "class": np.asarray(out["sem_cls"][b]),
                    "objectness": obj_prob,
                    "center": np.asarray(out["center"][b]),
                }

        if ap_calc is not None:
            ap_calc.step(
                [p for p, v in zip(preds, valid) if v],
                [g for g, v in zip(gts, valid) if v],
            )

    return candidates, ap_calc, intermediates, proposal_dump


def eval_visualize(
    eval_step, params, state, dataset, loader,
    vocab: Vocabulary, organized: Dict, dc: ScannetDatasetConfig,
    out_root: str,
    scans_dir: Optional[str] = None,
    min_iou: float = EVAL_MIN_IOU,
    batch_to_device=None,
    verbose: bool = False,
    nodryrun: bool = False,
) -> Dict[str, Dict]:
    """``--eval_visualize`` (reference scripts/eval.py:247-378): for every
    scene, dump ``vis/{scene}/``:

      * ``{scene}.ply`` — the axis-aligned scene mesh when present under
        ``scans_dir`` (the reference copies ``{scene}_axis_aligned.ply``),
        else the evaluated 40k-point cloud as a point ply;
      * ``pred-{object_id}-{object_name}.ply`` — a cylinder-edge box mesh
        per NMS & objectness & IoU>min_iou surviving proposal, colored by
        ``COLORS[object_id % len(COLORS)]`` like the reference (:366-369);
      * ``predictions.json`` — {object_id: {object_name, description}}.

    ``nodryrun=False`` (the reference default) only prints the paths.
    Returns {scene_id: candidates} for testing."""
    import shutil

    from spacap3d_tpu.train.step import eval_input_batch
    from spacap3d_tpu.utils.visualize import COLORS, write_bbox, write_ply
    import jax as _jax

    post = dict(POST_DICT_DEFAULTS, dataset_config=dc)
    all_candidates: Dict[str, Dict] = {}
    for batch in loader:
        dev_batch = eval_input_batch(batch)
        if batch_to_device:
            dev_batch = batch_to_device(dev_batch)
        out = eval_step(params, state, dev_batch)
        out = _jax.device_get(out)
        captions = out["lang_cap"]
        bsize = captions.shape[0]
        valid = np.asarray(
            batch.get("__valid__", np.ones(bsize, bool))
        ).astype(bool)
        nms_mask, det_ids, ious, _, _ = postprocess_batch(
            out, batch, post, min_iou, with_detection=False
        )
        keep = (nms_mask == 1) & (ious > min_iou)
        for b in range(bsize):
            if not valid[b]:
                continue
            ds_idx = int(batch["dataset_idx"][b])
            scene_id = dataset.annotations[ds_idx]["scene_id"]
            scene_root = os.path.join(out_root, "vis", scene_id)
            if verbose:
                print(">> scene root:", scene_root)
            if nodryrun:
                os.makedirs(scene_root, exist_ok=True)
            mesh_path = os.path.join(scene_root, f"{scene_id}.ply")
            mesh_src = (
                os.path.join(scans_dir, scene_id,
                             f"{scene_id}_axis_aligned.ply")
                if scans_dir else None
            )
            if nodryrun:
                if mesh_src and os.path.exists(mesh_src):
                    shutil.copyfile(mesh_src, mesh_path)
                else:
                    write_ply(batch["point_clouds"][b, :, :3], mesh_path)
            candidates: Dict[str, Dict] = {}
            for k in np.where(keep[b])[0]:
                object_id = str(int(det_ids[b, k]))
                try:
                    ann_list = list(organized[scene_id][object_id].keys())
                    object_name = organized[scene_id][object_id][
                        ann_list[0]]["object_name"]
                except KeyError:
                    continue
                candidates[object_id] = {
                    "object_name": object_name,
                    "description": vocab.decode(captions[b, k]),
                }
                ply_path = os.path.join(
                    scene_root, f"pred-{object_id}-{object_name}.ply"
                )
                if verbose:
                    print(ply_path)
                color = COLORS[int(object_id) % len(COLORS)]
                if nodryrun:
                    write_bbox(np.asarray(out["bbox_corner"][b, k]),
                               ply_path,
                               color=tuple(int(x) for x in color))
            pred_path = os.path.join(scene_root, "predictions.json")
            if verbose:
                print("pred_path:", pred_path)
            if nodryrun:
                with open(pred_path, "w") as f:
                    json.dump(candidates, f, indent=4)
            all_candidates[scene_id] = candidates
    return all_candidates


def eval_detection(
    eval_step, params, state, loader, dc: ScannetDatasetConfig,
    ap_iou: float = 0.5, batch_to_device=None, input_filter=None,
) -> Dict:
    """Detection-only evaluation (reference scripts/eval.py:176-244
    eval_detection): parse predictions + groundtruths per batch, compute
    VOC AP/AR. Works for no-caption (VoteNet-pretrain) checkpoints."""
    from spacap3d_tpu.train.step import eval_input_batch
    import jax as _jax
    if input_filter is None:
        input_filter = eval_input_batch
    post = dict(POST_DICT_DEFAULTS, dataset_config=dc)
    calc = APCalculator(ap_iou, dc.class2type)
    for batch in loader:
        dev_batch = input_filter(batch)
        if batch_to_device:
            dev_batch = batch_to_device(dev_batch)
        out = eval_step(params, state, dev_batch)
        out = _jax.device_get(out)
        out["point_clouds"] = batch["point_clouds"]
        preds = parse_predictions_arrays(out, post)
        gts = parse_groundtruths_arrays(
            {k: batch[k] for k in
             ("box_label_mask", "sem_cls_label", "gt_box_corner_label")},
            post,
        )
        valid = np.asarray(
            batch.get("__valid__", np.ones(len(preds), bool))
        ).astype(bool)
        calc.step(
            [p for p, v in zip(preds, valid) if v],
            [g for g, v in zip(gts, valid) if v],
        )
    return calc.compute_metrics()


def organize_annotations(annotations: List[dict]) -> Dict:
    """Flat annotation list -> {scene: {obj: {ann: entry}}} (the layout of
    the reference's *_organized.json, scripts/organize_scanrefer.py)."""
    out: Dict = {}
    for ann in annotations:
        out.setdefault(ann["scene_id"], {}).setdefault(
            str(ann["object_id"]), {}
        )[str(ann.get("ann_id", 0))] = ann
    return out


def score_captions(corpus: Dict, candidates: Dict, meteor_jar: Optional[str] = None):
    """Returns the reference's (bleu, cider, rouge, meteor) tuple layout."""
    candidates = check_candidates(corpus, candidates)
    candidates = organize_candidates(corpus, candidates)
    bleu = capeval.Bleu(4).compute_score(corpus, candidates)
    cider = capeval.Cider().compute_score(corpus, candidates)
    rouge = capeval.Rouge().compute_score(corpus, candidates)
    meteor = capeval.Meteor(meteor_jar).compute_score(corpus, candidates)
    return bleu, cider, rouge, meteor, candidates


def eval_cap(
    eval_step, params, state, dataset, loader, vocab, dc,
    corpus_annotations: List[dict],
    min_iou: float = EVAL_MIN_IOU,
    also_detection: bool = False,
    corpus_cache: Optional[str] = None,
    pred_path: Optional[str] = None,
    batch_to_device=None,
    meteor_jar: Optional[str] = None,
    attn_dump_step=None,
    save_proposal: bool = False,
    dump_dir: Optional[str] = None,
    input_filter=None,
):
    """Full caption (+ optional detection) evaluation pass."""
    if corpus_cache and os.path.exists(corpus_cache):
        with open(corpus_cache) as f:
            corpus = json.load(f)
    else:
        corpus = prepare_corpus(corpus_annotations)
        if corpus_cache:
            os.makedirs(os.path.dirname(corpus_cache) or ".", exist_ok=True)
            with open(corpus_cache, "w") as f:
                json.dump(corpus, f, indent=4)

    organized = organize_annotations(corpus_annotations)
    candidates, ap_calc, intermediates, proposal_dump = feed_scene_cap(
        eval_step, params, state, dataset, loader, vocab, organized, dc,
        min_iou=min_iou, also_detection=also_detection,
        batch_to_device=batch_to_device,
        attn_dump_step=attn_dump_step, save_proposal=save_proposal,
        input_filter=input_filter,
    )
    if dump_dir and (intermediates or proposal_dump):
        import pickle
        os.makedirs(dump_dir, exist_ok=True)
        if intermediates:
            with open(os.path.join(dump_dir, "attn_weights.pkl"), "wb") as f:
                pickle.dump(intermediates, f)
        if proposal_dump:
            with open(os.path.join(dump_dir, "proposal_related.pkl"), "wb") as f:
                pickle.dump(proposal_dump, f)
    bleu, cider, rouge, meteor, candidates = score_captions(
        corpus, candidates, meteor_jar
    )
    if pred_path:
        os.makedirs(os.path.dirname(pred_path) or ".", exist_ok=True)
        with open(pred_path, "w") as f:
            json.dump(candidates, f, indent=4)

    metrics = {
        "bleu-1": bleu[0][0], "bleu-2": bleu[0][1],
        "bleu-3": bleu[0][2], "bleu-4": bleu[0][3],
        "cider": cider[0], "rouge": rouge[0], "meteor": meteor[0],
    }
    metrics["sum"] = sum(metrics.values())
    if ap_calc is not None:
        det = ap_calc.compute_metrics()
        metrics["mAP@0.5"] = det["mAP"]
        metrics["AR@0.5"] = det["AR"]
        metrics["detection"] = det
    return metrics, candidates
