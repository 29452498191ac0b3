"""Proposal module: vote aggregation + box/objectness/semantic head.

TPU-native port of reference models/proposal_module.py:19-158 with one
deliberate redesign: ``decode_pred_box`` (reference :81-104) did a
CPU numpy round-trip *every training step* to compute box corners; here
the corners are computed in-device with closed-form math (ScanNet heading
is always 0, data/scannet/model_util_scannet.py:130-140) and kept inside
the jitted graph under ``stop_gradient`` (the reference detached them).
Head output channels: 2 objectness + 3 center + NH*2 heading +
NS*4 size + num_class semantic = 97 for the default config
(reference models/proposal_module.py:46-54).
"""
from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from spacap3d_tpu import ops
from spacap3d_tpu.models import core
from spacap3d_tpu.models.backbone import SAConfig, init_sa_module, sa_module
from spacap3d_tpu.models.core import Params, State

def head_out_dim(num_heading_bin, num_size_cluster, num_class):
    return 2 + 3 + num_heading_bin * 2 + num_size_cluster * 4 + num_class


def _agg_cfg(model_cfg) -> SAConfig:
    # reference :34-41 — [seed_feat, 128, 128, 128] with r=0.3, ns=16
    d = model_cfg.proposal_feature_dim
    return SAConfig(
        model_cfg.num_proposals, model_cfg.agg_radius, model_cfg.agg_nsample,
        [model_cfg.seed_feature_dim, d, d, d],
    )


def init_proposal(key, model_cfg):
    cfg = _agg_cfg(model_cfg)
    d = model_cfg.proposal_feature_dim
    k_agg, k0, k1, k2 = jax.random.split(key, 4)
    agg_p, agg_s = init_sa_module(k_agg, cfg)
    out_dim = head_out_dim(
        model_cfg.num_heading_bin, model_cfg.num_size_cluster, model_cfg.num_class
    )
    params = {
        "vote_aggregation": agg_p,
        "conv0": core.init_dense(k0, d, d, bias=False),
        "conv1": core.init_dense(k1, d, d, bias=False),
        "conv2": core.init_dense(k2, d, out_dim),
    }
    bn0_p, bn0_s = core.init_batch_norm(d)
    bn1_p, bn1_s = core.init_batch_norm(d)
    params["bn0"], params["bn1"] = bn0_p, bn1_p
    state = {"vote_aggregation": agg_s, "bn0": bn0_s, "bn1": bn1_s}
    return params, state


def proposal_module(
    p: Params, s: State,
    vote_xyz: jnp.ndarray, vote_features: jnp.ndarray,
    mean_size_arr: jnp.ndarray,
    model_cfg, size_decoded: bool,
    train: bool, momentum=0.1,
) -> Tuple[Dict[str, jnp.ndarray], State]:
    cfg = _agg_cfg(model_cfg)
    num_heading_bin = model_cfg.num_heading_bin
    num_size_cluster = model_cfg.num_size_cluster
    new_xyz, feats, inds, agg_s = sa_module(
        p["vote_aggregation"], s["vote_aggregation"], cfg,
        vote_xyz, vote_features, train, momentum,
    )

    out: Dict[str, jnp.ndarray] = {
        "aggregated_vote_xyz": new_xyz,           # (B, K, 3)
        "aggregated_vote_features": feats,        # (B, K, 128)
        "aggregated_vote_inds": inds,             # (B, K)
    }

    net = core.dense(p["conv0"], feats)
    net, bn0_s = core.batch_norm(p["bn0"], s["bn0"], net, train, momentum)
    net = jax.nn.relu(net)
    net = core.dense(p["conv1"], net)
    net, bn1_s = core.batch_norm(p["bn1"], s["bn1"], net, train, momentum)
    net = jax.nn.relu(net)
    net = core.dense(p["conv2"], net)             # (B, K, out_dim)

    out.update(
        decode_scores(net, new_xyz, mean_size_arr, num_heading_bin,
                      num_size_cluster, size_decoded)
    )
    out["bbox_feature"] = out["aggregated_vote_features"]
    new_state = {"vote_aggregation": agg_s, "bn0": bn0_s, "bn1": bn1_s}
    return out, new_state


def decode_scores(
    net: jnp.ndarray, base_xyz: jnp.ndarray, mean_size_arr: jnp.ndarray,
    num_heading_bin: int, num_size_cluster: int, size_decoded: bool,
) -> Dict[str, jnp.ndarray]:
    """Split head logits into box parameters (reference :106-158), and
    produce box corners in-device (replacing decode_pred_box :81-104)."""
    nh, ns = num_heading_bin, num_size_cluster
    b, k, _ = net.shape

    objectness_scores = net[..., 0:2]
    center = base_xyz + net[..., 2:5]
    heading_scores = net[..., 5:5 + nh]
    heading_residuals_normalized = net[..., 5 + nh:5 + nh * 2]
    size_scores = net[..., 5 + nh * 2:5 + nh * 2 + ns]
    size_residuals_normalized = net[..., 5 + nh * 2 + ns:5 + nh * 2 + ns * 4].reshape(
        b, k, ns, 3
    )
    sem_cls_scores = net[..., 5 + nh * 2 + ns * 4:]

    size_residuals = size_residuals_normalized * mean_size_arr[None, None]

    out = {
        "objectness_scores": objectness_scores,
        "center": center,
        "heading_scores": heading_scores,
        "heading_residuals_normalized": heading_residuals_normalized,
        "heading_residuals": heading_residuals_normalized * (jnp.pi / nh),
        "size_scores": size_scores,
        "size_residuals_normalized": size_residuals_normalized,
        "size_residuals": size_residuals,
    }

    pred_size_class = jnp.argmax(size_scores, axis=-1)                      # (B, K)
    size_recover = size_residuals + mean_size_arr[None, None]               # (B,K,NS,3)
    pred_size = jnp.take_along_axis(
        size_recover, pred_size_class[..., None, None].astype(jnp.int32), axis=2
    )[:, :, 0]                                                              # (B, K, 3)
    if size_decoded:
        out["pred_size"] = pred_size

    # Box corners: heading is always 0 on ScanNet (class2angle returns 0,
    # model_util_scannet.py:130-140), so param2obb's angle*-1 is also 0 and
    # the corners are axis-aligned. Detached like the reference (:84).
    corners = ops.get_3d_box_batch(
        jax.lax.stop_gradient(pred_size), None, jax.lax.stop_gradient(center)
    )
    out["bbox_corner"] = corners                                            # (B, K, 8, 3)
    out["sem_cls_scores"] = sem_cls_scores
    out["bbox_mask"] = jnp.argmax(objectness_scores, axis=-1)               # 0 invalid / 1 valid
    out["bbox_sems"] = jnp.argmax(sem_cls_scores, axis=-1)
    out["sem_cls"] = out["bbox_sems"]
    return out
