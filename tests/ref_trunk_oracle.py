"""Slow, obviously-correct numpy oracle of the REFERENCE detector trunk.

Re-implements, straight from the reference source and operating directly
on a torch checkpoint's state dict (so it is fully independent of this
repo's converter and model code):

  * Pointnet2Backbone 4xSA + 2xFP (models/backbone_module.py:75-129,
    lib/pointnet2/pointnet2_modules.py:212-276 PointnetSAModuleVotes,
    :361-421 PointnetFPModule, pointnet2_utils.py:293-380 QueryAndGroup)
  * the CUDA kernel semantics (SURVEY.md §2.1): FPS seed 0 with the
    ||p||^2<=1e-3 skip (sampling_gpu.cu:86-172), ball query strict
    d^2 < r^2 / first-nsample-in-order / repeat-first-hit padding
    (ball_query_gpu.cu:9-54), three_nn squared distances
    (interpolate_gpu.cu:9-68)
  * VotingModule (models/voting_module.py:34-61) + the SpaCapNet vote
    feature L2 norm (models/SpaCapNet.py:66-67)
  * ProposalModule: vote aggregation SA + Conv-BN-ReLU head +
    decode_scores + decode_pred_box corners via param2obb_batch /
    get_3d_box_batch with heading 0 (models/proposal_module.py:57-158,
    utils/box_util.py:361-383, model_util_scannet.py:156-172)

All BatchNorms run in eval mode (checkpoint running stats, eps 1e-5).
Architecture sizes (npoint/radius/nsample) are runtime parameters, not
weight shapes, so the oracle can run the real weights at reduced point
counts for test speed.
"""
from __future__ import annotations

import numpy as np


# ----------------------------------------------------------------------------
# kernel-semantics primitives
# ----------------------------------------------------------------------------

def fps_np(xyz: np.ndarray, npoint: int) -> np.ndarray:
    """(N,3) -> (npoint,) int32. Seed index 0; points with ||p||^2<=1e-3
    are never selected (padding skip); first-index wins ties."""
    n = xyz.shape[0]
    mind = np.full(n, 1e10, np.float32)
    valid = (xyz.astype(np.float32) ** 2).sum(-1) > 1e-3
    out = [0]
    last = 0
    for _ in range(1, npoint):
        d = ((xyz - xyz[last]).astype(np.float32) ** 2).sum(-1)
        mind = np.where(valid, np.minimum(mind, d), mind)
        score = np.where(valid, mind, -1.0)
        last = int(np.argmax(score))
        out.append(last)
    return np.asarray(out, np.int32)


def ball_query_np(xyz: np.ndarray, centers: np.ndarray, radius: float,
                  nsample: int) -> np.ndarray:
    """(N,3),(M,3) -> (M,nsample) int32: first nsample indices (in point
    order) with d^2 strictly < r^2; the first hit fills unvisited slots;
    all-zero row when no hit."""
    m = centers.shape[0]
    out = np.zeros((m, nsample), np.int32)
    d2 = ((centers[:, None, :] - xyz[None, :, :]) ** 2).sum(-1)  # (M, N)
    hit = d2 < radius * radius
    for j in range(m):
        idx = np.nonzero(hit[j])[0]
        if idx.size == 0:
            continue
        take = idx[:nsample]
        out[j, :] = take[0]
        out[j, : take.size] = take
    return out


def three_nn_np(unknown: np.ndarray, known: np.ndarray):
    """(n,3),(m,3) -> (dist2 (n,3), idx (n,3)); stable (low-index) ties."""
    d2 = ((unknown[:, None, :] - known[None, :, :]) ** 2).sum(-1)
    idx = np.argsort(d2, axis=1, kind="stable")[:, :3]
    return np.take_along_axis(d2, idx, axis=1), idx.astype(np.int32)


# ----------------------------------------------------------------------------
# layers (weights straight from the torch state dict)
# ----------------------------------------------------------------------------

def _np(t):
    return np.asarray(t, np.float32) if not hasattr(t, "numpy") else t.numpy().astype(np.float32)


class RefTrunkOracle:
    def __init__(
        self, state_dict, mean_size_arr: np.ndarray,
        sa_npoints=(2048, 1024, 512, 256),
        sa_radii=(0.2, 0.4, 0.8, 1.2),
        sa_nsamples=(64, 32, 16, 16),
        num_proposal=256, agg_radius=0.3, agg_nsample=16,
        num_heading_bin=1, num_size_cluster=18,
    ):
        self.sd = {k: _np(v) for k, v in state_dict.items()
                   if not k.endswith("num_batches_tracked")}
        self.mean_size_arr = np.asarray(mean_size_arr, np.float32)
        self.sa_npoints = sa_npoints
        self.sa_radii = sa_radii
        self.sa_nsamples = sa_nsamples
        self.num_proposal = num_proposal
        self.agg_radius = agg_radius
        self.agg_nsample = agg_nsample
        self.nh = num_heading_bin
        self.ns = num_size_cluster

    # -- primitives over state-dict prefixes ---------------------------------

    def _conv(self, prefix, x, bias=True):
        """1x1 Conv over channel-last x: (..., Cin) -> (..., Cout)."""
        w = self.sd[f"{prefix}.weight"]
        while w.ndim > 2:
            w = w[..., 0]
        y = x @ w.T
        if bias and f"{prefix}.bias" in self.sd:
            y = y + self.sd[f"{prefix}.bias"]
        return y

    def _bn_eval(self, prefix, x, eps=1e-5):
        mean = self.sd[f"{prefix}.running_mean"]
        var = self.sd[f"{prefix}.running_var"]
        w = self.sd[f"{prefix}.weight"]
        b = self.sd[f"{prefix}.bias"]
        return (x - mean) / np.sqrt(var + eps) * w + b

    def _shared_mlp(self, prefix, x):
        i = 0
        while f"{prefix}.layer{i}.conv.weight" in self.sd:
            x = self._conv(f"{prefix}.layer{i}.conv", x, bias=False)
            x = self._bn_eval(f"{prefix}.layer{i}.bn.bn", x)
            x = np.maximum(x, 0.0)
            i += 1
        assert i > 0, prefix
        return x

    def _sa(self, prefix, xyz, feats, npoint, radius, nsample):
        """PointnetSAModuleVotes: FPS -> gather -> QueryAndGroup
        (center-subtract, /radius) -> SharedMLP -> max over nsample."""
        inds = fps_np(xyz, npoint)
        new_xyz = xyz[inds]
        idx = ball_query_np(xyz, new_xyz, radius, nsample)
        grouped_xyz = (xyz[idx] - new_xyz[:, None, :]) / radius
        grouped = np.concatenate([grouped_xyz, feats[idx]], axis=-1) \
            if feats is not None else grouped_xyz
        h = self._shared_mlp(prefix, grouped)        # (npoint, nsample, C)
        return new_xyz, h.max(axis=1), inds

    def _fp(self, prefix, unknown, known, unknown_feats, known_feats):
        dist2, idx = three_nn_np(unknown, known)
        recip = 1.0 / (dist2 + 1e-8)                 # note: SQUARED dists
        weight = recip / recip.sum(axis=1, keepdims=True)
        interp = (known_feats[idx] * weight[..., None]).sum(axis=1)
        cat = np.concatenate([interp, unknown_feats], axis=-1)
        return self._shared_mlp(prefix, cat)

    # -- the trunk (single scene, no batch dim) ------------------------------

    def forward(self, point_cloud: np.ndarray) -> dict:
        """point_cloud: (N, 3+D) -> endpoints dict (single scene)."""
        xyz = point_cloud[:, :3].astype(np.float32)
        feats = point_cloud[:, 3:].astype(np.float32) \
            if point_cloud.shape[1] > 3 else None
        ep = {}

        for i in range(4):
            xyz, feats, inds = self._sa(
                f"backbone_net.sa{i + 1}.mlp_module", xyz, feats,
                self.sa_npoints[i], self.sa_radii[i], self.sa_nsamples[i],
            )
            ep[f"sa{i + 1}_xyz"], ep[f"sa{i + 1}_features"] = xyz, feats
            ep[f"sa{i + 1}_inds"] = inds

        f_fp1 = self._fp("backbone_net.fp1.mlp", ep["sa3_xyz"], ep["sa4_xyz"],
                         ep["sa3_features"], ep["sa4_features"])
        f_fp2 = self._fp("backbone_net.fp2.mlp", ep["sa2_xyz"], ep["sa3_xyz"],
                         ep["sa2_features"], f_fp1)
        ep["fp2_xyz"] = ep["sa2_xyz"]
        ep["fp2_features"] = f_fp2
        ep["fp2_inds"] = ep["sa1_inds"][: ep["fp2_xyz"].shape[0]]

        # voting (models/voting_module.py:34-61)
        net = np.maximum(self._bn_eval("vgen.bn1", self._conv("vgen.conv1", f_fp2)), 0)
        net = np.maximum(self._bn_eval("vgen.bn2", self._conv("vgen.conv2", net)), 0)
        net = self._conv("vgen.conv3", net)          # (M, 3+C)
        vote_xyz = ep["fp2_xyz"] + net[:, :3]
        vote_feats = f_fp2 + net[:, 3:]
        # SpaCapNet L2 norm (models/SpaCapNet.py:66-67)
        vote_feats = vote_feats / np.linalg.norm(vote_feats, axis=-1, keepdims=True)
        ep["vote_xyz"], ep["vote_features"] = vote_xyz, vote_feats

        # proposal (models/proposal_module.py:57-158)
        agg_xyz, agg_feats, agg_inds = self._sa(
            "proposal.vote_aggregation.mlp_module", vote_xyz, vote_feats,
            self.num_proposal, self.agg_radius, self.agg_nsample,
        )
        ep["aggregated_vote_xyz"] = agg_xyz
        ep["aggregated_vote_features"] = agg_feats
        ep["aggregated_vote_inds"] = agg_inds

        net = np.maximum(self._bn_eval("proposal.proposal.1",
                                       self._conv("proposal.proposal.0", agg_feats, bias=False)), 0)
        net = np.maximum(self._bn_eval("proposal.proposal.4",
                                       self._conv("proposal.proposal.3", net, bias=False)), 0)
        net = self._conv("proposal.proposal.6", net)  # (K, 97)

        nh, ns = self.nh, self.ns
        k = net.shape[0]
        ep["objectness_scores"] = net[:, 0:2]
        ep["center"] = agg_xyz + net[:, 2:5]
        ep["heading_scores"] = net[:, 5:5 + nh]
        ep["heading_residuals"] = net[:, 5 + nh:5 + nh * 2] * (np.pi / nh)
        ep["size_scores"] = net[:, 5 + nh * 2:5 + nh * 2 + ns]
        size_res_norm = net[:, 5 + nh * 2 + ns:5 + nh * 2 + ns * 4].reshape(k, ns, 3)
        ep["size_residuals"] = size_res_norm * self.mean_size_arr[None]
        ep["sem_cls_scores"] = net[:, 5 + nh * 2 + ns * 4:]
        ep["bbox_mask"] = ep["objectness_scores"].argmax(-1)
        ep["sem_cls"] = ep["sem_cls_scores"].argmax(-1)

        # decode_pred_box (:81-104): param2obb_batch + get_3d_box_batch.
        # heading class2angle is always 0 on ScanNet, *-1 stays 0 -> R = I.
        size_cls = ep["size_scores"].argmax(-1)
        size_res = np.take_along_axis(
            ep["size_residuals"], size_cls[:, None, None], axis=1
        )[:, 0]
        box_size = self.mean_size_arr[size_cls] + size_res      # class2size
        l, w, h = box_size[:, 0:1], box_size[:, 1:2], box_size[:, 2:3]
        corners = np.zeros((k, 8, 3), np.float32)
        corners[..., 0] = np.concatenate(
            (l / 2, l / 2, -l / 2, -l / 2, l / 2, l / 2, -l / 2, -l / 2), -1)
        corners[..., 1] = np.concatenate(
            (w / 2, -w / 2, -w / 2, w / 2, w / 2, -w / 2, -w / 2, w / 2), -1)
        corners[..., 2] = np.concatenate(
            (h / 2, h / 2, h / 2, h / 2, -h / 2, -h / 2, -h / 2, -h / 2), -1)
        ep["bbox_corner"] = corners + ep["center"][:, None, :]
        return ep
