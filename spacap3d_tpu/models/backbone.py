"""PointNet++ backbone: set-abstraction (SA) and feature-propagation (FP)
layers, composed into the 4xSA + 2xFP VoteNet backbone.

TPU-native redesign of reference models/backbone_module.py:11-129 +
lib/pointnet2/pointnet2_modules.py:165-276 (PointnetSAModuleVotes) and
:361-421 (PointnetFPModule):

  * channel-last layout everywhere — the shared MLPs become batched Dense
    layers whose contractions map straight onto the MXU;
  * SA = FPS -> gather -> ball-query -> group (center-subtract, /radius)
    -> SharedMLP -> max over neighbors;
  * SA2-4 skip FPS: their inputs are already in FPS order, so FPS returns
    the identity permutation (observed in the reference,
    models/backbone_module.py:105 "this fps_inds is just 0,1,...,1023");
    we exploit that instead of re-running the sequential kernel;
  * FP = 3-NN inverse-squared-distance interpolation + skip concat +
    SharedMLP (weights use 1/(d^2+1e-8) like the reference,
    pointnet2_modules.py:399-402 — d is the *squared* distance).
"""
from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from spacap3d_tpu import ops
from spacap3d_tpu.models import core
from spacap3d_tpu.models.core import Params, RngStream, State


# -----------------------------------------------------------------------------
# SharedMLP: stack of [dense(no bias) + BN + ReLU]
# -----------------------------------------------------------------------------

def init_shared_mlp(key, dims: List[int]):
    params, state = {}, {}
    keys = jax.random.split(key, len(dims) - 1)
    for i in range(len(dims) - 1):
        layer = {"conv": core.init_dense(keys[i], dims[i], dims[i + 1], bias=False, init="kaiming")}
        bn_p, bn_s = core.init_batch_norm(dims[i + 1])
        layer["bn"] = bn_p
        params[f"layer{i}"] = layer
        state[f"layer{i}"] = {"bn": bn_s}
    return params, state


def shared_mlp(p: Params, s: State, x, train, momentum=0.1) -> Tuple[jnp.ndarray, State]:
    new_s = {}
    for i in range(len(p)):
        name = f"layer{i}"
        x = core.dense(p[name]["conv"], x)
        x, bn_s = core.batch_norm(p[name]["bn"], s[name]["bn"], x, train, momentum)
        x = jax.nn.relu(x)
        new_s[name] = {"bn": bn_s}
    return x, new_s


# -----------------------------------------------------------------------------
# Set abstraction
# -----------------------------------------------------------------------------

class SAConfig:
    def __init__(self, npoint, radius, nsample, mlp, use_xyz=True, normalize_xyz=True,
                 fps_identity=False):
        self.npoint = npoint
        self.radius = radius
        self.nsample = nsample
        self.mlp = list(mlp)
        self.use_xyz = use_xyz
        self.normalize_xyz = normalize_xyz
        self.fps_identity = fps_identity

    @property
    def mlp_dims(self):
        dims = list(self.mlp)
        if self.use_xyz:
            dims[0] += 3
        return dims


def init_sa_module(key, cfg: SAConfig):
    p, s = init_shared_mlp(key, cfg.mlp_dims)
    return {"mlp_module": p}, {"mlp_module": s}


def sa_module(
    p: Params, s: State, cfg: SAConfig,
    xyz: jnp.ndarray, features: Optional[jnp.ndarray],
    train: bool, momentum=0.1, inds: Optional[jnp.ndarray] = None,
):
    """xyz (B,N,3), features (B,N,C) or None ->
    (new_xyz (B,np,3), new_features (B,np,mlp[-1]), inds (B,np) int32, state)."""
    b, n, _ = xyz.shape
    if inds is None:
        if cfg.fps_identity:
            inds = jnp.broadcast_to(jnp.arange(cfg.npoint, dtype=jnp.int32), (b, cfg.npoint))
        else:
            inds = ops.furthest_point_sample(xyz, cfg.npoint)
    new_xyz = ops.gather_points(xyz, inds)

    idx = ops.ball_query(xyz, new_xyz, cfg.radius, cfg.nsample)
    # single fused neighbor gather (xyz ++ features in one row) — two
    # separate small-row gathers profiled ~2x slower on TPU.
    # (Splitting the first MLP matmul so the xyz++feature concat never
    # materializes — ((gx-c)/r)@W_xyz + gf@W_feat — was measured NEUTRAL
    # at SA2-4 and a 0.7 ms/step REGRESSION at SA1: XLA reconstructs the
    # (B, npoint, nsample, 3+C) tensor anyway to assemble the gather's
    # backward scatter update, and SA1's 1-channel feature matmul is
    # pathological. Folding the center-subtract into the matmul bias is
    # numerically unsafe under the TPU's bf16 matmul inputs: it rounds
    # ABSOLUTE coordinates, losing the small offsets to cancellation.)
    if features is not None and cfg.use_xyz:
        # fused assembly with a custom VJP (ops/grouping.py::
        # group_and_localize): forward bit-identical to the composed
        # gather/slice/concat; the backward replaces autodiff's
        # re-materialized slice+concat around the (B, np, ns, 3+C)
        # tensor with one fused channel-scale + scatter-add
        cat = jnp.concatenate([xyz, features], axis=-1)
        grouped = ops.group_and_localize(
            cat, idx, new_xyz, cfg.radius if cfg.normalize_xyz else None)
    elif features is not None:
        cat = jnp.concatenate([xyz, features], axis=-1)
        grouped = ops.group_points(cat, idx)[..., 3:]
    else:
        grouped = ops.group_points(xyz, idx) - new_xyz[:, :, None, :]
        if cfg.normalize_xyz:
            grouped = grouped / cfg.radius

    h, mlp_s = shared_mlp(p["mlp_module"], s["mlp_module"], grouped, train, momentum)
    new_features = jnp.max(h, axis=2)  # max over nsample neighbors
    return new_xyz, new_features, inds, {"mlp_module": mlp_s}


# -----------------------------------------------------------------------------
# Feature propagation
# -----------------------------------------------------------------------------

def init_fp_module(key, mlp_dims: List[int]):
    p, s = init_shared_mlp(key, mlp_dims)
    return {"mlp": p}, {"mlp": s}


def fp_module(
    p: Params, s: State,
    unknown: jnp.ndarray, known: jnp.ndarray,
    unknown_feats: Optional[jnp.ndarray], known_feats: jnp.ndarray,
    train: bool, momentum=0.1,
):
    dist2, idx = ops.three_nn(unknown, known)
    dist_recip = 1.0 / (dist2 + 1e-8)
    norm = jnp.sum(dist_recip, axis=2, keepdims=True)
    weight = dist_recip / norm
    interpolated = ops.three_interpolate(known_feats, idx, weight)
    if unknown_feats is not None:
        new_features = jnp.concatenate([interpolated, unknown_feats], axis=-1)
    else:
        new_features = interpolated
    out, mlp_s = shared_mlp(p["mlp"], s["mlp"], new_features, train, momentum)
    return out, {"mlp": mlp_s}


# -----------------------------------------------------------------------------
# Backbone
# -----------------------------------------------------------------------------

def backbone_sa_configs(model_cfg):
    # defaults = reference models/backbone_module.py:28-62
    cfgs = {}
    in_dim = model_cfg.input_feature_dim
    for i in range(4):
        widths = list(model_cfg.sa_widths[i])
        cfgs[f"sa{i + 1}"] = SAConfig(
            model_cfg.sa_npoints[i], model_cfg.sa_radii[i], model_cfg.sa_nsamples[i],
            [in_dim] + widths,
            fps_identity=(i > 0),  # SA2-4 inputs are already FPS-ordered
        )
        in_dim = widths[-1]
    return cfgs


def init_backbone(key, model_cfg):
    cfgs = backbone_sa_configs(model_cfg)
    keys = jax.random.split(key, 6)
    params, state = {}, {}
    for i, name in enumerate(["sa1", "sa2", "sa3", "sa4"]):
        params[name], state[name] = init_sa_module(keys[i], cfgs[name])
    # reference models/backbone_module.py:65-66
    w = model_cfg.fp_width
    sa4_out = model_cfg.sa_widths[3][-1]
    sa3_out = model_cfg.sa_widths[2][-1]
    sa2_out = model_cfg.sa_widths[1][-1]
    params["fp1"], state["fp1"] = init_fp_module(keys[4], [sa3_out + sa4_out, w, w])
    params["fp2"], state["fp2"] = init_fp_module(keys[5], [sa2_out + w, w, w])
    return params, state


def backbone(
    p: Params, s: State, point_clouds: jnp.ndarray,
    model_cfg, train: bool, momentum=0.1,
) -> Tuple[Dict[str, jnp.ndarray], State]:
    """point_clouds: (B, N, 3 + input_feature_dim)."""
    cfgs = backbone_sa_configs(model_cfg)
    xyz = point_clouds[..., :3]
    features = point_clouds[..., 3:] if point_clouds.shape[-1] > 3 else None

    out: Dict[str, jnp.ndarray] = {}
    new_s: Dict[str, Any] = {}
    for name in ["sa1", "sa2", "sa3", "sa4"]:
        xyz, features, inds, new_s[name] = sa_module(
            p[name], s[name], cfgs[name], xyz, features, train, momentum
        )
        out[f"{name}_inds"] = inds
        out[f"{name}_xyz"] = xyz
        out[f"{name}_features"] = features

    feats, new_s["fp1"] = fp_module(
        p["fp1"], s["fp1"], out["sa3_xyz"], out["sa4_xyz"],
        out["sa3_features"], out["sa4_features"], train, momentum,
    )
    feats, new_s["fp2"] = fp_module(
        p["fp2"], s["fp2"], out["sa2_xyz"], out["sa3_xyz"],
        out["sa2_features"], feats, train, momentum,
    )
    out["fp2_features"] = feats                       # (B, 1024, 256)
    out["fp2_xyz"] = out["sa2_xyz"]                   # (B, 1024, 3)
    num_seed = out["fp2_xyz"].shape[1]
    out["fp2_inds"] = out["sa1_inds"][:, :num_seed]   # indices into input cloud
    return out, new_s
