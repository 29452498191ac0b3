"""SpaCapNet composite model: backbone -> voting -> proposal -> captioner.

TPU-native port of reference models/SpaCapNet.py:12-86. The reference's
mutable string->tensor ``data_dict`` becomes a functional endpoints dict:
``apply`` takes the input batch and returns (endpoints, new_state).
"""
from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from spacap3d_tpu.config import ModelConfig
from spacap3d_tpu.models import captioner as cap
from spacap3d_tpu.models.backbone import backbone, init_backbone
from spacap3d_tpu.models.core import Params, State
from spacap3d_tpu.models.proposal import init_proposal, proposal_module
from spacap3d_tpu.models.voting import init_voting, voting


def init_spacap(key, cfg: ModelConfig, mean_size_arr: np.ndarray):
    k_bb, k_vote, k_prop, k_cap = jax.random.split(key, 4)
    params: Dict = {}
    state: Dict = {}
    assert cfg.d_model == cfg.proposal_feature_dim, (
        "captioner d_model must equal the proposal feature dim (the captioner "
        "consumes aggregated_vote_features directly as source tokens)"
    )
    params["backbone_net"], state["backbone_net"] = init_backbone(k_bb, cfg)
    params["vgen"], state["vgen"] = init_voting(
        k_vote, cfg.seed_feature_dim, cfg.vote_factor
    )
    params["proposal"], state["proposal"] = init_proposal(k_prop, cfg)
    if not cfg.no_caption:
        params["caption"], state["caption"] = init_captioner_wrapped(k_cap, cfg)
    params["mean_size_arr"] = jnp.asarray(mean_size_arr, jnp.float32)
    return params, state


def init_captioner_wrapped(key, cfg: ModelConfig):
    p, s = cap.init_captioner(key, cfg)
    return p, s


import functools  # noqa: E402


@functools.partial(jax.jit, static_argnums=(2, 4, 5))
def _apply_jit(params, state, cfg, batch, is_eval, train, rng, bn_momentum):
    return apply_spacap(params, state, cfg, batch, is_eval, train, rng, bn_momentum)


def make_forward(cfg: ModelConfig, is_eval: bool, train: bool):
    """Returns a jit-compiled forward: (params, state, batch, rng) -> (ep, state)."""

    def fwd(params, state, batch, rng=None, bn_momentum=0.1):
        return _apply_jit(params, state, cfg, batch, is_eval, train, rng,
                          jnp.asarray(bn_momentum, jnp.float32))

    return fwd


def apply_spacap(
    params: Params, state: State, cfg: ModelConfig,
    batch: Dict[str, jnp.ndarray],
    is_eval: bool, train: bool,
    rng: Optional[jax.Array] = None,
    bn_momentum=0.1,
) -> Tuple[Dict[str, jnp.ndarray], State]:
    """batch must contain 'point_clouds' (B,N,3+D); for caption training
    also 'lang_label', 'ref_center_label', and the detection labels."""
    ep: Dict[str, jnp.ndarray] = dict(batch)
    new_state: Dict = {}

    # --------- detection trunk ---------
    bb_out, new_state["backbone_net"] = backbone(
        params["backbone_net"], state["backbone_net"], batch["point_clouds"],
        cfg, train, bn_momentum,
    )
    ep.update(bb_out)
    ep["seed_inds"] = ep["fp2_inds"]
    ep["seed_xyz"] = ep["fp2_xyz"]
    ep["seed_features"] = ep["fp2_features"]

    vote_xyz, vote_features, new_state["vgen"] = voting(
        params["vgen"], state["vgen"], ep["seed_xyz"], ep["seed_features"],
        train, bn_momentum, cfg.vote_factor,
    )
    # L2-normalize vote features (reference models/SpaCapNet.py:66-67)
    norm = jnp.linalg.norm(vote_features, axis=-1, keepdims=True)
    vote_features = vote_features / norm
    ep["vote_xyz"] = vote_xyz
    ep["vote_features"] = vote_features

    prop_out, new_state["proposal"] = proposal_module(
        params["proposal"], state["proposal"], vote_xyz, vote_features,
        params["mean_size_arr"], cfg, cfg.size_decoded, train, bn_momentum,
    )
    ep.update(prop_out)

    # --------- caption branch ---------
    if not cfg.no_caption:
        if is_eval:
            ep = cap.captioner_eval(params["caption"], state["caption"], cfg, ep)
            new_state["caption"] = state["caption"]
        else:
            ep, cap_state = cap.captioner_train(
                params["caption"], state["caption"], cfg, ep, rng, train, bn_momentum
            )
            new_state["caption"] = {**state["caption"], **cap_state}

    return ep, new_state
