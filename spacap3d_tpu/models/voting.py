"""Hough voting module.

TPU-native port of reference models/voting_module.py:12-61 (vote_factor=1):
three 1x1 convs (Dense) with BN+ReLU on the first two; predicts per-seed
xyz offsets and feature residuals.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from spacap3d_tpu.models import core
from spacap3d_tpu.models.core import Params, State


def init_voting(key, seed_feature_dim: int = 256, vote_factor: int = 1):
    k1, k2, k3 = jax.random.split(key, 3)
    d = seed_feature_dim
    params = {
        "conv1": core.init_dense(k1, d, d),
        "conv2": core.init_dense(k2, d, d),
        "conv3": core.init_dense(k3, d, (3 + d) * vote_factor),
    }
    bn1_p, bn1_s = core.init_batch_norm(d)
    bn2_p, bn2_s = core.init_batch_norm(d)
    params["bn1"], params["bn2"] = bn1_p, bn2_p
    state = {"bn1": bn1_s, "bn2": bn2_s}
    return params, state


def voting(
    p: Params, s: State,
    seed_xyz: jnp.ndarray, seed_features: jnp.ndarray,
    train: bool, momentum=0.1, vote_factor: int = 1,
) -> Tuple[jnp.ndarray, jnp.ndarray, State]:
    """seed_xyz (B,M,3), seed_features (B,M,C) ->
    (vote_xyz (B,M*vf,3), vote_features (B,M*vf,C), state)."""
    b, m, _ = seed_xyz.shape
    c = seed_features.shape[-1]
    net = core.dense(p["conv1"], seed_features)
    net, bn1_s = core.batch_norm(p["bn1"], s["bn1"], net, train, momentum)
    net = jax.nn.relu(net)
    net = core.dense(p["conv2"], net)
    net, bn2_s = core.batch_norm(p["bn2"], s["bn2"], net, train, momentum)
    net = jax.nn.relu(net)
    net = core.dense(p["conv3"], net)                     # (B, M, (3+C)*vf)
    net = net.reshape(b, m, vote_factor, 3 + c)

    offset = net[..., 0:3]
    vote_xyz = (seed_xyz[:, :, None, :] + offset).reshape(b, m * vote_factor, 3)
    residual = net[..., 3:]
    vote_features = (seed_features[:, :, None, :] + residual).reshape(
        b, m * vote_factor, c
    )
    return vote_xyz, vote_features, {"bn1": bn1_s, "bn2": bn2_s}
