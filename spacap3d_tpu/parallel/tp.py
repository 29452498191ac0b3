"""Opt-in tensor parallelism (a ``model`` mesh axis) for the captioner.

The reference has no tensor parallelism at all (its only parallelism is
single-process DataParallel, scripts/train.py:198-200), and at SpaCap3D's
flagship size (~10 M params) TP is a capacity feature, not a speed one.
It exists here because this is a *framework*: users scaling ``d_model`` /
``d_ff`` / ``num_layers`` beyond HBM on one chip need the transformer to
shard, and on TPU the idiomatic way is GSPMD — place the parameters with
a sharded ``NamedSharding`` and let XLA propagate the layout and insert
the collectives (the "annotate shardings, let XLA do the rest" recipe).

Layout (Megatron-style column/row split over the ``model`` axis):

  * MHA q/k/v projections: kernel ``P(None, "model")`` (output/head dim
    split -> each shard holds ``num_heads / tp`` whole heads), bias
    ``P("model")``;
  * MHA output projection: kernel ``P("model", None)`` (input dim split,
    XLA inserts one psum over ``model``), bias replicated;
  * FFN ``w_1``: kernel ``P(None, "model")``, bias ``P("model")``;
  * FFN ``w_2``: kernel ``P("model", None)``, bias replicated;
  * everything else — detector trunk, embeddings, generator, relation
    head, LayerNorms — replicated (``P()``).

With this placement each transformer block runs its two big matmul pairs
on ``1/tp`` of the weights and activations and pays exactly one
all-reduce per pair, the classic TP schedule; the head-split reshape
``(B, T, d) -> (B, T, h, dk)`` keeps the sharded dim on ``h`` because
``tp`` divides ``num_heads``. Numerics match the replicated model up to
f32 reassociation of the split contractions (pinned by tests/test_tp.py).

BOUNDARY — TP covers the CAPTIONER ONLY. The detector trunk (SA/FP
convs, voting, proposal head) is deliberately replicated at every
``tp``: parameter memory and FLOPs there are dominated by activations,
not weights (the whole trunk is <2 M params even at 4x
``seed_feature_dim``), so splitting its weights buys no capacity while
its BatchNorm stats and ball-query gathers would need bespoke
cross-shard handling. Scaling knobs TP serves: ``d_model``, ``d_ff``,
``num_layers``, ``num_heads``. If you scale trunk widths to the point
of HBM pressure, shard the BATCH further (more ``data``-axis chips)
— activation memory, the trunk's actual cost, shards with it.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_tp_mesh(devices: Optional[Sequence] = None, tp: int = 2) -> Mesh:
    """2-D ``(data, model)`` mesh: batch shards over ``data``; the
    captioner's transformer weights shard over ``model``. ``tp`` rides the
    fast (innermost / ICI-adjacent) axis so the per-block all-reduces stay
    on-chip-neighbor links."""
    devices = list(devices if devices is not None else jax.devices())
    if len(devices) % tp:
        raise ValueError(f"{len(devices)} devices not divisible by tp={tp}")
    return Mesh(np.asarray(devices).reshape(-1, tp), ("data", "model"))


def tp_degree(mesh: Optional[Mesh]) -> int:
    if mesh is None or "model" not in mesh.shape:
        return 1
    return mesh.shape["model"]


_QKV = ("linears0", "linears1", "linears2")


def tp_param_specs(params, tp: int):
    """PartitionSpec pytree matching ``params`` (the full model tree, with
    the captioner under ``params['caption']``).

    Raises when a dimension the layout splits does not divide ``tp`` —
    a silently replicated "TP" run would burn tp x the FLOPs.
    """

    def spec_for(path, leaf):
        keys = [getattr(k, "key", None) for k in path]
        if "caption" not in keys:
            return P()
        name = keys[-1]  # 'kernel' / 'bias' / 'scale' / ...
        parent = keys[-2] if len(keys) >= 2 else None
        owner = keys[-3] if len(keys) >= 3 else None
        if owner in ("self_attn", "src_attn"):
            if parent in _QKV:
                split = leaf.shape[-1] if name == "kernel" else leaf.shape[0]
                if split % tp:
                    raise ValueError(
                        f"TP: {'/'.join(map(str, keys))} dim {split} not"
                        f" divisible by tp={tp}"
                    )
                return P(None, "model") if name == "kernel" else P("model")
            if parent == "linears3" and name == "kernel":
                return P("model", None)
            return P()
        if parent == "w_1":
            return P(None, "model") if name == "kernel" else P("model")
        if parent == "w_2" and name == "kernel":
            return P("model", None)
        return P()

    return jax.tree_util.tree_map_with_path(spec_for, params)


def shard_params(mesh: Mesh, params):
    """Place the param tree on the mesh per ``tp_param_specs`` (replicated
    over ``data``, transformer blocks split over ``model``). From here
    GSPMD propagates the layout through the jitted step — no per-op
    annotations needed."""
    tp = tp_degree(mesh)
    if tp == 1 or "caption" not in params:
        return jax.device_put(params, NamedSharding(mesh, P()))
    specs = tp_param_specs(params, tp)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs
    )


def count_sharded(params) -> int:
    """Number of leaves whose committed sharding is not fully replicated
    (diagnostic; used by tests and the multichip dryrun report)."""
    n = 0
    for leaf in jax.tree_util.tree_leaves(params):
        sh = getattr(leaf, "sharding", None)
        if sh is not None and not sh.is_fully_replicated:
            n += 1
    return n
