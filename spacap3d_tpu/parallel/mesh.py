"""Device mesh + sharding helpers.

The reference's only parallelism was single-process DataParallel
(scripts/train.py:198-200) and a CPU pool for AP (SURVEY.md §2.6). The
TPU-native replacement is a 1-D ``jax.sharding.Mesh`` with a ``data``
axis: batches are sharded along it, parameters are replicated, and XLA
inserts the gradient all-reduce over ICI. Evaluation shards scenes (and
the B*K proposal-decode rows with them) across the same axis — that is
the source of the multi-chip eval speedup (SURVEY.md §7 stage 8).

The model is ~10 M params, so data parallelism is the production layout;
for scaled-up transformer configs an opt-in ``model`` axis (Megatron-
style tensor parallelism over the captioner) lives in ``parallel/tp.py``
— build the 2-D mesh with ``make_tp_mesh`` and place the params with
``shard_params``.
"""
from __future__ import annotations

import os
import warnings
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices: Optional[Sequence] = None, axis_name: str = "data") -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    return Mesh(np.asarray(devices), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """First-dim (batch) sharding."""
    return NamedSharding(mesh, P(axis_name))


def replicate_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


_warned_replicated_batch = False


def shard_batch(mesh: Mesh, batch: dict, axis_name: str = "data") -> dict:
    """Place a host batch dict onto the mesh, sharded along the batch dim.

    The loaders (DataLoader / GridLoader) pad every batch to the full
    static batch size and mark wrapped rows ``__valid__=False``, so with
    ``batch_size % n_devices == 0`` every array here shards evenly. A
    non-divisible leading dim falls back to replication (each device
    redundantly computes the whole batch): that fallback WARNS once, and
    raises instead when ``SPACAP_STRICT_SHARDING=1`` — a silently
    replicated multi-chip run would burn n_devices x the FLOPs."""
    global _warned_replicated_batch
    n = mesh.shape[axis_name]

    def put(k, x):
        divisible = np.ndim(x) >= 1 and np.shape(x)[0] % n == 0
        if not divisible and np.ndim(x) >= 1:
            global _warned_replicated_batch
            msg = (
                f"shard_batch: leaf '{k}' with leading dim {np.shape(x)[0]}"
                f" does not divide the {n}-device '{axis_name}' mesh axis;"
                " replicating (every device computes the full batch). Use a"
                " batch size divisible by the device count."
            )
            if os.environ.get("SPACAP_STRICT_SHARDING"):
                raise ValueError(msg)
            if not _warned_replicated_batch:
                warnings.warn(msg, RuntimeWarning, stacklevel=2)
                _warned_replicated_batch = True
        spec = P(axis_name) if divisible else P()
        return jax.device_put(x, NamedSharding(mesh, spec))

    return {k: put(k, v) for k, v in batch.items()}
