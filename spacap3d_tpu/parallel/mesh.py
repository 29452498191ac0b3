"""Device mesh + sharding helpers.

The reference's only parallelism was single-process DataParallel
(scripts/train.py:198-200) and a CPU pool for AP (SURVEY.md §2.6). The
TPU-native replacement is a 1-D ``jax.sharding.Mesh`` with a ``data``
axis: batches are sharded along it, parameters are replicated, and XLA
inserts the gradient all-reduce over ICI. Evaluation shards scenes (and
the B*K proposal-decode rows with them) across the same axis — that is
the source of the multi-chip eval speedup (SURVEY.md §7 stage 8).

The model is ~10 M params, so tensor/pipeline parallelism are explicit
non-goals (SURVEY.md §2.6); the mesh abstraction still leaves room for a
``model`` axis later.
"""
from __future__ import annotations

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


def shard_batch(mesh: Mesh, batch: dict, axis_name: str = "data") -> dict:
    """Place a host batch dict onto the mesh, sharded along the batch dim.

    The loaders (DataLoader / GridLoader) pad every batch to the full
    static batch size and mark wrapped rows ``__valid__=False``, so with
    ``batch_size % n_devices == 0`` every array here shards evenly. The
    replication branch below is a graceful fallback for mis-sized
    configs (each device then redundantly computes the whole batch) —
    pick a divisible batch size for real multi-chip runs."""
    n = mesh.shape[axis_name]

    def put(x):
        divisible = np.ndim(x) >= 1 and np.shape(x)[0] % n == 0
        spec = P(axis_name) if divisible else P()
        return jax.device_put(x, NamedSharding(mesh, spec))

    return {k: put(v) for k, v in batch.items()}
