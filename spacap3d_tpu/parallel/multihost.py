"""Multi-host (multi-process) runtime.

The reference has no distributed story at all — its parallelism is one
line of single-process DataParallel (reference scripts/train.py:198-200).
This module is the framework axis beyond it (SURVEY.md §2.6 "TPU plan"):
one JAX process per host, connected by ``jax.distributed`` into a single
runtime whose devices form one global mesh; XLA collectives ride ICI
within a slice and DCN across hosts.

Division of labor (who shards what):

* **Train**: every process computes the SAME global index order (the
  DataLoader RNG is seeded identically), builds only its contiguous
  row-block of each global batch, and assembles the globally-sharded
  batch with ``jax.make_array_from_process_local_data`` — host
  preprocessing scales with the process count, and the pjit train step
  is unchanged (XLA already speaks global meshes).
* **mul_eval**: the (seed x scene) grid shards by SEED across processes
  (``process_shard``). Each process runs a completely independent local
  grid stream on its own devices — no cross-process arrays at all on the
  hot path — and the per-seed metric rows are merged at the end with one
  ``allgather_pyobj``. Host scoring therefore also scales with hosts.
* **Metrics/ckpt**: per-seed rows are tiny JSON; checkpoint writing stays
  on process 0 (params are replicated or reassemblable via orbax).

Single-process runs are the ``process_count() == 1`` special case of
every helper here, so the same call sites serve both (pinned by
tests/test_multihost.py, which runs a REAL 2-process x 4-CPU-device
cluster through ``jax.distributed.initialize`` and asserts per-seed rows
equal the single-process run).
"""
from __future__ import annotations

import json
import os
from typing import Dict, List, Optional, Sequence

import numpy as np


def initialize_from_env(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    local_device_ids: Optional[Sequence[int]] = None,
):
    """Join (or create) the distributed runtime; returns
    ``(process_index, process_count)``.

    Explicit args win; otherwise ``SPACAP_COORDINATOR`` /
    ``SPACAP_NUM_PROCESSES`` / ``SPACAP_PROCESS_ID`` are read; otherwise
    ``jax.distributed.initialize()`` auto-detects (TPU pods publish the
    topology through their metadata service, so on Cloud TPU all three
    are usually omitted). With no coordinator configured anywhere this is
    a no-op single-process run — the CLI can call it unconditionally."""
    import jax

    coordinator_address = coordinator_address or os.environ.get(
        "SPACAP_COORDINATOR")
    if num_processes is None and os.environ.get("SPACAP_NUM_PROCESSES"):
        num_processes = int(os.environ["SPACAP_NUM_PROCESSES"])
    if process_id is None and os.environ.get("SPACAP_PROCESS_ID"):
        process_id = int(os.environ["SPACAP_PROCESS_ID"])

    tpu_pod = any(k in os.environ for k in
                  ("TPU_WORKER_HOSTNAMES", "MEGASCALE_COORDINATOR_ADDRESS"))
    if coordinator_address is None and not tpu_pod:
        return jax.process_index(), jax.process_count()

    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    if local_device_ids is not None:
        kwargs["local_device_ids"] = list(local_device_ids)
    jax.distributed.initialize(**kwargs)
    return jax.process_index(), jax.process_count()


def process_shard(items: Sequence, process_index: Optional[int] = None,
                  process_count: Optional[int] = None) -> List:
    """This process's round-robin shard of a work list
    (``items[process_index::process_count]``). Round-robin (not
    contiguous blocks) so a seed list like ``range(100)`` balances even
    when it does not divide the process count."""
    if process_index is None or process_count is None:
        import jax

        process_index = jax.process_index()
        process_count = jax.process_count()
    return list(items[process_index::process_count])


def warmup_collectives(mesh) -> None:
    """Form the cross-process communicator for ``mesh``'s device clique
    with a tiny all-reduce BEFORE any heavy compile. XLA creates
    collective contexts lazily at the first *execution* that needs them,
    with a ~30 s rendezvous deadline per side (Gloo ``GetKeyValue``); two
    processes whose big-program compiles skew by more than that — easy on
    a loaded or single-core host, where each process's compile runs at a
    fraction of a core — would then fail cluster formation with
    ``DEADLINE_EXCEEDED`` even though both are healthy. This program
    compiles in milliseconds, so every process reaches the rendezvous
    within seconds of ``initialize``; the context is cached per clique
    and the real step's first execution reuses it. No-op single-process."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    if jax.process_count() == 1:
        return
    n = mesh.devices.size
    sharding = NamedSharding(mesh, P(mesh.axis_names))
    local = np.zeros(n // jax.process_count(), np.float32)
    x = jax.make_array_from_process_local_data(sharding, local)
    out = jax.jit(jnp.sum, out_shardings=NamedSharding(mesh, P()))(x)
    jax.block_until_ready(out)


def allgather_bytes(payload: bytes) -> List[bytes]:
    """All-gather one byte string per process (any lengths). Two
    collectives: lengths first, then the max-length-padded payloads."""
    import jax

    if jax.process_count() == 1:
        return [payload]
    from jax.experimental import multihost_utils

    arr = np.frombuffer(payload, np.uint8)
    sizes = multihost_utils.process_allgather(
        np.array([arr.size], np.int64))                     # (P, 1)
    sizes = np.asarray(sizes).reshape(-1)
    padded = np.zeros(int(sizes.max()), np.uint8)
    padded[: arr.size] = arr
    gathered = np.asarray(multihost_utils.process_allgather(padded))
    return [bytes(gathered[p, : int(sizes[p])]) for p in range(len(sizes))]


def allgather_pyobj(obj) -> List:
    """All-gather one JSON-serializable object per process; returns the
    process-indexed list (identical on every process)."""
    return [json.loads(p.decode("utf-8"))
            for p in allgather_bytes(json.dumps(obj).encode("utf-8"))]


def replicate_global(mesh, tree):
    """Place a host pytree (identical on every process — e.g. params
    loaded from the same checkpoint) as replicated global arrays on a
    multi-process mesh. Single-process this is a plain replicating
    device_put."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharding = NamedSharding(mesh, P())
    if jax.process_count() == 1:
        return jax.device_put(tree, sharding)

    def put(x):
        return jax.make_array_from_process_local_data(sharding, np.asarray(x))

    return jax.tree_util.tree_map(put, tree)


def global_batch_from_local(mesh, local_batch: Dict[str, np.ndarray],
                            axis_name: str = "data") -> Dict:
    """Assemble a globally-sharded batch from each process's local
    row-block (``jax.make_array_from_process_local_data``): no process
    ever materializes the global batch on the host. Local rows must be
    the contiguous block matching this process's mesh position — the
    DataLoader's ``process_index``/``process_count`` slicing produces
    exactly that when the mesh is built over ``jax.devices()`` (global
    device order is process-major)."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharding = NamedSharding(mesh, P(axis_name))

    def put(x):
        x = np.asarray(x)
        if x.ndim == 0:
            return jax.device_put(x, NamedSharding(mesh, P()))
        return jax.make_array_from_process_local_data(sharding, x)

    return {k: put(v) for k, v in local_batch.items()}
