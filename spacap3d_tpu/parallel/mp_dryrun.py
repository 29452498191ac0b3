"""Multi-process dry-run worker (``python -m spacap3d_tpu.parallel.mp_dryrun``).

Launched N times by ``__graft_entry__.dryrun_multichip`` (and usable by
hand) with the ``SPACAP_COORDINATOR`` / ``SPACAP_NUM_PROCESSES`` /
``SPACAP_PROCESS_ID`` env contract of ``parallel/multihost.py`` plus
``JAX_PLATFORMS=cpu`` and ``--xla_force_host_platform_device_count`` so
the processes form ONE real ``jax.distributed`` runtime out of virtual
CPU devices — the portable stand-in for one-process-per-TPU-host.

Each worker runs the tiny-config train step over the GLOBAL mesh, with
each process building only its contiguous row-block of the global batch
(``global_batch_from_local``), then all-gathers the per-process loss and
asserts every process computed the identical value. Exercises the full
multi-host train contract (cluster formation, global-mesh pjit, local
row-block assembly, cross-process collectives, pyobj all-gather) in one
cheap step; the heavyweight equality claims (grid rows and train metrics
bit-equal to a single-process run) are pinned by tests/test_multihost.py.
"""
import os
import sys


def main() -> None:
    import jax

    # the TPU-tunnel sitecustomize re-asserts jax_platforms='axon,cpu'
    # over the env var, so force CPU at the config level BEFORE any
    # backend exists (same dance as tests/conftest.py)
    jax.config.update("jax_platforms", "cpu")

    # join the cluster BEFORE any import that could initialize the XLA
    # backend (jax.distributed.initialize must run first)
    from spacap3d_tpu.parallel.multihost import (
        allgather_pyobj,
        global_batch_from_local,
        initialize_from_env,
        replicate_global,
        warmup_collectives,
    )

    pidx, pcount = initialize_from_env()

    import jax.numpy as jnp
    import numpy as np

    from spacap3d_tpu.config import TrainConfig
    from spacap3d_tpu.data.scannet_config import ScannetDatasetConfig
    from spacap3d_tpu.data.synthetic import synthetic_batch
    from spacap3d_tpu.models import init_spacap
    from spacap3d_tpu.parallel.mesh import make_mesh
    from spacap3d_tpu.train.step import (
        init_train_state,
        make_optimizer,
        make_train_step,
    )
    assert pcount == int(os.environ["SPACAP_NUM_PROCESSES"]), pcount
    n_global = len(jax.devices())
    mesh = make_mesh(jax.devices())
    # form the cross-process communicator before the train-step compile
    # (the real CLIs do the same; see warmup_collectives)
    warmup_collectives(mesh)

    from spacap3d_tpu.config import ModelConfig

    cfg = ModelConfig(  # the tiny smoke config (fast CPU compile)
        num_points=1024, num_proposals=16, num_layers=2, num_heads=4,
        d_model=32, d_ff=64, max_des_len=7, vocab_size=64,
        sa_npoints=(128, 64, 32, 16), sa_nsamples=(16, 8, 8, 4),
        sa_widths=((16, 16, 32), (32, 32, 64), (32, 32, 64), (32, 32, 64)),
        fp_width=64, seed_feature_dim=64, proposal_feature_dim=32,
    )
    tc = TrainConfig(batch_size=n_global, use_relation=True)
    dc = ScannetDatasetConfig()
    params, state = init_spacap(jax.random.PRNGKey(0), cfg, dc.mean_size_arr)

    # every process generates the SAME global batch (same seed inside
    # synthetic_batch) and keeps only its contiguous row-block — the
    # multi-host loader contract (data/loader.py process slicing)
    batch, _, _ = synthetic_batch(
        cfg, batch_size=n_global, vocab_size=cfg.vocab_size,
        max_des_len=cfg.max_des_len,
    )
    per = n_global // pcount
    local = {k: np.asarray(v)[pidx * per: (pidx + 1) * per]
             for k, v in batch.items()}
    global_batch = global_batch_from_local(mesh, local)

    tx = make_optimizer(params, tc, steps_per_epoch=10)
    ts = replicate_global(mesh, init_train_state(params, state, tx))
    step = make_train_step(cfg, tc, tx, mesh=mesh)
    rng = replicate_global(mesh, np.asarray(jax.random.PRNGKey(0)))
    ts, metrics = step(ts, global_batch, rng, 0.1)
    loss = float(metrics["loss"])
    assert jnp.isfinite(loss), metrics

    losses = allgather_pyobj({"process": pidx, "loss": loss})
    assert len(losses) == pcount, losses
    assert all(r["loss"] == loss for r in losses), losses
    print(f"mp_dryrun worker {pidx}/{pcount}: {n_global} global devices, "
          f"loss={loss:.6f} identical across processes", flush=True)


if __name__ == "__main__":
    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))))
    main()
