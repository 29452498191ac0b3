"""Worker process for tests/test_multihost.py.

Launched N times by the test with SPACAP_COORDINATOR / SPACAP_NUM_PROCESSES
/ SPACAP_PROCESS_ID set (the exact env contract of
parallel/multihost.py::initialize_from_env) plus JAX_PLATFORMS=cpu and
--xla_force_host_platform_device_count so each process owns 4 virtual CPU
devices. Together the processes form ONE JAX runtime (2 x 4 = 8 global
devices) — a real multi-process cluster, not a simulation.

Runs both multi-host paths and writes JSON to MH_OUT:
  * grid:  mul_eval_grid_multihost over 3 seeds (seed-sharded across
    processes, rows merged by all-gather) — the full merged row list;
  * train: one data-parallel train step over the GLOBAL 8-device mesh,
    each process building only its local row-block of the global batch
    (DataLoader process slicing + global_batch_from_local) — summary
    scalars of the updated params.
"""
import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    out_path = os.environ["MH_OUT"]
    data_root = os.environ["MH_DATA"]

    import jax

    # same hermetic-CPU dance as tests/conftest.py: the TPU-tunnel plugin's
    # sitecustomize re-asserts jax_platforms='axon,cpu' over the env var,
    # so force CPU at the config level BEFORE any backend is created (and
    # match the test process's exact-f32 matmul precision — the reference
    # rows this cluster is compared against are computed under it)
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_matmul_precision", "highest")

    from spacap3d_tpu.parallel.multihost import (
        global_batch_from_local,
        initialize_from_env,
        replicate_global,
    )

    pidx, pcount = initialize_from_env()

    assert pcount == int(os.environ["SPACAP_NUM_PROCESSES"]), pcount
    global_devices = jax.devices()

    from spacap3d_tpu.config import DataConfig, ModelConfig, TrainConfig
    from spacap3d_tpu.data.dataset import ScanReferDataset, SceneStore
    from spacap3d_tpu.data.loader import DataLoader
    from spacap3d_tpu.data.scannet_config import ScannetDatasetConfig
    from spacap3d_tpu.data.vocabulary import Vocabulary
    from spacap3d_tpu.eval.eval_helper import (
        organize_annotations,
        prepare_corpus,
    )
    from spacap3d_tpu.eval.mul_eval import mul_eval_grid_multihost
    from spacap3d_tpu.models import init_spacap
    from spacap3d_tpu.train.step import (
        init_train_state,
        make_eval_step,
        make_optimizer,
        make_train_step,
    )

    model_cfg = ModelConfig(
        num_points=1024, num_proposals=16, num_layers=2, num_heads=4,
        d_model=32, d_ff=64, max_des_len=7,
        sa_npoints=(128, 64, 32, 16), sa_nsamples=(16, 8, 8, 4),
        sa_widths=((16, 16, 32), (32, 32, 64), (32, 32, 64), (32, 32, 64)),
        fp_width=64, seed_feature_dim=64, proposal_feature_dim=32,
    )
    with open(os.path.join(data_root, "anns.json")) as f:
        anns = json.load(f)
    scene_ids = sorted({a["scene_id"] for a in anns})
    data_cfg = DataConfig(data_root=data_root,
                          num_points=model_cfg.num_points,
                          augment=False, use_relation=False, max_des_len=7)
    dc = ScannetDatasetConfig()
    scenes = SceneStore(data_cfg.scannet_data, scene_ids,
                        load_relations=False)
    vocab = Vocabulary.build(anns, max_len=7)
    eval_list, seen = [], set()
    for a in anns:
        if a["scene_id"] not in seen:
            seen.add(a["scene_id"])
            eval_list.append(a)
    ds = ScanReferDataset(eval_list, scenes, vocab, dc, data_cfg,
                          split="val")
    cfg = dataclasses.replace(model_cfg, vocab_size=len(vocab))
    params, state = init_spacap(jax.random.PRNGKey(2), cfg,
                                dc.mean_size_arr)
    import jax.numpy as jnp

    bias = np.asarray(params["proposal"]["conv2"]["bias"]).copy()
    bias[1] += 2.0
    params["proposal"]["conv2"]["bias"] = jnp.asarray(bias)

    # --- grid: seed-sharded across processes, merged by all-gather ----
    eval_step = make_eval_step(cfg, compact=True)
    corpus = prepare_corpus(anns)
    organized = organize_annotations(anns)
    rows = mul_eval_grid_multihost(
        eval_step, params, state, ds, vocab, dc, corpus, organized,
        seeds=[0, 1, 2], batch_size=4, also_detection=True,
        num_workers=2, score_workers=2,
    )

    # --- train: one DP step over the global 2-process x 4-device mesh --
    from jax.sharding import Mesh

    mesh = Mesh(np.asarray(global_devices), ("data",))
    train_ds = ScanReferDataset(anns, scenes, vocab, dc,
                                dataclasses.replace(data_cfg, augment=False),
                                split="train")
    tc = TrainConfig(batch_size=8, use_relation=False)
    loader = DataLoader(train_ds, batch_size=8, shuffle=True, seed=5,
                        num_workers=1, process_index=pidx,
                        process_count=pcount)
    local_batch = next(iter(loader))
    local_batch.pop("__valid__")
    global_batch = global_batch_from_local(mesh, local_batch)
    tx = make_optimizer(params, tc, steps_per_epoch=10)
    ts = replicate_global(mesh, init_train_state(params, state, tx))
    step = make_train_step(cfg, tc, tx, mesh=mesh)
    rng = replicate_global(mesh, np.asarray(jax.random.PRNGKey(3)))
    ts2, metrics = step(ts, global_batch, rng, 0.1)
    leaves = jax.tree_util.tree_leaves(ts2.params)
    param_summary = {
        "loss": float(metrics["loss"]),
        "cap_loss": float(metrics["cap_loss"]),
        "param_abs_sum": float(sum(jnp.sum(jnp.abs(l)) for l in leaves)),
        "n_leaves": len(leaves),
    }

    with open(out_path, "w") as f:
        json.dump({"process_index": pidx, "process_count": pcount,
                   "n_global_devices": len(global_devices),
                   "rows": rows, "train": param_summary}, f)
    print(f"worker {pidx}: ok", flush=True)


if __name__ == "__main__":
    main()
