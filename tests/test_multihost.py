"""Multi-host runtime: a REAL 2-process x 4-CPU-device JAX cluster.

Spawns two worker processes (tests/multihost_worker.py) joined through
``jax.distributed.initialize`` (the SPACAP_COORDINATOR env contract of
parallel/multihost.py). Together they form one 8-device global runtime
and run:

  * seed-sharded ``mul_eval_grid_multihost`` — asserts every process
    returns the identical full row list, bit-equal to a single-process
    ``mul_eval_grid`` run computed in this test process;
  * one data-parallel train step over the global 2x4 mesh, each process
    building only its row-block of the global batch — asserts the loss
    and updated-param summary match a single-process 8-device mesh run.

This is the framework axis the reference lacks entirely (its parallelism
is one line of DataParallel, reference scripts/train.py:198-200).
"""
import dataclasses
import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SEEDS = [0, 1, 2]


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.fixture(scope="module")
def cluster(tmp_path_factory):
    """Write the shared synthetic dataset, run the 2-process cluster to
    completion, and return (anns, data_root, per-process outputs)."""
    from spacap3d_tpu.data.synthetic import write_synthetic_dataset

    root = str(tmp_path_factory.mktemp("mh"))
    anns, scene_ids = write_synthetic_dataset(root, num_scenes=3, seed=11)
    with open(os.path.join(root, "anns.json"), "w") as f:
        json.dump(anns, f)

    port = _free_port()
    procs, outs = [], []
    for pid in range(2):
        out_path = os.path.join(root, f"out{pid}.json")
        outs.append(out_path)
        env = dict(os.environ)
        env.update(
            JAX_PLATFORMS="cpu",
            XLA_FLAGS="--xla_force_host_platform_device_count=4",
            SPACAP_COORDINATOR=f"localhost:{port}",
            SPACAP_NUM_PROCESSES="2",
            SPACAP_PROCESS_ID=str(pid),
            MH_OUT=out_path,
            MH_DATA=root,
        )
        # drop any inherited TPU/driver device config so the workers are
        # hermetic CPU processes
        env.pop("JAX_PLATFORM_NAME", None)
        procs.append(subprocess.Popen(
            [sys.executable, os.path.join(REPO, "tests",
                                          "multihost_worker.py")],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True,
        ))
    logs = []
    for p in procs:
        try:
            stdout, _ = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        logs.append(stdout)
    for p, log in zip(procs, logs):
        assert p.returncode == 0, f"worker failed:\n{log[-4000:]}"
    results = []
    for out_path in outs:
        with open(out_path) as f:
            results.append(json.load(f))
    return anns, root, results


def _single_process_reference(anns, root):
    """The same grid + train step computed WITHOUT the cluster (this test
    process; conftest gives it 8 virtual CPU devices)."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from spacap3d_tpu.config import DataConfig, ModelConfig, TrainConfig
    from spacap3d_tpu.data.dataset import ScanReferDataset, SceneStore
    from spacap3d_tpu.data.loader import DataLoader
    from spacap3d_tpu.data.scannet_config import ScannetDatasetConfig
    from spacap3d_tpu.data.vocabulary import Vocabulary
    from spacap3d_tpu.eval.eval_helper import (
        organize_annotations,
        prepare_corpus,
    )
    from spacap3d_tpu.eval.mul_eval import mul_eval_grid
    from spacap3d_tpu.models import init_spacap
    from spacap3d_tpu.parallel.mesh import shard_batch
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
    scene_ids = sorted({a["scene_id"] for a in anns})
    data_cfg = DataConfig(data_root=root, num_points=model_cfg.num_points,
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
    bias = np.asarray(params["proposal"]["conv2"]["bias"]).copy()
    bias[1] += 2.0
    params["proposal"]["conv2"]["bias"] = jnp.asarray(bias)

    rows = mul_eval_grid(
        make_eval_step(cfg, compact=True), params, state, ds, vocab, dc,
        prepare_corpus(anns), organize_annotations(anns),
        seeds=SEEDS, batch_size=4, also_detection=True,
        num_workers=2, score_workers=2,
    )

    mesh = Mesh(np.asarray(jax.devices()[:8]), ("data",))
    train_ds = ScanReferDataset(anns, scenes, vocab, dc,
                                dataclasses.replace(data_cfg, augment=False),
                                split="train")
    tc = TrainConfig(batch_size=8, use_relation=False)
    loader = DataLoader(train_ds, batch_size=8, shuffle=True, seed=5,
                        num_workers=1)
    batch = next(iter(loader))
    batch.pop("__valid__")
    tx = make_optimizer(params, tc, steps_per_epoch=10)
    ts = init_train_state(params, state, tx)
    step = make_train_step(cfg, tc, tx, mesh=mesh)
    ts2, metrics = step(ts, shard_batch(mesh, batch),
                        jax.random.PRNGKey(3), 0.1)
    leaves = jax.tree_util.tree_leaves(ts2.params)
    train = {
        "loss": float(metrics["loss"]),
        "cap_loss": float(metrics["cap_loss"]),
        "param_abs_sum": float(sum(jnp.sum(jnp.abs(l)) for l in leaves)),
        "n_leaves": len(leaves),
    }
    return rows, train


def test_cluster_forms_and_all_processes_agree(cluster):
    _, _, results = cluster
    assert [r["process_index"] for r in results] == [0, 1]
    assert all(r["process_count"] == 2 for r in results)
    assert all(r["n_global_devices"] == 8 for r in results)
    # the all-gather hands every process the identical full row list
    assert results[0]["rows"] == results[1]["rows"]
    assert [r["seed"] for r in results[0]["rows"]] == SEEDS


def test_grid_rows_equal_single_process(cluster):
    anns, root, results = cluster
    ref_rows, ref_train = _single_process_reference(anns, root)
    got = results[0]["rows"]
    assert len(got) == len(ref_rows)
    for g, r in zip(got, ref_rows):
        assert g.keys() == r.keys()
        for k, v in r.items():
            # identical CPU code path per seed -> bit-equal (json float
            # round-trip is exact)
            assert g[k] == pytest.approx(v, rel=0, abs=0), (g["seed"], k)

    # data-parallel train step over the 2-process global mesh vs the
    # single-process 8-device mesh: same per-device rows, same all-reduce
    # topology size — only collective scheduling may differ (tolerance)
    for r in results:
        assert r["train"]["n_leaves"] == ref_train["n_leaves"]
        assert r["train"]["loss"] == pytest.approx(ref_train["loss"],
                                                   rel=2e-5)
        assert r["train"]["param_abs_sum"] == pytest.approx(
            ref_train["param_abs_sum"], rel=2e-5)
