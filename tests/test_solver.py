"""Solver integration: one tiny epoch with in-loop validation, async
checkpoints, and restore-from-checkpoint."""
import dataclasses
import os

import jax
import numpy as np
import pytest

from spacap3d_tpu.config import DataConfig, RunConfig, TrainConfig
from spacap3d_tpu.data.dataset import ScanReferDataset, SceneStore
from spacap3d_tpu.data.loader import DataLoader
from spacap3d_tpu.data.scannet_config import ScannetDatasetConfig
from spacap3d_tpu.data.synthetic import write_synthetic_dataset
from spacap3d_tpu.data.vocabulary import Vocabulary
from spacap3d_tpu.models import init_spacap
from spacap3d_tpu.train.solver import Solver
from tests.test_train_e2e import MODEL_CFG


@pytest.fixture(scope="module")
def world(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("solver"))
    anns, scene_ids = write_synthetic_dataset(root, num_scenes=2, seed=2)
    data_cfg = DataConfig(data_root=root, num_points=MODEL_CFG.num_points,
                          augment=True, use_relation=True, max_des_len=7)
    dc = ScannetDatasetConfig()
    scenes = SceneStore(data_cfg.scannet_data, scene_ids, load_relations=True)
    vocab = Vocabulary.build(anns, max_len=7)
    train_ds = ScanReferDataset(anns, scenes, vocab, dc, data_cfg, split="train")
    val_cfg = dataclasses.replace(data_cfg, augment=False, use_relation=False)
    val_ds = ScanReferDataset(anns[:4], scenes, vocab, dc, val_cfg, split="val")
    model_cfg = dataclasses.replace(MODEL_CFG, vocab_size=len(vocab))
    return root, anns, train_ds, val_ds, vocab, dc, model_cfg


def test_solver_epoch_with_validation(world, tmp_path):
    root, anns, train_ds, val_ds, vocab, dc, model_cfg = world
    out_dir = str(tmp_path / "outputs")
    tc = TrainConfig(batch_size=4, epoch=1, val_step=3, use_relation=True,
                     criterion="cider")
    run_cfg = RunConfig(model=model_cfg, train=tc,
                        data=DataConfig(data_root=root, max_des_len=7),
                        output_dir=out_dir)
    params, state = init_spacap(jax.random.PRNGKey(0), model_cfg, dc.mean_size_arr)
    train_loader = DataLoader(train_ds, 4, shuffle=True, num_workers=1)
    val_loader = DataLoader(val_ds, 4, shuffle=False, num_workers=1)

    solver = Solver(run_cfg, params, state, train_loader, val_loader,
                    train_ds, val_ds, vocab, dc, anns, stamp="testrun")
    solver(epochs=1, verbose=1)

    run_root = os.path.join(out_dir, "testrun")
    assert os.path.exists(os.path.join(run_root, "log.txt"))
    assert os.path.exists(os.path.join(run_root, "model_last.ckpt"))
    assert os.path.exists(os.path.join(run_root, "all_scalars.json"))
    assert os.path.exists(os.path.join(run_root, "best.txt"))
    # validation ran (val_step=3 < len(train_loader) epochs... ensure ckpt)
    assert solver.best["cider"] > -float("inf")
    assert os.path.exists(os.path.join(run_root, "model.ckpt"))

    # ---- restore path --------------------------------------------------
    params2, state2 = init_spacap(jax.random.PRNGKey(7), model_cfg, dc.mean_size_arr)
    solver2 = Solver(run_cfg, params2, state2, train_loader, val_loader,
                     train_ds, val_ds, vocab, dc, anns, stamp="testrun")
    solver2.restore(os.path.join(run_root, "model_last.ckpt"))
    assert solver2.start_epoch == 1
    a = np.asarray(jax.tree_util.tree_leaves(solver.train_state.params)[0])
    b = np.asarray(jax.tree_util.tree_leaves(solver2.train_state.params)[0])
    np.testing.assert_array_equal(a, b)


@pytest.fixture(scope="module")
def mesh_world(tmp_path_factory):
    """A larger corpus (4 scenes) so batch 8 divides the 8-device mesh and
    each epoch has >1 step."""
    root = str(tmp_path_factory.mktemp("solver_mesh"))
    anns, scene_ids = write_synthetic_dataset(root, num_scenes=4, seed=9)
    data_cfg = DataConfig(data_root=root, num_points=MODEL_CFG.num_points,
                          augment=True, use_relation=True, max_des_len=7)
    dc = ScannetDatasetConfig()
    scenes = SceneStore(data_cfg.scannet_data, scene_ids, load_relations=True)
    vocab = Vocabulary.build(anns, max_len=7)
    train_ds = ScanReferDataset(anns, scenes, vocab, dc, data_cfg, split="train")
    val_cfg = dataclasses.replace(data_cfg, augment=False, use_relation=False)
    val_ds = ScanReferDataset(anns[:8], scenes, vocab, dc, val_cfg, split="val")
    model_cfg = dataclasses.replace(MODEL_CFG, vocab_size=len(vocab))
    return root, anns, train_ds, val_ds, vocab, dc, model_cfg


def test_solver_full_loop_on_mesh(mesh_world, tmp_path):
    """The production Solver loop on the 8-device mesh (SURVEY §7 stages
    7-8; the multichip dryrun proves single steps, this proves the loop):
    multiple epochs of fully-sharded batches with in-loop validation,
    best-ckpt save, the per-epoch model_last write (the same snapshot an
    interrupt saves, reference lib/solver.py:237-240), AND a
    --use_checkpoint-style restore that resumes BIT-compatibly — a run
    restored after epoch 2 must end with exactly the parameters of an
    uninterrupted 3-epoch run (same shuffle order, same fold_in rng
    schedule, same optimizer state)."""
    import json

    from spacap3d_tpu.parallel.mesh import make_mesh

    root, anns, train_ds, val_ds, vocab, dc, model_cfg = mesh_world
    mesh = make_mesh()
    assert mesh.shape["data"] == 8
    out_dir = str(tmp_path / "outputs")
    # 4 scenes x 8 anns = 32 items -> 4 sharded steps/epoch at batch 8;
    # val at iter 8 (end of epoch 2) exercises in-loop validation + the
    # best-by-cider model.ckpt save on the mesh
    tc = TrainConfig(batch_size=8, epoch=3, val_step=8, use_relation=True,
                     criterion="cider", ckpt_every=1, seed=5)
    run_cfg = RunConfig(model=model_cfg, train=tc,
                        data=DataConfig(data_root=root, max_des_len=7),
                        output_dir=out_dir)

    def fresh_solver(stamp, key=0):
        params, state = init_spacap(jax.random.PRNGKey(key), model_cfg,
                                    dc.mean_size_arr)
        tl = DataLoader(train_ds, 8, shuffle=True, seed=tc.seed, num_workers=1)
        vl = DataLoader(val_ds, 8, shuffle=False, num_workers=1)
        return Solver(run_cfg, params, state, tl, vl, train_ds, val_ds,
                      vocab, dc, anns, stamp=stamp, mesh=mesh)

    # ---- run A: 3 uninterrupted epochs --------------------------------
    a = fresh_solver("meshA")
    # every batch must be genuinely sharded (not replicated) on the mesh
    sharded = []
    orig_to_dev = a._to_device

    def checking_to_dev(batch):
        out = orig_to_dev(batch)
        if "point_clouds" in out:   # val batches may stack a different set
            sharded.append(
                not out["point_clouds"].sharding.is_fully_replicated)
        return out

    a._to_device = checking_to_dev
    a(epochs=3, verbose=1)
    assert sharded and all(sharded)
    run_root = os.path.join(out_dir, "meshA")
    assert os.path.exists(os.path.join(run_root, "model_last.ckpt"))
    assert os.path.exists(os.path.join(run_root, "model.ckpt"))  # best save
    assert a.best["cider"] > -float("inf")                       # val ran

    # loss decreases across epochs (verbose=1 logged every iter)
    scalars = json.load(open(os.path.join(run_root, "all_scalars.json")))
    loss = [v for (_, _, v) in scalars["train/loss"]]
    steps_per_epoch = len(loss) // 3
    assert steps_per_epoch >= 2
    first_epoch = float(np.mean(loss[:steps_per_epoch]))
    last_epoch = float(np.mean(loss[-steps_per_epoch:]))
    assert last_epoch < first_epoch, (first_epoch, last_epoch)

    # ---- run B: 2 epochs, then restore + finish (the restart path) ----
    b = fresh_solver("meshB")
    b(epochs=2, verbose=1000)
    c = fresh_solver("meshC", key=7)     # different init: restore must win
    c.restore(os.path.join(out_dir, "meshB", "model_last.ckpt"))
    assert c.start_epoch == 2
    c(epochs=3, verbose=1000)            # resumes at epoch 2 on the mesh

    flat_a = jax.tree_util.tree_leaves(a.train_state.params)
    flat_c = jax.tree_util.tree_leaves(c.train_state.params)
    assert len(flat_a) == len(flat_c)
    for xa, xc in zip(flat_a, flat_c):
        np.testing.assert_array_equal(np.asarray(xa), np.asarray(xc))
    # BN running stats resume bit-compatibly too
    for xa, xc in zip(jax.tree_util.tree_leaves(a.train_state.state),
                      jax.tree_util.tree_leaves(c.train_state.state)):
        np.testing.assert_array_equal(np.asarray(xa), np.asarray(xc))
    assert int(a.train_state.step) == int(c.train_state.step) == len(loss)
    # best-checkpoint selection is resume-compatible too: the restored
    # run's in-loop validations see the SAME val point subsamples (the
    # val loader's epoch is pinned to the validation count, not its own
    # __iter__ count), so the best metrics match the uninterrupted run
    assert set(c.best) == set(a.best)
    for key in a.best:
        assert float(c.best[key]) == float(a.best[key]), (key, a.best, c.best)


def test_solver_profile_capture(world, tmp_path):
    import glob

    root, anns, train_ds, val_ds, vocab, dc, model_cfg = world
    out_dir = str(tmp_path / "prof_out")
    tc = TrainConfig(batch_size=4, epoch=1, val_step=0, use_relation=True)
    run_cfg = RunConfig(model=model_cfg, train=tc,
                        data=DataConfig(data_root=root, max_des_len=7),
                        output_dir=out_dir)
    params, state = init_spacap(jax.random.PRNGKey(1), model_cfg,
                                dc.mean_size_arr)
    train_loader = DataLoader(train_ds, 4, shuffle=False, num_workers=1)
    solver = Solver(run_cfg, params, state, train_loader, None, train_ds,
                    None, vocab, dc, anns, stamp="profrun")
    trace_dir = solver.profile(num_steps=2)
    assert glob.glob(trace_dir + "/**/*.xplane.pb", recursive=True)
