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
