"""Tensor parallelism (the opt-in ``model`` mesh axis, parallel/tp.py).

The reference has no TP (DataParallel only, scripts/train.py:198-200);
this is a framework capability for scaled-up transformer configs. These
tests pin (a) the layout — which leaves shard and which replicate, with
the divisibility guard, and (b) numerics — a TP train step and a TP
greedy decode match the replicated model on the same data.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from spacap3d_tpu.config import TrainConfig
from spacap3d_tpu.data.scannet_config import ScannetDatasetConfig
from spacap3d_tpu.data.synthetic import synthetic_batch
from spacap3d_tpu.models import init_spacap
from spacap3d_tpu.parallel.mesh import shard_batch
from spacap3d_tpu.parallel.tp import (
    count_sharded,
    make_tp_mesh,
    shard_params,
    tp_param_specs,
)
from spacap3d_tpu.train.step import (
    eval_input_batch,
    init_train_state,
    make_eval_step,
    make_optimizer,
    make_train_step,
)
from tests.test_train_e2e import MODEL_CFG

CFG = dataclasses.replace(MODEL_CFG, vocab_size=64)


@pytest.fixture(scope="module")
def world():
    dc = ScannetDatasetConfig()
    params, state = init_spacap(jax.random.PRNGKey(0), CFG, dc.mean_size_arr)
    batch, _, _ = synthetic_batch(CFG, batch_size=4, vocab_size=CFG.vocab_size)
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    return params, state, batch


def test_tp_param_specs_layout(world):
    params, _, _ = world
    specs = tp_param_specs(params, 2)
    enc0 = specs["caption"]["model"]["encoder"]["layers"][0]
    assert enc0["self_attn"]["linears0"]["kernel"] == P(None, "model")
    assert enc0["self_attn"]["linears0"]["bias"] == P("model")
    assert enc0["self_attn"]["linears3"]["kernel"] == P("model", None)
    assert enc0["self_attn"]["linears3"]["bias"] == P()
    assert enc0["feed_forward"]["w_1"]["kernel"] == P(None, "model")
    assert enc0["feed_forward"]["w_2"]["kernel"] == P("model", None)
    assert enc0["feed_forward"]["w_2"]["bias"] == P()
    assert enc0["sublayer0"]["norm"]["scale"] == P()
    # everything outside the captioner replicates
    for leaf_spec in jax.tree_util.tree_leaves(
        {k: v for k, v in specs.items() if k != "caption"},
        is_leaf=lambda x: isinstance(x, P),
    ):
        assert leaf_spec == P()
    # embeddings / generator / relation head replicate too
    assert specs["caption"]["model"]["generator"]["proj"]["kernel"] == P()
    assert specs["caption"]["model"]["tgt_embed"]["lut"]["kernel"] == P()

    # divisibility guard: 4 heads * dk onto a 3-way axis must raise
    with pytest.raises(ValueError, match="not divisible"):
        tp_param_specs(params, 3)


def test_tp_train_step_matches_replicated(world):
    """Pure-TP equality: a (data=1, model=2) mesh isolates the tensor-
    parallel split — the only reassociation is the halved captioner
    contractions, so every updated leaf matches the replicated step to
    ~4e-6 abs and the loss is bit-equal (measured). A combined
    (data>1, model=2) mesh additionally reassociates the BatchNorm
    batch-stat reductions across the data split, which the separate
    combined-mesh test below covers at the metrics level."""
    params, state, batch = world
    tc = TrainConfig(batch_size=4, use_relation=True)
    rng = jax.random.PRNGKey(5)

    # SGD, not Adam, for the equality run: Adam's m/(sqrt(v)+eps) is a
    # sign function at step 1, so a 1e-7 reassociation wobble on a
    # near-zero gradient flips one update by 2*lr — with SGD the update
    # is proportional to the grad and tolerances mean what they say.
    import optax

    tx = optax.sgd(1e-2)
    ts = init_train_state(params, state, tx)
    step = make_train_step(CFG, tc, tx)
    ts1, m1 = step(ts, batch, rng, 0.1)

    # (data=1, model=2) mesh: TP only
    mesh = make_tp_mesh(jax.devices()[:2], tp=2)
    p_tp = shard_params(mesh, params)
    assert count_sharded(p_tp) > 0
    # one whole-head slice per shard: (d, d) qkv kernels split on dim 1
    k0 = p_tp["caption"]["model"]["encoder"]["layers"][0]["self_attn"][
        "linears0"]["kernel"]
    assert not k0.sharding.is_fully_replicated
    ts_tp = init_train_state(p_tp, state, tx)
    step_tp = make_train_step(CFG, tc, tx, mesh=mesh)
    ts2, m2 = step_tp(ts_tp, shard_batch(mesh, batch), rng, 0.1)

    np.testing.assert_allclose(
        float(m1["loss"]), float(m2["loss"]), rtol=1e-5, atol=1e-7
    )
    for k in ("cap_loss", "relation_loss", "vote_loss", "objectness_loss"):
        np.testing.assert_allclose(
            float(m1[k]), float(m2[k]), rtol=1e-5, atol=1e-7, err_msg=k
        )
    # updated params agree leaf-for-leaf (TP reassociates the split
    # captioner contractions fwd+bwd; measured worst leaf ~4e-6 abs)
    l1 = jax.tree_util.tree_leaves(ts1.params)
    l2 = jax.tree_util.tree_leaves(ts2.params)
    for a, b in zip(l1, l2):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5
        )


def test_tp_with_dp_train_step(world):
    """Combined (data=4, model=2) mesh: the production layout when both
    axes are in play. The data split reassociates the BN batch-stat
    reductions (partial sums per shard + psum), so leaf-exact equality is
    not the contract here — the losses must agree to float-sum tolerance
    and the step must actually shard (params over model, batch over
    data)."""
    params, state, batch = world
    tc = TrainConfig(batch_size=4, use_relation=True)
    rng = jax.random.PRNGKey(5)
    import optax

    tx = optax.sgd(1e-2)
    ts = init_train_state(params, state, tx)
    step = make_train_step(CFG, tc, tx)
    _, m1 = step(ts, batch, rng, 0.1)

    mesh = make_tp_mesh(jax.devices(), tp=2)
    assert dict(mesh.shape) == {"data": 4, "model": 2}
    p_tp = shard_params(mesh, params)
    ts_tp = init_train_state(p_tp, state, tx)
    step_tp = make_train_step(CFG, tc, tx, mesh=mesh)
    sb = shard_batch(mesh, batch)
    assert not sb["point_clouds"].sharding.is_fully_replicated
    ts2, m2 = step_tp(ts_tp, sb, rng, 0.1)

    for k in ("loss", "cap_loss", "relation_loss", "vote_loss",
              "objectness_loss"):
        np.testing.assert_allclose(
            float(m1[k]), float(m2[k]), rtol=1e-4, atol=1e-6, err_msg=k
        )
    # the updated captioner params keep their TP layout (no silent
    # re-replication by GSPMD)
    k0 = ts2.params["caption"]["model"]["encoder"]["layers"][0][
        "self_attn"]["linears0"]["kernel"]
    assert not k0.sharding.is_fully_replicated


def test_tp_solver_loop_and_restore(tmp_path):
    """The production Solver on a (data=4, model=2) mesh: params TP-placed
    at init, the per-leaf optimizer chain (the flat-grouped concatenation
    would mix layouts), checkpoint save, and a restore that re-commits the
    TP layout (checkpoints snapshot to host numpy, so the restored leaves
    must be placed back on the 'model' axis)."""
    import json
    import os

    from spacap3d_tpu.config import DataConfig, RunConfig
    from spacap3d_tpu.data.dataset import ScanReferDataset, SceneStore
    from spacap3d_tpu.data.loader import DataLoader
    from spacap3d_tpu.data.synthetic import write_synthetic_dataset
    from spacap3d_tpu.data.vocabulary import Vocabulary
    from spacap3d_tpu.train.solver import Solver

    root = str(tmp_path / "data")
    anns, scene_ids = write_synthetic_dataset(root, num_scenes=2, seed=3)
    data_cfg = DataConfig(data_root=root, num_points=MODEL_CFG.num_points,
                          augment=True, use_relation=True, max_des_len=7)
    dc = ScannetDatasetConfig()
    scenes = SceneStore(data_cfg.scannet_data, scene_ids, load_relations=True)
    vocab = Vocabulary.build(anns, max_len=7)
    train_ds = ScanReferDataset(anns, scenes, vocab, dc, data_cfg,
                                split="train")
    model_cfg = dataclasses.replace(MODEL_CFG, vocab_size=len(vocab))
    mesh = make_tp_mesh(jax.devices(), tp=2)
    out_dir = str(tmp_path / "outputs")
    tc = TrainConfig(batch_size=8, epoch=2, val_step=0, use_relation=True,
                     ckpt_every=1, seed=5)
    run_cfg = RunConfig(model=model_cfg, train=tc,
                        data=DataConfig(data_root=root, max_des_len=7),
                        output_dir=out_dir)

    def fresh(stamp, key=0):
        params, state = init_spacap(jax.random.PRNGKey(key), model_cfg,
                                    dc.mean_size_arr)
        tl = DataLoader(train_ds, 8, shuffle=True, seed=tc.seed,
                        num_workers=1)
        return Solver(run_cfg, params, state, tl, None, train_ds, None,
                      vocab, dc, anns, stamp=stamp, mesh=mesh)

    a = fresh("tpA")
    k0 = a.train_state.params["caption"]["model"]["encoder"]["layers"][0][
        "self_attn"]["linears0"]["kernel"]
    assert not k0.sharding.is_fully_replicated, "solver did not TP-place"
    a(epochs=2, verbose=1)
    run_root = os.path.join(out_dir, "tpA")
    assert os.path.exists(os.path.join(run_root, "model_last.ckpt"))
    scalars = json.load(open(os.path.join(run_root, "all_scalars.json")))
    loss = [v for (_, _, v) in scalars["train/loss"]]
    half = len(loss) // 2
    assert float(np.mean(loss[half:])) < float(np.mean(loss[:half])), loss

    # restore into a fresh TP solver: exact params, TP layout re-committed
    b = fresh("tpB", key=7)
    b.restore(os.path.join(run_root, "model_last.ckpt"))
    assert b.start_epoch == 2
    for xa, xb in zip(jax.tree_util.tree_leaves(a.train_state.params),
                      jax.tree_util.tree_leaves(b.train_state.params)):
        np.testing.assert_array_equal(np.asarray(xa), np.asarray(xb))
    kb = b.train_state.params["caption"]["model"]["encoder"]["layers"][0][
        "self_attn"]["linears0"]["kernel"]
    assert not kb.sharding.is_fully_replicated, "restore lost the TP layout"
    # the restored optimizer state is placed where its param twin lives
    m0 = jax.tree_util.tree_leaves(b.train_state.opt_state)
    assert any(
        getattr(x, "sharding", None) is not None
        and not x.sharding.is_fully_replicated
        for x in m0
    ), "restored Adam moments all replicated"


def test_tp_greedy_decode_matches_replicated(world):
    params, state, batch = world
    ebatch = eval_input_batch(batch)

    step = make_eval_step(CFG)
    ep1 = step(params, state, ebatch)

    mesh = make_tp_mesh(jax.devices(), tp=2)
    p_tp = shard_params(mesh, params)
    step_tp = make_eval_step(CFG, mesh=mesh)
    ep2 = step_tp(p_tp, state, shard_batch(mesh, ebatch))

    np.testing.assert_array_equal(
        np.asarray(ep1["lang_cap"]), np.asarray(ep2["lang_cap"])
    )
    np.testing.assert_allclose(
        np.asarray(ep1["objectness_scores"]),
        np.asarray(ep2["objectness_scores"]),
        rtol=1e-5, atol=1e-6,
    )
