"""Data pipeline tests: synthetic scenes -> dataset -> loader batches."""
import numpy as np
import pytest

from spacap3d_tpu.config import MAX_DES_LEN, MAX_NUM_OBJ, DataConfig
from spacap3d_tpu.data.dataset import ScanReferDataset, SceneStore, compute_votes
from spacap3d_tpu.data.loader import DataLoader
from spacap3d_tpu.data.scannet_config import ScannetDatasetConfig
from spacap3d_tpu.data.spatiality import generate_relation_labels
from spacap3d_tpu.data.synthetic import write_synthetic_dataset
from spacap3d_tpu.data.vocabulary import Vocabulary


@pytest.fixture(scope="module")
def synth(tmp_path_factory):
    root = tmp_path_factory.mktemp("data")
    anns, scene_ids = write_synthetic_dataset(str(root), num_scenes=2, seed=0)
    return str(root), anns, scene_ids


def make_dataset(root, anns, scene_ids, augment=False, use_relation=True):
    cfg = DataConfig(data_root=root, num_points=2000, augment=augment,
                     use_relation=use_relation)
    dc = ScannetDatasetConfig()
    scenes = SceneStore(cfg.scannet_data, scene_ids, load_relations=use_relation)
    vocab = Vocabulary.build(anns)
    return ScanReferDataset(anns, scenes, vocab, dc, cfg, split="train")


def test_item_shapes_and_semantics(synth):
    root, anns, scene_ids = synth
    ds = make_dataset(root, anns, scene_ids)
    item = ds.__getitem__(0, rng=np.random.RandomState(0))

    n = ds.cfg.num_points
    assert item["point_clouds"].shape == (n, 4)  # xyz + height
    assert item["vote_label"].shape == (n, 9)
    assert item["lang_ids"].shape == (MAX_DES_LEN + 2,)
    assert item["lang_label"].shape == (MAX_DES_LEN + 3,)
    assert item["lang_label"][0] == 1 and item["lang_ids"][0] == 2  # sos
    assert item["center_label"].shape == (MAX_NUM_OBJ, 3)
    assert item["gt_box_corner_label"].shape == (MAX_NUM_OBJ, 8, 3)
    assert item["x_label"].shape == (MAX_NUM_OBJ, MAX_NUM_OBJ)

    nb = int(item["num_bbox"])
    assert nb >= 1
    assert item["box_label_mask"][:nb].all()
    assert not item["box_label_mask"][nb:].any()
    # vote targets: masked points vote toward their instance center
    mask = item["vote_label_mask"].astype(bool)
    assert mask.sum() > 0
    votes = item["vote_label"][:, :3]
    assert np.abs(votes[mask]).max() < 3.0
    np.testing.assert_array_equal(votes[:, :3], item["vote_label"][:, 3:6])
    # ref object must exist and its corners bound its center
    assert item["ref_box_label"].sum() == 1
    lo, hi = item["ref_box_corner_label"].min(0), item["ref_box_corner_label"].max(0)
    assert (lo <= item["ref_center_label"] + 1e-6).all()
    assert (item["ref_center_label"] <= hi + 1e-6).all()


def test_augmentation_flips_relations(synth):
    root, anns, scene_ids = synth
    ds_plain = make_dataset(root, anns, scene_ids, augment=False)
    ds_aug = make_dataset(root, anns, scene_ids, augment=True)
    base = ds_plain.__getitem__(0, rng=np.random.RandomState(1))

    # find an rng where the x-flip triggers (first random_sample > 0.5)
    seed = next(s for s in range(50)
                if np.random.RandomState(s).random_sample() > 0.5)
    item = ds_aug.__getitem__(0, rng=np.random.RandomState(seed))
    nb = int(base["num_bbox"])
    bx, ax = base["x_label"][:nb, :nb], item["x_label"][:nb, :nb]
    # class 0 <-> 2 swapped wherever the base had a directional relation
    assert (ax[bx == 0] == 2).all()
    assert (ax[bx == 2] == 0).all()
    assert (ax[bx == 1] == 1).all()
    # z labels untouched by x flip... unless the y-flip also triggered; the
    # z relation never flips
    np.testing.assert_array_equal(base["z_label"][:nb, :nb], item["z_label"][:nb, :nb])


def test_loader_batches(synth):
    root, anns, scene_ids = synth
    ds = make_dataset(root, anns, scene_ids)
    dl = DataLoader(ds, batch_size=4, shuffle=True, seed=0, num_workers=2)
    batches = list(dl)
    assert len(batches) == len(dl)
    b0 = batches[0]
    assert b0["point_clouds"].shape == (4, ds.cfg.num_points, 4)
    assert b0["lang_ids"].shape[0] == 4
    # deterministic wrt seed/epoch
    dl2 = DataLoader(ds, batch_size=4, shuffle=True, seed=0, num_workers=2)
    b0b = next(iter(dl2))
    np.testing.assert_array_equal(b0["dataset_idx"], b0b["dataset_idx"])
    np.testing.assert_allclose(b0["point_clouds"], b0b["point_clouds"])


def test_spatiality_rules():
    # hand-built boxes: b1 on floor, b2 stacked well above b1, b3 beside b1
    boxes = np.array([
        [0.0, 0.0, 0.5, 1.0, 1.0, 1.0, 5, 0],   # base
        [0.0, 0.0, 2.0, 1.0, 1.0, 1.0, 5, 1],   # above base
        [3.0, 0.0, 0.5, 1.0, 1.0, 1.0, 5, 2],   # to +x of base
    ])
    rel = generate_relation_labels(boxes)
    z = rel["z"]
    # encoding (reference generate_spatiality_label.py:66-69):
    # z[i,j]==0 iff i above j; 2 iff j above i; 1 same
    assert z[1, 0] == 0 and z[0, 1] == 2
    assert z[0, 2] == 1 and z[2, 2] == 1
    x = rel["x"]
    # box2 entirely +x of box0 -> forward -> class 0 at [2,0], 2 at [0,2]
    assert x[2, 0] == 0 and x[0, 2] == 2
    # identical extents -> same
    assert x[0, 1] == 1 and x[1, 0] == 1


def test_compute_votes_matches_loop_oracle(rng):
    dc = ScannetDatasetConfig()
    n = 500
    xyz = rng.randn(n, 3).astype(np.float64)
    ins = rng.randint(0, 5, n)
    sem = np.where(ins % 2 == 0, 4, 1)  # even instances are class nyu=4
    votes, mask = compute_votes(xyz, ins, sem, dc)

    want_votes = np.zeros((n, 3))
    want_mask = np.zeros(n)
    for i in np.unique(ins):
        ind = np.where(ins == i)[0]
        if sem[ind[0]] in dc.nyu40ids:
            x = xyz[ind]
            c = 0.5 * (x.min(0) + x.max(0))
            want_votes[ind] = c - x
            want_mask[ind] = 1
    np.testing.assert_allclose(votes[:, :3], want_votes, atol=1e-12)
    np.testing.assert_array_equal(mask, want_mask)


def test_host_corner_signs_match_ops():
    """The host loader's numpy corner ordering must stay identical to the
    device op's (dataset avoids touching jax in its hot path — a per-call
    np.asarray(jnp const) cost ~1 s/item through the TPU tunnel)."""
    import numpy as np

    from spacap3d_tpu.data.dataset import _CORNER_SIGNS_NP
    from spacap3d_tpu.ops.boxes import _CORNER_SIGNS

    np.testing.assert_array_equal(_CORNER_SIGNS_NP, np.asarray(_CORNER_SIGNS))


def test_getitem_cached_bit_identical(synth):
    """The mul_eval fast path (per-scene features cached, only the point
    subsample per seed) must be bit-identical to a fresh __getitem__ for
    the same RNG state on non-augmented val items."""
    root, anns, scene_ids = synth
    cfg = DataConfig(data_root=root, num_points=2000, augment=False,
                     use_relation=False)
    dc = ScannetDatasetConfig()
    scenes = SceneStore(cfg.scannet_data, scene_ids, load_relations=False)
    vocab = Vocabulary.build(anns)
    ds = ScanReferDataset(anns, scenes, vocab, dc, cfg, split="val")

    for seed in (0, 7):
        for idx in (0, len(ds) - 1):
            want = ds.__getitem__(idx, rng=np.random.RandomState(seed))
            got = ds.getitem_cached(idx, rng=np.random.RandomState(seed))
            assert set(got) == set(want)
            for k in want:
                np.testing.assert_array_equal(got[k], want[k], err_msg=k)
    # second pass hits the warm cache
    want = ds.__getitem__(0, rng=np.random.RandomState(3))
    got = ds.getitem_cached(0, rng=np.random.RandomState(3))
    np.testing.assert_array_equal(got["point_clouds"], want["point_clouds"])

    # train/augment configurations must refuse the cached path
    ds_train = make_dataset(root, anns, scene_ids)
    with pytest.raises(AssertionError):
        ds_train.getitem_cached(0, rng=np.random.RandomState(0))
