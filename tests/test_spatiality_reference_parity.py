"""Spatial-relation GT parity against the ACTUAL reference generator.

data/scannet/generate_spatiality_label.py is pure numpy in its
npy-producing mode; run it on random box sets (in a temp cwd with the
expected ./scannet_data layout, stubbing its plotting-only deps) and
compare against spacap3d_tpu.data.spatiality bit-for-bit.
"""
import importlib
import os
import sys
import types

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.exists(os.path.join(REF, "data", "scannet",
                                    "generate_spatiality_label.py")),
    reason="no reference",
)


@pytest.fixture()
def ref_gen(tmp_path, monkeypatch):
    for mod in ("matplotlib", "matplotlib.pyplot", "seaborn", "pandas"):
        if mod not in sys.modules:
            try:
                importlib.import_module(mod)
            except ImportError:
                sys.modules[mod] = types.ModuleType(mod)
    sys.path.insert(0, os.path.join(REF, "data", "scannet"))
    try:
        import generate_spatiality_label as g
    finally:
        sys.path.pop(0)
    monkeypatch.chdir(tmp_path)
    os.makedirs("scannet_data", exist_ok=True)
    # the module resolves './scannet_data' relative to the cwd
    g.PROCESSED_DATA_FOLDER = "./scannet_data"
    return g


def test_relation_labels_match_reference(ref_gen, rng):
    from spacap3d_tpu.data.spatiality import generate_relation_labels

    for seed in range(4):
        r = np.random.RandomState(seed)
        m = r.randint(3, 12)
        center = r.rand(m, 3) * 5
        size = 0.2 + r.rand(m, 3) * 1.5
        boxes = np.concatenate(
            [center, size, r.randint(3, 40, (m, 1)), np.arange(m)[:, None]], 1
        )
        sid = f"scene{seed:04d}_00"
        np.save(f"scannet_data/{sid}_aligned_bbox.npy", boxes)

        ref_gen.get_z_relation_per_scene(sid, False, False, dryrun=False,
                                         verbose=False, save_npy=True)
        ref_gen.get_xy_relation_per_scene(0, sid, False, False, dryrun=False,
                                          verbose=False, save_npy=True)
        ref_gen.get_xy_relation_per_scene(1, sid, False, False, dryrun=False,
                                          verbose=False, save_npy=True)

        mine = generate_relation_labels(boxes)
        for ax in ("x", "y", "z"):
            want = np.load(f"scannet_data/{sid}_{ax}.npy")
            np.testing.assert_array_equal(mine[ax], want, err_msg=f"{ax} seed {seed}")


def test_heatmap_visualization_mode(tmp_path):
    """The data-integrity viz CLI (reference generate_spatiality_label.py
    :77-100,143-170): renders and saves <scene>_<axis>.png."""
    import sys

    import numpy as np

    sys.path.insert(0, "/root/repo/scripts")
    try:
        import visualize_spatiality as viz
    finally:
        sys.path.pop(0)

    rng = np.random.RandomState(0)
    m = 5
    bboxes = np.concatenate([
        rng.rand(m, 3) * 4,                   # centers
        rng.rand(m, 3) * 1.5 + 0.2,           # sizes
        rng.randint(3, 10, (m, 1)).astype(float),   # nyu40
        np.arange(m, dtype=float)[:, None],   # obj id
    ], axis=1)
    np.save(tmp_path / "scene0000_00_aligned_bbox.npy", bboxes)
    viz.main([
        "--scannet_data", str(tmp_path), "--scene_id", "scene0000_00",
        "--axis", "z", "--savefig", "--regenerate", "--verbose",
    ])
    out = tmp_path / "scene0000_00_z.png"
    assert out.exists() and out.stat().st_size > 1000
    # dryrun writes nothing
    viz.main([
        "--scannet_data", str(tmp_path), "--scene_id", "scene0000_00",
        "--axis", "x", "--savefig", "--regenerate", "--dryrun",
    ])
    assert not (tmp_path / "scene0000_00_x.png").exists()
