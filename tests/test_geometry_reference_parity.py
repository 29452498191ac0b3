"""Geometry parity vs the actual reference numpy code: box corner
construction (get_3d_box/get_3d_box_batch), the axis-aligned box re-fit
used by rotation augmentation, rotation matrices, and param2obb."""
import os
import sys
import types

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF), reason="no reference")


@pytest.fixture(scope="module")
def ref_mods():
    # stub deps the reference imports but these code paths never use
    if "easydict" not in sys.modules:
        ed = types.ModuleType("easydict")

        class EasyDict(dict):
            def __getattr__(self, k):
                try:
                    return self[k]
                except KeyError as e:
                    raise AttributeError(k) from e

            def __setattr__(self, k, v):
                self[k] = v

        ed.EasyDict = EasyDict
        sys.modules["easydict"] = ed
    sys.modules.setdefault("trimesh", types.ModuleType("trimesh"))
    plyfile = types.ModuleType("plyfile")
    plyfile.PlyData = plyfile.PlyElement = object
    sys.modules.setdefault("plyfile", plyfile)

    sys.path.insert(0, REF)
    try:
        from data.scannet import model_util_scannet as ref_mus
        from utils import box_util as ref_box
        from utils import pc_utils as ref_pc
    finally:
        sys.path.pop(0)
    return ref_mus, ref_box, ref_pc


def test_rotation_matrices_match(ref_mods, rng):
    _, _, ref_pc = ref_mods
    from spacap3d_tpu.data.dataset import rot_matrix

    for ang in (-0.1, 0.03, 0.5):
        np.testing.assert_allclose(rot_matrix(0, ang), ref_pc.rotx(ang), rtol=1e-12)
        np.testing.assert_allclose(rot_matrix(1, ang), ref_pc.roty(ang), rtol=1e-12)
        np.testing.assert_allclose(rot_matrix(2, ang), ref_pc.rotz(ang), rtol=1e-12)


def test_rotate_aligned_boxes_match(ref_mods, rng):
    ref_mus, _, ref_pc = ref_mods
    from spacap3d_tpu.data.dataset import rot_matrix, rotate_aligned_boxes_along_axis

    for seed in range(3):
        r = np.random.RandomState(seed)
        boxes = np.concatenate([r.rand(7, 3) * 5, 0.2 + r.rand(7, 3)], 1)
        for axis, name in ((0, "x"), (1, "y"), (2, "z")):
            ang = (r.rand() * np.pi / 18) - np.pi / 36
            rot = rot_matrix(axis, ang)
            mine = rotate_aligned_boxes_along_axis(boxes.copy(), rot, axis)
            want = ref_mus.rotate_aligned_boxes_along_axis(boxes.copy(), rot, name)
            np.testing.assert_allclose(mine, want, rtol=1e-12)


def test_box_corners_match(ref_mods, rng):
    _, ref_box, _ = ref_mods
    import jax.numpy as jnp

    from spacap3d_tpu.ops.boxes import get_3d_box_batch

    r = np.random.RandomState(1)
    sizes = 0.2 + r.rand(9, 3) * 2
    centers = r.rand(9, 3) * 6
    # ScanNet heading is always 0 -> reference corners with angle 0
    want = ref_box.get_3d_box_batch(sizes, np.zeros(9), centers)
    got = np.asarray(get_3d_box_batch(jnp.asarray(sizes.astype(np.float32)),
                                      None, jnp.asarray(centers.astype(np.float32))))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
    # heading path too (used by get_3d_box for the ref object)
    angles = r.rand(9) * 0.2 - 0.1
    want_rot = ref_box.get_3d_box_batch(sizes, angles, centers)
    got_rot = np.asarray(get_3d_box_batch(
        jnp.asarray(sizes.astype(np.float32)),
        jnp.asarray(angles.astype(np.float32)),
        jnp.asarray(centers.astype(np.float32)),
    ))
    np.testing.assert_allclose(got_rot, want_rot, rtol=1e-4, atol=1e-5)


def test_param2obb_matches(ref_mods):
    ref_mus, _, _ = ref_mods
    import lib  # noqa: F401  (path side effects already handled)
    from spacap3d_tpu.data.scannet_config import ScannetDatasetConfig

    # point the reference CONF at the real (read-only) reference data dir
    sys.path.insert(0, REF)
    try:
        from lib.config import CONF
    finally:
        sys.path.pop(0)
    CONF.PATH.SCANNET = os.path.join(REF, "data", "scannet")
    ref_dc = ref_mus.ScannetDatasetConfig()
    my_dc = ScannetDatasetConfig()
    np.testing.assert_allclose(my_dc.mean_size_arr, ref_dc.mean_size_arr)
    assert my_dc.type2class == ref_dc.type2class
    assert my_dc.nyu40id2class == ref_dc.nyu40id2class

    r = np.random.RandomState(2)
    center = r.rand(5, 3)
    hc = np.zeros(5, np.int64)
    hr = np.zeros(5)
    sc = r.randint(0, 18, 5)
    sr = r.randn(5, 3) * 0.1
    np.testing.assert_allclose(
        my_dc.param2obb_batch(center, hc, hr, sc, sr),
        ref_dc.param2obb_batch(center, hc, hr, sc, sr), rtol=1e-12,
    )


def test_nn_distance_matches_reference_torch(ref_mods, rng):
    """Reference utils/nn_distance.py is pure torch-CPU — compare all
    three distance modes and huber_loss directly."""
    import torch

    sys.path.insert(0, REF)
    try:
        from utils import nn_distance as ref_nnd
    finally:
        sys.path.pop(0)
    import jax.numpy as jnp

    from spacap3d_tpu.ops.nn_distance import huber_loss, nn_distance

    r = np.random.RandomState(3)
    pc1 = r.randn(2, 9, 3).astype(np.float32)
    pc2 = r.randn(2, 6, 3).astype(np.float32)
    t1, t2 = torch.from_numpy(pc1), torch.from_numpy(pc2)

    for kwargs in (dict(), dict(l1=True), dict(l1smooth=True, delta=0.7)):
        want = ref_nnd.nn_distance(t1, t2, **kwargs)
        got = nn_distance(jnp.asarray(pc1), jnp.asarray(pc2), **kwargs)
        for g, w in zip(got, want):
            np.testing.assert_allclose(np.asarray(g), w.numpy(), rtol=1e-5,
                                       atol=1e-6)

    err = r.randn(4, 5).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(huber_loss(jnp.asarray(err), 0.8)),
        ref_nnd.huber_loss(torch.from_numpy(err), 0.8).numpy(), rtol=1e-6,
    )
