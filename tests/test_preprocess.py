"""Preprocessing tests: PLY round-trip, scene export, annotation organize."""
import json
import os

import numpy as np

from spacap3d_tpu.data import organize
from spacap3d_tpu.data.preprocess import (
    batch_export,
    compute_vertex_normals,
    read_ply_mesh,
)


def write_binary_ply(path, xyz, rgb, faces):
    n, f_cnt = len(xyz), len(faces)
    header = (
        "ply\nformat binary_little_endian 1.0\n"
        f"element vertex {n}\n"
        "property float x\nproperty float y\nproperty float z\n"
        "property uchar red\nproperty uchar green\nproperty uchar blue\n"
        f"element face {f_cnt}\n"
        "property list uchar int vertex_indices\nend_header\n"
    )
    vdt = np.dtype([("x", "<f4"), ("y", "<f4"), ("z", "<f4"),
                    ("red", "u1"), ("green", "u1"), ("blue", "u1")])
    verts = np.zeros(n, vdt)
    verts["x"], verts["y"], verts["z"] = xyz.T
    verts["red"], verts["green"], verts["blue"] = rgb.T
    fdt = np.dtype([("n", "u1"), ("v", "<i4", (3,))])
    frec = np.zeros(f_cnt, fdt)
    frec["n"] = 3
    frec["v"] = faces
    with open(path, "wb") as fh:
        fh.write(header.encode())
        fh.write(verts.tobytes())
        fh.write(frec.tobytes())


def make_raw_scene(scan_dir, scene_id, rng):
    d = os.path.join(scan_dir, scene_id)
    os.makedirs(d, exist_ok=True)
    base = os.path.join(d, scene_id)
    # two cubes of points + faces
    n_per = 60
    xyz = np.concatenate([
        rng.rand(n_per, 3) + [0, 0, 0],
        rng.rand(n_per, 3) + [3, 0, 0],
    ]).astype(np.float32)
    rgb = (rng.rand(2 * n_per, 3) * 255).astype(np.uint8)
    faces = np.stack([
        np.arange(0, 30), np.arange(1, 31), np.arange(2, 32)
    ], 1)
    write_binary_ply(base + "_vh_clean_2.ply", xyz, rgb, faces)
    # segments: one segment per vertex
    with open(base + "_vh_clean_2.0.010000.segs.json", "w") as f:
        json.dump({"segIndices": list(range(2 * n_per))}, f)
    # two objects: chair (vertices 0..59), table (60..119)
    agg = {"segGroups": [
        {"objectId": 0, "label": "chair", "segments": list(range(n_per))},
        {"objectId": 1, "label": "table", "segments": list(range(n_per, 2 * n_per))},
    ]}
    with open(base + ".aggregation.json", "w") as f:
        json.dump(agg, f)
    with open(base + ".txt", "w") as f:
        f.write("axisAlignment = 1 0 0 0 0 1 0 0 0 0 1 0 0 0 0 1\n")


def test_ply_roundtrip(tmp_path, rng):
    xyz = rng.rand(50, 3).astype(np.float32)
    rgb = (rng.rand(50, 3) * 255).astype(np.uint8)
    faces = np.stack([np.zeros(10, int), np.arange(1, 11), np.arange(2, 12)], 1)
    p = str(tmp_path / "m.ply")
    write_binary_ply(p, xyz, rgb, faces)
    verts, f2 = read_ply_mesh(p)
    np.testing.assert_allclose(verts["x"], xyz[:, 0], rtol=1e-6)
    np.testing.assert_array_equal(f2, faces)


def test_vertex_normals_flat_plane(rng):
    xyz = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [1, 1, 0]], float)
    faces = np.array([[0, 1, 2], [1, 3, 2]])
    n = compute_vertex_normals(xyz, faces)
    np.testing.assert_allclose(np.abs(n[:, 2]), 1.0, atol=1e-9)


def test_export_scene(tmp_path, rng):
    scan_dir = str(tmp_path / "scans")
    out_dir = str(tmp_path / "out")
    make_raw_scene(scan_dir, "scene0001_00", rng)
    tsv = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "spacap3d_tpu", "data", "meta", "scannetv2-labels.combined.tsv",
    )
    done, failed = batch_export(scan_dir, ["scene0001_00"], tsv, out_dir,
                                verbose=False)
    assert done == ["scene0001_00"] and not failed
    base = os.path.join(out_dir, "scene0001_00")
    vert = np.load(base + "_aligned_vert.npy")
    assert vert.shape[1] == 9  # xyz rgb normal
    sem = np.load(base + "_sem_label.npy")
    ins = np.load(base + "_ins_label.npy")
    assert set(np.unique(ins)) == {1, 2}
    bboxes = np.load(base + "_aligned_bbox.npy")
    assert bboxes.shape == (2, 8)  # chair + table both detection classes
    assert set(bboxes[:, 7]) == {0, 1}
    for ax in ("x", "y", "z"):
        assert os.path.exists(base + f"_{ax}.npy")
    # chair maps to nyu40 5, table to 7 via the tsv
    assert sem[0] == 5 and sem[-1] == 7


def test_organize_and_tokenize():
    anns = [
        {"scene_id": "s1", "object_id": "3", "ann_id": "0", "x": 1},
        {"scene_id": "s1", "object_id": "3", "ann_id": "1", "x": 2},
        {"scene_id": "s2", "object_id": "0", "ann_id": "0", "x": 3},
    ]
    org = organize.organize(anns)
    assert org["s1"]["3"]["1"]["x"] == 2
    assert organize.tokenize("The RED chair, next-to table!") == [
        "the", "red", "chair", "next", "to", "table"]
