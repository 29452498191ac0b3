"""Script-level tests for the data-prep helper CLIs.

Covers the reference's standalone helpers end-to-end
(organize_scanrefer.py, split_referit3d.py, organize_referit3d.py,
compute_multiview_features.py, project_multiview_features.py,
project_multiview_labels.py) on tiny synthetic inputs — the library
functions behind them are unit-tested elsewhere; these pin the CLI
surfaces a reference user invokes."""
import csv
import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPTS = os.path.join(REPO, "scripts")
sys.path.insert(0, SCRIPTS)


def test_organize_scanrefer_cli(tmp_path):
    import organize_scanrefer

    anns = [
        {"scene_id": "scene0000_00", "object_id": "1", "ann_id": "0",
         "description": "a red chair", "token": ["a", "red", "chair"]},
        {"scene_id": "scene0000_00", "object_id": "1", "ann_id": "1",
         "description": "the chair", "token": ["the", "chair"]},
        {"scene_id": "scene0011_00", "object_id": "2", "ann_id": "0",
         "description": "a table", "token": ["a", "table"]},
    ]
    root = str(tmp_path)
    with open(os.path.join(root, "ScanRefer_filtered.json"), "w") as f:
        json.dump(anns, f)
    organize_scanrefer.main(["--data_root", root])
    org = json.load(open(os.path.join(
        root, "ScanRefer_filtered_organized.json")))
    # reference layout: {scene: {object: {ann: entry}}}
    assert org["scene0000_00"]["1"]["1"]["description"] == "the chair"
    assert set(org) == {"scene0000_00", "scene0011_00"}


def test_split_and_organize_referit3d_cli(tmp_path):
    import organize_referit3d
    import split_referit3d

    root = str(tmp_path)
    csv_path = os.path.join(root, "nr3d.csv")
    rows = [
        # scene0000_00 is in the ScanNet train split, scene0011_00 in val
        {"scan_id": "scene0000_00", "target_id": "3",
         "instance_type": "office chair", "utterance": "The red chair."},
        {"scan_id": "scene0000_00", "target_id": "3",
         "instance_type": "office chair", "utterance": "Chair by the desk."},
        {"scan_id": "scene0011_00", "target_id": "5",
         "instance_type": "table", "utterance": "A round table."},
        {"scan_id": "sceneXXXX_00", "target_id": "9",
         "instance_type": "ghost", "utterance": "Not in any split."},
    ]
    with open(csv_path, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(rows[0]))
        w.writeheader()
        w.writerows(rows)

    split_referit3d.main(["--csv", csv_path, "--data_root", root])
    train = json.load(open(os.path.join(root, "nr3d_train.json")))
    val = json.load(open(os.path.join(root, "nr3d_val.json")))
    assert [a["scene_id"] for a in train] == ["scene0000_00"] * 2
    assert [a["ann_id"] for a in train] == ["0", "1"]   # per-object counter
    assert train[0]["object_name"] == "office_chair"
    assert val[0]["token"] == ["a", "round", "table"]
    # organized file written by the split step covers train+val (the
    # reference's organize_referit3d.py parses the WHOLE csv)
    org = json.load(open(os.path.join(root, "nr3d_organized.json")))
    assert org["scene0011_00"]["5"]["0"]["description"] == "A round table."
    assert set(org) == {"scene0000_00", "scene0011_00"}

    # the standalone organize CLI reproduces the IDENTICAL file from the
    # split jsons (idempotent across its two input paths)
    os.remove(os.path.join(root, "nr3d_organized.json"))
    organize_referit3d.main(["--csv", csv_path, "--data_root", root])
    org2 = json.load(open(os.path.join(root, "nr3d_organized.json")))
    assert org2 == org


@pytest.fixture()
def frames_world(tmp_path):
    """One synthetic scene: points on a plane in front of an identity-pose
    camera, 2 frames of color/depth/pose + intrinsic."""
    from PIL import Image

    scene = "scene0000_00"
    root = str(tmp_path)
    scene_dir = os.path.join(root, "scannet_data")
    frames_root = os.path.join(root, "frames")
    os.makedirs(scene_dir)
    for sub in ("color", "depth", "pose"):
        os.makedirs(os.path.join(frames_root, scene, sub))

    h, w = 64, 80
    rng = np.random.RandomState(0)
    # points spread across the camera frustum at z=2 (camera looks +z)
    pts = np.stack([
        rng.uniform(-0.5, 0.5, 200), rng.uniform(-0.4, 0.4, 200),
        np.full(200, 2.0),
    ], 1).astype(np.float32)
    vert = np.concatenate([pts, np.zeros((200, 6), np.float32)], 1)
    np.save(os.path.join(scene_dir, scene + "_aligned_vert.npy"), vert)

    intr = np.eye(4)
    intr[0, 0] = intr[1, 1] = 60.0
    intr[0, 2], intr[1, 2] = w / 2, h / 2
    np.savetxt(os.path.join(frames_root, scene, "intrinsic.txt"), intr)
    for fid in ("0", "20"):
        img = (rng.rand(h, w, 3) * 255).astype(np.uint8)
        Image.fromarray(img).save(
            os.path.join(frames_root, scene, "color", fid + ".jpg"))
        depth_mm = np.full((h, w), 2000, np.uint16)  # everything at 2 m
        Image.fromarray(depth_mm, mode="I;16").save(
            os.path.join(frames_root, scene, "depth", fid + ".png"))
        np.savetxt(os.path.join(frames_root, scene, "pose", fid + ".txt"),
                   np.eye(4))
    return root, scene, scene_dir, frames_root, (h, w)


def test_multiview_scripts_end_to_end(frames_world):
    """compute features -> project features (hdf5) -> project labels
    (colored ply), all through the real CLIs with a default-init ENet."""
    import h5py

    import compute_multiview_features
    import project_multiview_features
    import project_multiview_labels

    root, scene, scene_dir, frames_root, (h, w) = frames_world
    feats_root = os.path.join(root, "enet_feats")
    # the scripts use parse_args() without argv; drive via sys.argv
    argv_bak = sys.argv
    try:
        sys.argv = ["x", "--frames_root", frames_root,
                    "--out_root", feats_root,
                    "--image_h", str(h), "--image_w", str(w)]
        compute_multiview_features.main()
        f0 = np.load(os.path.join(feats_root, scene, "0.npy"))
        assert f0.shape == (h // 8, w // 8, 128)

        out_h5 = os.path.join(root, "enet_feats_maxpool.hdf5")
        sys.argv = ["x", "--scene_dir", scene_dir,
                    "--frames_root", frames_root,
                    "--features_root", feats_root, "--out", out_h5,
                    "--depth_max", "4.0"]
        project_multiview_features.main()
        with h5py.File(out_h5) as f:
            agg = f[scene][...]
        assert agg.shape == (200, 128)
        assert np.abs(agg).sum() > 0          # points actually got features
    finally:
        sys.argv = argv_bak

    ply_root = os.path.join(root, "label_ply")
    project_multiview_labels.main([
        "--scene_id", scene, "--scene_dir", scene_dir,
        "--frames_root", frames_root, "--out_root", ply_root,
        "--image_h", str(h), "--image_w", str(w), "--maxpool",
    ])
    ply = os.path.join(ply_root, scene + ".ply")
    assert os.path.exists(ply)
    head = open(ply, "rb").read(400)
    assert b"element vertex 200" in head and b"red" in head


def test_project_labels_uses_classifier_logits(frames_world):
    """The projected labels must come from the 41-class CLASSIFIER
    logits, not the 128-channel feature map: force the classifier to
    always predict class 40 via a crafted checkpoint (zero 1x1 kernel,
    bias peaked at 40 — a value no in-range feature argmax could produce
    for every pixel) and assert every labeled point renders with
    palette[40]. Also covers the default first-projection-wins mode
    (no --maxpool)."""
    import pickle

    import jax
    import jax.numpy as jnp

    import project_multiview_labels
    from spacap3d_tpu.models.enet import ENET_CLASSIFIER_KEY, init_enet

    root, scene, scene_dir, frames_root, (h, w) = frames_world
    params, state = init_enet(jax.random.PRNGKey(0))
    kern = params[ENET_CLASSIFIER_KEY]["kernel"]        # (1, 1, 128, 41)
    bias = np.zeros((41,), np.float32)
    bias[40] = 10.0
    params[ENET_CLASSIFIER_KEY] = {"kernel": jnp.zeros_like(kern),
                                   "bias": jnp.asarray(bias)}
    ckpt = os.path.join(root, "forced_enet.pkl")
    with open(ckpt, "wb") as f:
        pickle.dump({"params": params, "state": state}, f)

    ply_root = os.path.join(root, "label_ply_forced")
    project_multiview_labels.main([
        "--scene_id", scene, "--scene_dir", scene_dir,
        "--frames_root", frames_root, "--out_root", ply_root,
        "--image_h", str(h), "--image_w", str(w),
        "--enet_ckpt", ckpt,
    ])
    data = open(os.path.join(ply_root, scene + ".ply")).read()
    lines = data.split("end_header\n", 1)[1].strip().splitlines()
    colors = np.array([ln.split()[3:6] for ln in lines], int)
    assert colors.shape == (200, 3)
    want = np.asarray(project_multiview_labels.NYU40_PALETTE[40], int)
    labeled = (colors != 0).any(1)
    assert labeled.sum() > 100                  # most points project
    assert (colors[labeled] == want).all()


def test_visualize_scene_cli(tmp_path):
    """Scene data-integrity dump (reference data/scannet/visualize.py):
    exported npy bundle -> colored obj/ply + per-GT-box cylinder meshes."""
    from spacap3d_tpu.data.synthetic import write_synthetic_dataset

    import visualize_scene

    root = str(tmp_path / "data")
    anns, scene_ids = write_synthetic_dataset(root, num_scenes=1, seed=7)
    scene = scene_ids[0]
    scene_dir = os.path.join(root, "scannet", "scannet_data")
    if not os.path.exists(os.path.join(scene_dir,
                                       scene + "_aligned_vert.npy")):
        scene_dir = os.path.join(root, "scannet_data")
    out_dir = str(tmp_path / "vis")
    argv_bak = sys.argv
    try:
        sys.argv = ["x", "--scene_dir", scene_dir, "--scene_id", scene,
                    "--out_dir", out_dir, "--color_by_instance"]
        visualize_scene.main()
    finally:
        sys.argv = argv_bak
    assert os.path.exists(os.path.join(out_dir, scene + ".obj"))
    assert os.path.exists(os.path.join(out_dir, scene + ".ply"))
    n_boxes = np.load(os.path.join(
        scene_dir, scene + "_aligned_bbox.npy")).shape[0]
    boxes = [f for f in os.listdir(out_dir) if "_gtbox_" in f]
    assert len(boxes) == n_boxes
