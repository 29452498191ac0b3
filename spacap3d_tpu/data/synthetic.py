"""Synthetic ScanNet-like scene generator.

Produces scenes + annotations in exactly the on-disk format the real
preprocessing emits (reference data/scannet/batch_load_scannet_data.py
outputs + ScanRefer json schema), so the full train/eval stack — dataset,
loader, model, losses, caption+detection eval — runs end-to-end in tests
and benchmarks without the (non-redistributable) ScanNet release.
"""
from __future__ import annotations

import json
import os
from typing import Dict, List, Tuple

import numpy as np

from spacap3d_tpu.data.scannet_config import ScannetDatasetConfig
from spacap3d_tpu.data.spatiality import generate_relation_labels

_WORDS = [
    "the", "a", "chair", "table", "brown", "red", "large", "small", "next",
    "to", "door", "window", "wooden", "on", "left", "right", "corner", "room",
    "this", "is", "near", "it", "desk", "bed", "sofa", "shelf", "cabinet",
]


def make_scene(
    rng: np.random.RandomState,
    num_objects: int = 6,
    points_per_object: int = 800,
    background_points: int = 3000,
    extent: float = 6.0,
    dc: ScannetDatasetConfig | None = None,
):
    """Returns (arrays dict, annotations list) for one scene."""
    dc = dc or ScannetDatasetConfig()
    boxes = []
    pts, ins, sem = [], [], []
    nyu_ids = [3, 4, 5, 6, 7, 8, 9, 10][: max(num_objects, 1)]
    for i in range(num_objects):
        size = rng.uniform(0.4, 1.4, 3)
        center = np.array([
            rng.uniform(0.5, extent - 0.5),
            rng.uniform(0.5, extent - 0.5),
            rng.uniform(0.3, 1.5),
        ])
        nyu = nyu_ids[i % len(nyu_ids)]
        boxes.append(np.concatenate([center, size, [nyu, i]]))
        p = center + (rng.rand(points_per_object, 3) - 0.5) * size
        pts.append(p)
        ins.append(np.full(points_per_object, i + 1))
        sem.append(np.full(points_per_object, nyu))
    # background: floor + walls (instance 0, semantic 1/2 — excluded classes)
    bg = np.stack([
        rng.uniform(0, extent, background_points),
        rng.uniform(0, extent, background_points),
        np.abs(rng.randn(background_points)) * 0.02,
    ], axis=1)
    pts.append(bg)
    ins.append(np.zeros(background_points))
    sem.append(np.full(background_points, 2))  # floor

    xyz = np.concatenate(pts).astype(np.float32)
    rgb = (np.clip(rng.rand(len(xyz), 3), 0, 1) * 255).astype(np.float32)
    normals = np.tile(np.array([[0.0, 0.0, 1.0]], np.float32), (len(xyz), 1))
    vertices = np.concatenate([xyz, rgb, normals], axis=1)

    arrays = {
        "aligned_vert": vertices,
        "ins_label": np.concatenate(ins).astype(np.int64),
        "sem_label": np.concatenate(sem).astype(np.int64),
        "aligned_bbox": np.stack(boxes),
    }
    arrays.update({
        ax: mat for ax, mat in generate_relation_labels(arrays["aligned_bbox"]).items()
    })
    return arrays


def make_annotations(
    rng: np.random.RandomState, scene_id: str, bboxes: np.ndarray,
    anns_per_object: int = 2, dc: ScannetDatasetConfig | None = None,
) -> List[dict]:
    dc = dc or ScannetDatasetConfig()
    id2type = {v: k for k, v in dc.type2class.items()}
    anns = []
    for row in bboxes:
        nyu, obj_id = int(row[6]), int(row[7])
        cls = dc.nyu40id2class.get(nyu, 17)
        name = id2type[cls].replace(" ", "_")
        for a in range(anns_per_object):
            n_tok = rng.randint(5, 14)
            tokens = [_WORDS[rng.randint(len(_WORDS))] for _ in range(n_tok)]
            anns.append({
                "scene_id": scene_id,
                "object_id": str(obj_id),
                "object_name": name,
                "ann_id": str(a),
                "description": " ".join(tokens),
                "token": tokens,
            })
    return anns


def synthetic_batch(
    model_cfg, batch_size: int = 2, seed: int = 0,
    num_objects: int = 6, vocab_size: int | None = None,
    use_relation: bool = True, max_des_len: int | None = None,
):
    """Builds a full in-memory training batch (no disk IO) with every key
    the loss layer consumes — used by __graft_entry__ and bench.py."""
    from spacap3d_tpu.config import DataConfig
    from spacap3d_tpu.data.dataset import ScanReferDataset, Scene, SceneStore
    from spacap3d_tpu.data.loader import stack_batch
    from spacap3d_tpu.data.vocabulary import Vocabulary

    rng = np.random.RandomState(seed)
    dc = ScannetDatasetConfig()
    max_des = max_des_len if max_des_len is not None else model_cfg.max_des_len
    data_cfg = DataConfig(
        num_points=model_cfg.num_points, augment=False,
        use_relation=use_relation, max_des_len=max_des,
    )

    store = SceneStore.__new__(SceneStore)
    store.scenes = {}
    annotations = []
    n_scenes = max(1, min(batch_size, 4))
    for s in range(n_scenes):
        sid = f"scene{s:04d}_00"
        arrays = make_scene(rng, num_objects=num_objects, dc=dc)
        store.scenes[sid] = Scene(
            mesh_vertices=arrays["aligned_vert"],
            instance_labels=arrays["ins_label"],
            semantic_labels=arrays["sem_label"],
            instance_bboxes=arrays["aligned_bbox"],
            relations={ax: arrays[ax] for ax in ("x", "y", "z")},
        )
        annotations += make_annotations(rng, sid, arrays["aligned_bbox"], dc=dc)

    vocab = Vocabulary.build(annotations, max_len=max_des)
    if vocab_size is not None:
        # pad the vocabulary to the requested size (embedding table shape)
        i = len(vocab.word2idx)
        while i < vocab_size:
            w = f"pad_word_{i}"
            vocab.word2idx[w] = i
            vocab.idx2word[str(i)] = w
            i += 1
    ds = ScanReferDataset(annotations, store, vocab, dc, data_cfg, split="train")
    items = [
        ds.__getitem__(i % len(ds), rng=np.random.RandomState(seed + i))
        for i in range(batch_size)
    ]
    return stack_batch(items), vocab, ds


def write_synthetic_dataset(
    root: str, num_scenes: int = 4, seed: int = 0, anns_per_object: int = 2,
    **scene_kwargs
) -> Tuple[List[dict], List[str]]:
    """Writes scenes under <root>/scannet/scannet_data and a ScanRefer-style
    annotation json under <root>/ScanRefer_filtered_all.json. Returns
    (annotations, scene_ids)."""
    rng = np.random.RandomState(seed)
    scene_dir = os.path.join(root, "scannet", "scannet_data")
    os.makedirs(scene_dir, exist_ok=True)
    dc = ScannetDatasetConfig()
    all_anns: List[dict] = []
    scene_ids = []
    for s in range(num_scenes):
        sid = f"scene{s:04d}_00"
        scene_ids.append(sid)
        arrays = make_scene(rng, dc=dc, **scene_kwargs)
        for name, arr in arrays.items():
            np.save(os.path.join(scene_dir, f"{sid}_{name}.npy"), arr)
        all_anns += make_annotations(rng, sid, arrays["aligned_bbox"],
                                     anns_per_object=anns_per_object, dc=dc)
    with open(os.path.join(root, "ScanRefer_filtered_all.json"), "w") as f:
        json.dump(all_anns, f)
    return all_anns, scene_ids
