"""CLI smoke tests: scripts/train.py + scripts/eval.py end-to-end on
synthetic data with the tiny arch preset."""
import json
import os
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))


@pytest.fixture(scope="module")
def data_root(tmp_path_factory):
    from spacap3d_tpu.data.synthetic import write_synthetic_dataset

    root = str(tmp_path_factory.mktemp("cli_data"))
    anns, scene_ids = write_synthetic_dataset(root, num_scenes=2, seed=3)
    # ScanRefer-layout annotation files: split by scene
    train = [a for a in anns if a["scene_id"] == scene_ids[0]]
    val = [a for a in anns if a["scene_id"] == scene_ids[1]]
    with open(os.path.join(root, "ScanRefer_filtered_train.json"), "w") as f:
        json.dump(train, f)
    with open(os.path.join(root, "ScanRefer_filtered_val.json"), "w") as f:
        json.dump(val, f)
    return root


def test_train_and_eval_cli(data_root, tmp_path):
    import train as train_cli

    out_dir = str(tmp_path / "outputs")
    train_cli.main([
        "--data_root", data_root, "--output_dir", out_dir,
        "--arch_preset", "tiny", "--num_points", "1024",
        "--num_proposals", "16", "--batch_size", "4", "--epoch", "1",
        "--val_step", "3", "--verbose", "1", "--num_workers", "1",
        "--tag", "smoke",
    ])
    runs = os.listdir(out_dir)
    assert len(runs) == 1
    run_root = os.path.join(out_dir, runs[0])
    for f in ("config.json", "info.json", "log.txt", "model_last.ckpt",
              "best.txt"):
        assert os.path.exists(os.path.join(run_root, f)), f

    import eval as eval_cli

    ckpt = "model.ckpt" if os.path.exists(
        os.path.join(run_root, "model.ckpt")) else "model_last.ckpt"
    eval_cli.main([
        "--folder", runs[0], "--data_root", data_root,
        "--output_dir", out_dir, "--batch_size", "4", "--num_workers", "1",
        "--checkpoint", ckpt, "--eval_tag", "smoke",
    ])
    csv_path = os.path.join(run_root, "smoke_results.csv")
    assert os.path.exists(csv_path)
    header = open(csv_path).readline()
    for col in ("cider", "bleu-4", "rouge", "meteor", "mAP@0.5"):
        assert col in header

    # mul_eval protocol: per-seed rows + best-CIDEr report
    eval_cli.main([
        "--folder", runs[0], "--data_root", data_root,
        "--output_dir", out_dir, "--batch_size", "4", "--num_workers", "1",
        "--checkpoint", ckpt, "--eval_tag", "mul", "--mul_eval",
        "--num_seeds", "2", "--no_detection_eval",
    ])
    rows = open(os.path.join(run_root, "mul_results.csv")).readlines()
    assert len(rows) == 3  # header + 2 seeds

    # 1:1 reference flag aliases (reference eval.py:386-387,406): a
    # reference-syntax command line must parse AND run — caption-only
    # metrics on model_last.ckpt
    eval_cli.main([
        "--folder", runs[0], "--data_root", data_root,
        "--output_dir", out_dir, "--batch_size", "4", "--num_workers", "1",
        "--eval_tag", "alias", "--eval_caption", "--use_last",
    ])
    header = open(os.path.join(run_root, "alias_results.csv")).readline()
    assert "cider" in header and "mAP@0.5" not in header

    # --fast_decode (early-exit decode) must leave every caption-level
    # metric identical — the flag only skips decode work past the point
    # where all rows have emitted EOS
    eval_cli.main([
        "--folder", runs[0], "--data_root", data_root,
        "--output_dir", out_dir, "--batch_size", "4", "--num_workers", "1",
        "--eval_tag", "fast", "--eval_caption", "--use_last",
        "--fast_decode",
    ])
    fast = open(os.path.join(run_root, "fast_results.csv")).read()
    alias = open(os.path.join(run_root, "alias_results.csv")).read()
    assert fast == alias

    # --tp 2 (tensor parallelism, parallel/tp.py): the TP-sharded captioner
    # must reproduce the replicated run's caption metrics (greedy argmax is
    # robust to the split-contraction reassociation at tiny scale; exact
    # token equality is pinned in tests/test_tp.py)
    eval_cli.main([
        "--folder", runs[0], "--data_root", data_root,
        "--output_dir", out_dir, "--batch_size", "4", "--num_workers", "1",
        "--eval_tag", "tp", "--eval_caption", "--use_last", "--tp", "2",
    ])
    assert open(os.path.join(run_root, "tp_results.csv")).read() == alias
    # a tp degree that does not divide the device count exits cleanly
    with pytest.raises(SystemExit, match="does not divide"):
        eval_cli.main([
            "--folder", runs[0], "--data_root", data_root,
            "--output_dir", out_dir, "--batch_size", "4",
            "--num_workers", "1", "--eval_tag", "tpbad", "--eval_caption",
            "--use_last", "--tp", "3",
        ])
    # alias resolution table
    a = eval_cli.parse_args(["--folder", "x", "--eval_detection"])
    assert a.detection_only and a.checkpoint == "model.ckpt"
    a = eval_cli.parse_args(["--folder", "x", "--eval_caption",
                             "--eval_detection"])
    assert not a.detection_only and not a.no_detection_eval
    a = eval_cli.parse_args(["--folder", "x", "--mul_eval", "--eval_caption",
                             "--eval_detection", "--use_last"])
    assert not a.detection_only and not a.no_detection_eval
    assert a.checkpoint == "model_last.ckpt"

    # --use_train evaluates the TRAIN split (reference eval.py:405):
    # corpus/pred artifacts switch to the train phase naming
    eval_cli.main([
        "--folder", runs[0], "--data_root", data_root,
        "--output_dir", out_dir, "--batch_size", "4", "--num_workers", "1",
        "--checkpoint", ckpt, "--eval_tag", "ontrain", "--use_train",
        "--no_detection_eval",
    ])
    assert os.path.exists(os.path.join(run_root, "corpus_train.json"))
    assert os.path.exists(os.path.join(run_root, "ontrain_results.csv"))
    # train corpus covers the train scene's objects, not the val scene's
    corpus = json.load(open(os.path.join(run_root, "corpus_train.json")))
    train_anns = json.load(
        open(os.path.join(data_root, "ScanRefer_filtered_train.json")))
    assert {k.split("|")[0] for k in corpus} == \
        {a["scene_id"] for a in train_anns}

    # --eval_visualize dumps vis/{scene}/ scene ply + predictions.json
    # (+ pred-*.ply per surviving proposal; an undertrained model may
    # legitimately have none at IoU 0.5, so drop the bar to 0.0 to make
    # box dumps near-certain)
    eval_cli.main([
        "--folder", runs[0], "--data_root", data_root,
        "--output_dir", out_dir, "--batch_size", "4", "--num_workers", "1",
        "--checkpoint", ckpt, "--eval_visualize", "--nodryrun",
        "--min_iou", "0.0",
    ])
    val_anns = json.load(
        open(os.path.join(data_root, "ScanRefer_filtered_val.json")))
    val_scene = val_anns[0]["scene_id"]
    vis_dir = os.path.join(run_root, "vis", val_scene)
    assert os.path.exists(os.path.join(vis_dir, f"{val_scene}.ply"))
    preds = json.load(open(os.path.join(vis_dir, "predictions.json")))
    box_plys = [f for f in os.listdir(vis_dir) if f.startswith("pred-")]
    assert len(box_plys) == len(preds)
    for oid, entry in preds.items():
        assert os.path.exists(os.path.join(
            vis_dir, f"pred-{oid}-{entry['object_name']}.ply"))


def test_detection_pretrain_cli(data_root, tmp_path):
    """--no_caption detection pretraining must run without --no_relation:
    the relation head lives in the captioner, so the CLI disables the
    relation loss itself (the reference KeyErrors on 'relation_pred' in
    this flag combination — its pretrain runs pass --no_relation)."""
    import train as train_cli

    out_dir = str(tmp_path / "outputs")
    train_cli.main([
        "--data_root", data_root, "--output_dir", out_dir,
        "--arch_preset", "tiny", "--num_points", "1024",
        "--num_proposals", "16", "--batch_size", "4", "--epoch", "1",
        "--val_step", "1000000", "--verbose", "1", "--num_workers", "1",
        "--no_caption", "--no_augment", "--tag", "det",
    ])
    runs = os.listdir(out_dir)
    assert len(runs) == 1
    run_root = os.path.join(out_dir, runs[0])
    assert os.path.exists(os.path.join(run_root, "model_last.ckpt"))
    cfg = json.load(open(os.path.join(run_root, "config.json")))
    assert cfg["train"]["no_caption"] is True
    assert cfg["train"]["use_relation"] is False
    assert cfg["data"]["augment"] is False

    # detection-only eval consumes the pretrain checkpoint
    import eval as eval_cli
    eval_cli.main([
        "--folder", runs[0], "--data_root", data_root,
        "--output_dir", out_dir, "--batch_size", "4", "--num_workers", "1",
        "--checkpoint", "model_last.ckpt", "--eval_tag", "det",
        "--detection_only", "--min_iou", "0.05",
    ])
    assert os.path.exists(os.path.join(run_root, "det_results.csv"))


def test_referit3d_dataset_cli(data_root, tmp_path):
    """--dataset ReferIt3D (reference train.py:33) trains and evaluates
    from the nr3d_{train,val}.json layout — same annotation schema as
    ScanRefer, different file names and vocabulary cache name."""
    import eval as eval_cli
    import train as train_cli

    # reuse the synthetic ScanRefer annotations under the Nr3D file names
    for split in ("train", "val"):
        anns = json.load(open(os.path.join(
            data_root, f"ScanRefer_filtered_{split}.json")))
        with open(os.path.join(data_root, f"nr3d_{split}.json"), "w") as f:
            json.dump(anns, f)

    out_dir = str(tmp_path / "outputs")
    train_cli.main([
        "--data_root", data_root, "--output_dir", out_dir,
        "--dataset", "ReferIt3D",
        "--arch_preset", "tiny", "--num_points", "1024",
        "--num_proposals", "16", "--batch_size", "4", "--epoch", "1",
        "--val_step", "1000000", "--verbose", "1", "--num_workers", "1",
        "--no_augment", "--tag", "nr3d",
    ])
    runs = os.listdir(out_dir)
    run_root = os.path.join(out_dir, runs[0])
    assert os.path.exists(os.path.join(
        data_root, "ReferIt3D_vocabulary.json"))
    cfg = json.load(open(os.path.join(run_root, "config.json")))
    assert cfg["data"]["dataset"] == "ReferIt3D"

    eval_cli.main([
        "--folder", runs[0], "--data_root", data_root,
        "--output_dir", out_dir, "--dataset", "ReferIt3D",
        "--batch_size", "4", "--num_workers", "1",
        "--checkpoint", "model_last.ckpt", "--eval_tag", "nr3d",
    ])
    row = open(os.path.join(run_root, "nr3d_results.csv")).readlines()
    assert len(row) == 2 and "cider" in row[0]
