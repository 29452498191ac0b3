#!/usr/bin/env python
"""Spatial-relation label generation CLI — name-for-name with the
reference's ``data/scannet/generate_spatiality_label.py`` (argparse
surface :198-216): writes ``<scene>_{x,y,z}.npy`` relation matrices from
each scene's ``<scene>_aligned_bbox.npy`` for every scene in the chosen
dataset/split (z: the 0.3·h overlap rule; x/y: the 0.3/0.7 span with the
0.1·ε guard — spacap3d_tpu/data/spatiality.py, bit-parity-tested).

Note: ``scripts/batch_load_scannet_data.py`` already writes these in its
export pass; this standalone CLI exists for the reference's two-step
flow and for regeneration. The ``--visualize``/``--savefig`` heatmap
mode is shared with scripts/visualize_spatiality.py.
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--dataset", type=str, default="scanrefer",
                   choices=["scanrefer", "nr3d"])
    p.add_argument("--split", type=str, default="train")
    p.add_argument("--data_root", type=str,
                   default=os.environ.get("SPACAP_DATA_ROOT", "data"),
                   help="root holding ScanRefer_filtered_<split>.json / "
                        "nr3d_<split>.json and scannet/scannet_data")
    p.add_argument("--scannet_data", type=str, default="",
                   help="override the npy dir (default "
                        "<data_root>/scannet/scannet_data)")
    p.add_argument("--verbose", action="store_true")
    # visualization mode (reference :77-100)
    p.add_argument("--visualize", action="store_true")
    p.add_argument("--scene_id", type=str, default="scene0011_00")
    p.add_argument("--axis", type=str, default="x", choices=["x", "y", "z"])
    p.add_argument("--savefig", action="store_true")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    scannet_data = args.scannet_data or os.path.join(
        args.data_root, "scannet", "scannet_data")

    if args.visualize or args.savefig:
        import importlib.util

        spec = importlib.util.spec_from_file_location(
            "visualize_spatiality",
            os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "visualize_spatiality.py"))
        viz = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(viz)
        viz_main = viz.main

        viz_argv = ["--scannet_data", scannet_data,
                    "--scene_id", args.scene_id, "--axis", args.axis]
        if args.visualize:
            viz_argv.append("--visualize")
        if args.savefig:
            viz_argv.append("--savefig")
        if args.verbose:
            viz_argv.append("--verbose")
        return viz_main(viz_argv)

    import numpy as np

    from spacap3d_tpu.data.spatiality import generate_relation_labels

    ann_file = (f"ScanRefer_filtered_{args.split}.json"
                if args.dataset == "scanrefer" else f"nr3d_{args.split}.json")
    with open(os.path.join(args.data_root, ann_file)) as f:
        anns = json.load(f)
    scene_ids = sorted({a["scene_id"] for a in anns})
    n_ok, n_skip = 0, 0
    for sid in scene_ids:
        bbox_path = os.path.join(scannet_data, f"{sid}_aligned_bbox.npy")
        if not os.path.exists(bbox_path):
            n_skip += 1
            if args.verbose:
                print(f"skip {sid}: no {bbox_path}")
            continue
        bboxes = np.load(bbox_path)
        if not len(bboxes):
            n_skip += 1
            continue
        for ax, mat in generate_relation_labels(bboxes).items():
            np.save(os.path.join(scannet_data, f"{sid}_{ax}.npy"), mat)
        n_ok += 1
        if args.verbose:
            print(f"labeled {sid} ({len(bboxes)} objects)")
    print(f"spatiality labels: {n_ok} scenes written, {n_skip} skipped "
          f"-> {scannet_data}")


if __name__ == "__main__":
    main()
