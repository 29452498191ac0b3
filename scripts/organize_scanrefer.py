#!/usr/bin/env python
"""Generate ScanRefer_filtered_organized.json.

Equivalent of reference scripts/organize_scanrefer.py: reshape the flat
annotation list into {scene_id: {object_id: {ann_id: entry}}}. Reads
ScanRefer_filtered.json when present (the reference's input), otherwise
the train+val split files.
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--data_root", type=str, default="data")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    from spacap3d_tpu.data.organize import organize

    combined = os.path.join(args.data_root, "ScanRefer_filtered.json")
    if os.path.exists(combined):
        anns = json.load(open(combined))
    else:
        anns = []
        for split in ("train", "val"):
            path = os.path.join(args.data_root,
                                f"ScanRefer_filtered_{split}.json")
            if os.path.exists(path):
                anns += json.load(open(path))
    if not anns:
        sys.exit(f"no ScanRefer annotation files under {args.data_root} "
                 "(expected ScanRefer_filtered.json or the "
                 "_train/_val split files)")
    out = os.path.join(args.data_root, "ScanRefer_filtered_organized.json")
    with open(out, "w") as f:
        json.dump(organize(anns), f, indent=4)
    print("Saving", out)


if __name__ == "__main__":
    main()
