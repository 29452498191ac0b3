#!/usr/bin/env python
"""Generate nr3d_organized.json.

Equivalent of reference scripts/organize_referit3d.py: reshape the Nr3D
annotations into {scene_id: {object_id: {ann_id: entry}}}. Reads the
nr3d_{train,val}.json split files when present (produced by
split_referit3d.py, which also writes the organized file directly),
otherwise parses the raw csv.
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--csv", type=str, default="data/nr3d.csv")
    p.add_argument("--data_root", type=str, default="data")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    from spacap3d_tpu.data.organize import organize, split_referit3d

    anns = []
    for split in ("train", "val"):
        path = os.path.join(args.data_root, f"nr3d_{split}.json")
        if os.path.exists(path):
            anns += json.load(open(path))
    out = os.path.join(args.data_root, "nr3d_organized.json")
    if anns:
        with open(out, "w") as f:
            json.dump(organize(anns), f, indent=4)
    else:
        split_referit3d(args.csv, args.data_root)  # writes organized too
    print("Saving", out)


if __name__ == "__main__":
    main()
