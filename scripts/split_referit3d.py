#!/usr/bin/env python
"""Split the ReferIt3D/Nr3D csv into nr3d_train.json / nr3d_val.json.

Equivalent of reference scripts/split_referit3d.py: the csv rows are
converted to the ScanRefer annotation schema and split by the ScanNet
train/val scene lists (also writes nr3d_organized.json — the reference
produces it with the separate organize_referit3d.py step).
"""
import argparse
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
    from spacap3d_tpu.data.organize import split_referit3d

    train, val = split_referit3d(args.csv, args.data_root)
    print(f"nr3d_train.json: {len(train)}  nr3d_val.json: {len(val)}")


if __name__ == "__main__":
    main()
