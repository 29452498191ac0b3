#!/usr/bin/env python
"""Scene data-integrity visual check: exported npy bundle -> .obj/.ply.

Equivalent of reference data/scannet/visualize.py (README.md:97-101):
dumps the exported scene points (colored), the GT boxes as cylinder-edge
meshes, and optionally per-instance colored points.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--scene_dir", required=True)
    p.add_argument("--scene_id", required=True)
    p.add_argument("--out_dir", required=True)
    p.add_argument("--color_by_instance", action="store_true")
    args = p.parse_args()

    import numpy as np

    from spacap3d_tpu.utils.visualize import COLORS, write_bbox, write_obj, write_ply

    base = os.path.join(args.scene_dir, args.scene_id)
    verts = np.load(base + "_aligned_vert.npy")
    xyz = verts[:, :3]
    rgb = verts[:, 3:6].astype(np.uint8) if verts.shape[1] >= 6 else None
    if args.color_by_instance:
        ins = np.load(base + "_ins_label.npy")
        rgb = COLORS[ins.astype(int) % len(COLORS)]
    os.makedirs(args.out_dir, exist_ok=True)
    write_obj(xyz, os.path.join(args.out_dir, f"{args.scene_id}.obj"), rgb)
    write_ply(xyz, os.path.join(args.out_dir, f"{args.scene_id}.ply"), rgb)

    boxes = np.load(base + "_aligned_bbox.npy")
    from spacap3d_tpu.data.dataset import corners_from_center_size
    for i, row in enumerate(boxes):
        corners = corners_from_center_size(row[0:3], row[3:6])
        col = COLORS[int(row[6]) % len(COLORS)]
        write_bbox(corners, os.path.join(
            args.out_dir, f"{args.scene_id}_gtbox_{i}.ply"),
            color=tuple(int(x) for x in col))
    print(f"wrote {args.out_dir}/{args.scene_id}.obj + {len(boxes)} gt boxes")


if __name__ == "__main__":
    main()
