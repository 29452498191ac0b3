#!/usr/bin/env python
"""Batch 2D frames through the ENet encoder -> per-frame feature npys.

Equivalent of reference scripts/compute_multiview_features.py:29-131:
reads <frames_root>/<scene>/color/<frame>.jpg (or .png), runs the JAX
ENet encoder (on TPU), writes <out_root>/<scene>/<frame>.npy with the
(H/8, W/8, 128) feature map. ENet weights come from a converted
scannetv2_enet checkpoint (see spacap3d_tpu/utils/convert_enet.py).
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--frames_root", required=True)
    p.add_argument("--out_root", required=True)
    p.add_argument("--enet_ckpt", default="",
                   help="torch scannetv2_enet.pth or native pickle")
    p.add_argument("--batch_size", type=int, default=64)
    p.add_argument("--image_h", type=int, default=256)
    p.add_argument("--image_w", type=int, default=328)
    return p.parse_args()


def load_image(path, h, w):
    import numpy as np
    try:
        from PIL import Image
        img = np.asarray(Image.open(path).convert("RGB").resize((w, h)))
    except ImportError:
        import imageio.v2 as imageio  # pragma: no cover
        img = imageio.imread(path)
    return img.astype("float32") / 255.0


def main():
    args = parse_args()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from spacap3d_tpu.models.enet import enet_encoder, init_enet

    params, state = init_enet(jax.random.PRNGKey(0))
    if args.enet_ckpt:
        if args.enet_ckpt.endswith(".pth"):
            from spacap3d_tpu.utils.convert import load_torch_state_dict
            from spacap3d_tpu.utils.convert_enet import convert_enet_state_dict
            sd = load_torch_state_dict(args.enet_ckpt)
            params, state, report = convert_enet_state_dict(sd, params, state)
            print(f"converted {len(report['loaded'])} ENet tensors")
        else:
            import pickle
            with open(args.enet_ckpt, "rb") as f:
                payload = pickle.load(f)
            params, state = payload["params"], payload["state"]

    fwd = jax.jit(lambda p, s, x: enet_encoder(p, s, x, train=False)[0])

    scenes = sorted(os.listdir(args.frames_root))
    for scene in scenes:
        color_dir = os.path.join(args.frames_root, scene, "color")
        if not os.path.isdir(color_dir):
            continue
        out_dir = os.path.join(args.out_root, scene)
        os.makedirs(out_dir, exist_ok=True)
        frames = sorted(os.listdir(color_dir))
        for i in range(0, len(frames), args.batch_size):
            chunk = frames[i:i + args.batch_size]
            imgs = np.stack([
                load_image(os.path.join(color_dir, fr), args.image_h, args.image_w)
                for fr in chunk
            ])
            feats = np.asarray(fwd(params, state, jnp.asarray(imgs)))
            for fr, fm in zip(chunk, feats):
                np.save(os.path.join(out_dir, os.path.splitext(fr)[0] + ".npy"), fm)
        print(f"{scene}: {len(frames)} frames")


if __name__ == "__main__":
    main()
