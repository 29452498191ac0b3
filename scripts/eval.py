#!/usr/bin/env python
"""Evaluation CLI.

Mirrors the reference scripts/eval.py:380-483 surface: single-seed
caption + detection evaluation of a trained checkpoint, and the
``--mul_eval`` 100-seed benchmark protocol (re-seeded point sampling per
seed; per-seed CIDEr/BLEU-4/METEOR/ROUGE + mAP written to
``{eval_tag}_results.csv``; best-CIDEr seed reported — reference
:446-478).

TPU redesign: caption and detection evaluation share ONE forward pass per
scene (the reference runs the detector twice per seed, :462-463), the
decode is KV-cached, and scenes are sharded over the device mesh.
"""
import argparse
import csv
import dataclasses
import json
import os
import sys
from copy import deepcopy

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--folder", type=str, required=True,
                   help="run folder under --output_dir containing model.ckpt")
    p.add_argument("--dataset", type=str, default="ScanRefer")
    p.add_argument("--data_root", type=str,
                   default=os.environ.get("SPACAP_DATA_ROOT", "data"))
    p.add_argument("--output_dir", type=str, default="outputs")
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--mul_eval", action="store_true")
    p.add_argument("--serial_mul_eval", action="store_true",
                   help="run mul_eval seeds serially (the reference protocol "
                        "loop) instead of the sharded seed-x-scene grid")
    p.add_argument("--num_seeds", type=int, default=100)
    p.add_argument("--eval_tag", type=str, default="eval")
    p.add_argument("--min_iou", type=float, default=0.5)
    p.add_argument("--no_detection_eval", action="store_true")
    p.add_argument("--detection_only", action="store_true",
                   help="detection AP only (works for --no_caption ckpts)")
    p.add_argument("--save_encoder_attn", action="store_true")
    p.add_argument("--save_decoder_attn", action="store_true")
    p.add_argument("--save_proposal", action="store_true")
    p.add_argument("--num_workers", type=int, default=4)
    p.add_argument("--checkpoint", type=str, default="model.ckpt")
    p.add_argument("--use_train", action="store_true",
                   help="evaluate on the train split (reference eval.py:405)")
    p.add_argument("--eval_visualize", action="store_true",
                   help="dump vis/{scene}/ scene ply + predicted bbox "
                        "meshes + predictions.json (reference eval.py:247)")
    p.add_argument("--verbose", action="store_true",
                   help="eval_visualize: print path info")
    p.add_argument("--nodryrun", action="store_true",
                   help="eval_visualize: actually write files")
    p.add_argument("--fast_decode", action="store_true",
                   help="stage-granular early exit for the greedy decode "
                        "(eval_decode_early_exit): skip remaining KV-cache "
                        "scan stages once every row has emitted EOS — "
                        "caption-level outputs identical, ~25%% faster eval "
                        "forward on trained models")
    p.add_argument("--multihost", action="store_true",
                   help="run --mul_eval across a multi-process JAX "
                        "runtime (jax.distributed): seeds shard across "
                        "processes, each process streams its own grid on "
                        "its local devices, per-seed rows merge by "
                        "all-gather. See docs/SCALING.md.")
    p.add_argument("--tp", type=int, default=1,
                   help="tensor-parallel degree (parallel/tp.py): shard the "
                        "CAPTIONER's transformer weights over a 'model' mesh "
                        "axis — capacity feature for scaled-up d_model/d_ff/"
                        "N/h only; the detector trunk stays replicated by "
                        "design")
    # 1:1 reference flag aliases (reference eval.py:386-387,406) so a
    # reference command line pasted verbatim parses and does the same thing
    p.add_argument("--eval_caption", action="store_true",
                   help="reference alias (eval.py:386): caption metrics; "
                        "alone (without --eval_detection) it implies "
                        "--no_detection_eval")
    p.add_argument("--eval_detection", action="store_true",
                   help="reference alias (eval.py:387): detection AP; "
                        "alone (without --eval_caption) it implies "
                        "--detection_only")
    p.add_argument("--use_last", action="store_true",
                   help="reference alias (eval.py:406): evaluate "
                        "model_last.ckpt instead of --checkpoint")
    args = p.parse_args(argv)
    # resolve aliases onto the native flags; under --mul_eval the reference
    # loop always runs both caption and detection (eval.py:446-478), so the
    # single-eval aliases don't restrict it there either
    if args.use_last:
        args.checkpoint = "model_last.ckpt"
    if not args.mul_eval:
        if args.eval_caption and not args.eval_detection:
            args.no_detection_eval = True
        elif args.eval_detection and not args.eval_caption:
            args.detection_only = True
    return args


def main(argv=None):
    args = parse_args(argv)

    process_index, process_count = 0, 1
    if args.multihost:
        # must run before any other device use so the runtime is global
        from spacap3d_tpu.parallel.multihost import initialize_from_env

        process_index, process_count = initialize_from_env()
        if process_count > 1:
            # form the cross-process communicator NOW (seconds after
            # initialize, when every process is still in lockstep): the
            # first real collective is the end-of-grid row merge, which
            # processes can reach minutes apart — past the ~30 s
            # collective-rendezvous deadline (parallel/multihost.py)
            from spacap3d_tpu.parallel.multihost import allgather_pyobj

            allgather_pyobj(process_index)
    import jax

    from spacap3d_tpu.utils.logging import enable_compilation_cache
    enable_compilation_cache()
    import numpy as np

    from spacap3d_tpu.config import RunConfig
    from spacap3d_tpu.data.dataset import ScanReferDataset, SceneStore
    from spacap3d_tpu.data.loader import DataLoader
    from spacap3d_tpu.data.scannet_config import ScannetDatasetConfig
    from spacap3d_tpu.data.vocabulary import Vocabulary
    from spacap3d_tpu.eval.eval_helper import eval_cap, eval_detection
    from spacap3d_tpu.parallel.mesh import make_mesh, shard_batch
    from spacap3d_tpu.train.step import make_eval_step
    from spacap3d_tpu.utils.checkpoint import load_checkpoint
    from spacap3d_tpu.utils.convert import np_to_jax

    root = os.path.join(args.output_dir, args.folder)
    run_cfg = RunConfig.load(os.path.join(root, "config.json"))
    model_cfg = run_cfg.model
    if args.fast_decode:
        model_cfg = dataclasses.replace(model_cfg,
                                        eval_decode_early_exit=True)
    dc = ScannetDatasetConfig()

    # --use_train evaluates on the train split (reference eval.py:405)
    phase = "train" if args.use_train else "val"
    if args.dataset == "ScanRefer":
        val_anns = json.load(open(os.path.join(
            args.data_root, f"ScanRefer_filtered_{phase}.json")))
    else:
        val_anns = json.load(open(os.path.join(
            args.data_root, f"nr3d_{phase}.json")))
    val_scenes = sorted({a["scene_id"] for a in val_anns})
    eval_list = []
    for sid in val_scenes:  # one forward per scene (reference eval.py:97-117)
        e = deepcopy(val_anns[0])
        e["scene_id"] = sid
        eval_list.append(e)

    vocab_path = os.path.join(args.data_root, f"{args.dataset}_vocabulary.json")
    if os.path.exists(vocab_path):
        vocab = Vocabulary.load(vocab_path)
    else:
        assert args.detection_only, f"vocabulary not found: {vocab_path}"
        vocab = Vocabulary.build(val_anns)  # tokens only feed the dataset

    data_cfg = dataclasses.replace(run_cfg.data, augment=False,
                                   use_relation=False, data_root=args.data_root)
    mv = os.path.join(args.data_root, "scannet", "scannet_data",
                      "enet_feats_maxpool.hdf5") if data_cfg.use_multiview else None
    store = SceneStore(data_cfg.scannet_data, val_scenes, load_relations=False,
                       multiview_hdf5=mv)
    ds = ScanReferDataset(eval_list, store, vocab, dc, data_cfg, split="val")

    payload = load_checkpoint(os.path.join(root, args.checkpoint))
    params = np_to_jax(payload["params"])
    state = np_to_jax(payload["state"])

    import math
    grid_mode = args.mul_eval and not args.detection_only and not args.serial_mul_eval
    eff_batch = args.batch_size if grid_mode else min(args.batch_size, len(ds))
    if args.tp > 1 and process_count > 1:
        # same boundary the Solver enforces: TP is single-process by
        # design (docs/SCALING.md) — a global TP mesh would fight the
        # per-process seed-sharded grid streams
        raise SystemExit("--tp is single-process; drop --multihost or --tp")
    if args.tp > 1:
        # 2-D (data, model) mesh (parallel/tp.py): TP-shard the captioner
        # for scaled-up configs; the decode's per-block all-reduces ride
        # the fast mesh axis. shard_params below places the loaded params.
        from spacap3d_tpu.parallel.tp import make_tp_mesh, shard_params

        if len(jax.devices()) % args.tp:
            raise SystemExit(
                f"--tp {args.tp} does not divide {len(jax.devices())} devices")
        n_data = math.gcd(len(jax.devices()) // args.tp, eff_batch)
        mesh = make_tp_mesh(jax.devices()[: n_data * args.tp], tp=args.tp)
        params = shard_params(mesh, params)
    else:
        # multi-host grid eval is seed-sharded: each process streams its
        # own grid on its LOCAL devices (mul_eval_grid_multihost), so the
        # mesh here is per-process either way
        local = jax.local_devices() if process_count > 1 else jax.devices()
        n_dev = math.gcd(len(local), eff_batch)
        mesh = make_mesh(local[:n_dev]) if n_dev > 1 else None
    # grid mode never reads corners/centers on the host: the compact step
    # fetches 4x fewer bytes per batch (the d2h pipe bounds e2e mul_eval)
    eval_step = make_eval_step(model_cfg, mesh=mesh, compact=grid_mode)
    to_dev = (lambda b: shard_batch(mesh, b)) if mesh else None

    attn_dump_step = None
    if args.save_encoder_attn or args.save_decoder_attn:
        if args.fast_decode:
            import warnings
            warnings.warn(
                "--fast_decode fills token slots after the all-EOS point "
                "with EOS; the teacher-forced attention dump re-runs over "
                "those tokens, so dumped weights past each caption's EOS "
                "differ from a normal-decode run (captions and metrics do "
                "not).", RuntimeWarning)
        from spacap3d_tpu.train.step import make_attn_dump_step
        attn_dump_step = make_attn_dump_step(model_cfg)

    if args.eval_visualize:
        from spacap3d_tpu.eval.eval_helper import (
            eval_visualize,
            organize_annotations,
        )
        loader = DataLoader(ds, min(args.batch_size, len(ds)), shuffle=False,
                            seed=args.seed, num_workers=args.num_workers)
        scans_dir = os.path.join(args.data_root, "scannet", "scans")
        eval_visualize(
            eval_step, params, state, ds, loader, vocab,
            organize_annotations(val_anns), dc, root,
            scans_dir=scans_dir if os.path.isdir(scans_dir) else None,
            min_iou=args.min_iou, batch_to_device=to_dev,
            verbose=args.verbose, nodryrun=args.nodryrun,
        )
        print(f"visualization dumps under {os.path.join(root, 'vis')}"
              + ("" if args.nodryrun else " (dry run: pass --nodryrun to write)"))
        return

    seeds = range(args.num_seeds) if args.mul_eval else [args.seed]
    rows = []
    if grid_mode:
        # One sharded (seed x scene) stream: every chip busy across the
        # whole grid; caption+detection share one forward per row.
        from spacap3d_tpu.eval.eval_helper import (
            organize_annotations,
            prepare_corpus,
        )
        from spacap3d_tpu.eval.mul_eval import (
            mul_eval_grid,
            mul_eval_grid_multihost,
        )

        corpus_cache = os.path.join(root, f"corpus_{phase}.json")
        if os.path.exists(corpus_cache):
            corpus = json.load(open(corpus_cache))
        else:
            corpus = prepare_corpus(val_anns)
            if process_index == 0:
                # atomic write (tmp + rename): a lagging multihost peer
                # that sees the file exist must never read a partial dump
                tmp = corpus_cache + ".tmp"
                with open(tmp, "w") as f:
                    json.dump(corpus, f, indent=4)
                os.replace(tmp, corpus_cache)
        table_put = None
        if mesh:
            from jax.sharding import NamedSharding, PartitionSpec
            repl = NamedSharding(mesh, PartitionSpec())
            table_put = lambda x: jax.device_put(x, repl)  # noqa: E731
        grid_fn = mul_eval_grid_multihost if process_count > 1 \
            else mul_eval_grid
        rows = grid_fn(
            eval_step, params, state, ds, vocab, dc, corpus,
            organize_annotations(val_anns), list(seeds), eff_batch,
            min_iou=args.min_iou,
            also_detection=not args.no_detection_eval,
            batch_to_device=to_dev, table_to_device=table_put,
            num_workers=args.num_workers,
            progress=(lambda i, n: print(f"\rgrid batch {i}/{n}", end="",
                                         flush=True))
            if process_index == 0 else None,
        )
        if process_index == 0:
            print()
            for row in rows:
                print(json.dumps(row))
        seeds = []
    for seed in seeds:
        loader = DataLoader(ds, min(args.batch_size, len(ds)), shuffle=False,
                            seed=seed, num_workers=args.num_workers)
        if args.detection_only:
            det = eval_detection(eval_step, params, state, loader, dc,
                                 ap_iou=args.min_iou, batch_to_device=to_dev)
            metrics = {"mAP@0.5": det["mAP"], "AR@0.5": det["AR"]}
        else:
            metrics, _ = eval_cap(
                eval_step, params, state, ds, loader, vocab, dc, val_anns,
                min_iou=args.min_iou,
                also_detection=not args.no_detection_eval,
                corpus_cache=os.path.join(root, f"corpus_{phase}.json"),
                pred_path=os.path.join(root, f"pred_{phase}_{args.eval_tag}_{seed}.json"),
                batch_to_device=to_dev,
                attn_dump_step=attn_dump_step,
                save_proposal=args.save_proposal,
                dump_dir=os.path.join(root, f"dumps_{args.eval_tag}")
                if (attn_dump_step or args.save_proposal) else None,
            )
        row = {"seed": seed, **{k: v for k, v in metrics.items()
                                if isinstance(v, (int, float))}}
        rows.append(row)
        print(json.dumps(row))

    if process_index != 0:
        return  # process 0 owns the CSV/summary output

    csv_path = os.path.join(root, f"{args.eval_tag}_results.csv")
    with open(csv_path, "w", newline="") as f:
        writer = csv.DictWriter(f, fieldnames=sorted(rows[0].keys()))
        writer.writeheader()
        writer.writerows(rows)

    if args.mul_eval and not args.detection_only:
        best = max(rows, key=lambda r: r["cider"])
        mean_cider = float(np.mean([r["cider"] for r in rows]))
        print(f"best seed {best['seed']}: CIDEr {best['cider']:.4f} "
              f"(mean over {len(rows)} seeds: {mean_cider:.4f})")
        print(json.dumps({"best": best, "mean_cider": mean_cider}))


if __name__ == "__main__":
    main()
