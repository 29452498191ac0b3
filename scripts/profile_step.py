"""Capture a device profile of the train or eval step and print a
per-HLO-op-family time breakdown.

The reference had no profiling tooling beyond wall-clock logs; this is
the TPU-native equivalent of its iter-time telemetry at op granularity:

    python scripts/profile_step.py --mode train          # flagship shapes
    python scripts/profile_step.py --mode eval --smoke   # tiny, CPU-ok

Captures a jax.profiler trace (n steps), decodes the xplane protobuf with
``protoc --decode_raw`` (no tensorboard/tensorflow version coupling), and
aggregates XLA-op durations by op family. Async ops (DMA copies/slices)
report in-flight duration, not occupancy — they overlap compute, so the
table's total can exceed the step wall time; compare *families* across
changes rather than reading rows as additive.
"""
from __future__ import annotations

import argparse
import glob
import os
import re
import subprocess
import sys
import tempfile
from collections import defaultdict

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def capture(mode: str, outdir: str, smoke: bool, n_steps: int = 5) -> str:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from spacap3d_tpu.config import ModelConfig, TrainConfig
    from spacap3d_tpu.data.scannet_config import ScannetDatasetConfig
    from spacap3d_tpu.data.synthetic import synthetic_batch
    from spacap3d_tpu.models import init_spacap

    if smoke:
        cfg = ModelConfig(
            num_points=1024, num_proposals=16, num_layers=2, num_heads=4,
            d_model=32, d_ff=64, max_des_len=7, vocab_size=64,
            sa_npoints=(128, 64, 32, 16), sa_nsamples=(16, 8, 8, 4),
            sa_widths=((16, 16, 32), (32, 32, 64), (32, 32, 64), (32, 32, 64)),
            fp_width=64, seed_feature_dim=64, proposal_feature_dim=32,
        )
    else:
        cfg = ModelConfig(num_points=40000, vocab_size=4528)
    dc = ScannetDatasetConfig()
    params, state = init_spacap(jax.random.PRNGKey(0), cfg, dc.mean_size_arr)
    batch, _, _ = synthetic_batch(cfg, batch_size=8, vocab_size=cfg.vocab_size)
    batch = {k: jnp.asarray(v) for k, v in batch.items()}

    if mode == "train":
        from spacap3d_tpu.train.step import (
            init_train_state, make_optimizer, make_train_step,
        )

        tc = TrainConfig(batch_size=8, use_relation=True)
        tx = make_optimizer(params, tc, steps_per_epoch=4584)
        ts = init_train_state(params, state, tx)
        step = make_train_step(cfg, tc, tx)
        rngs = [jax.random.fold_in(jax.random.PRNGKey(7), i)
                for i in range(n_steps + 1)]
        _, m = step(ts, batch, rngs[-1], 0.1)
        _ = float(m["loss"])  # warm/compile

        def run():
            outs = [step(ts, batch, r, 0.1) for r in rngs[:n_steps]]
            _ = float(outs[-1][1]["loss"])
    else:
        from spacap3d_tpu.train.step import eval_input_batch, make_eval_step

        step = make_eval_step(cfg)
        dev_batch = eval_input_batch(batch)
        out = step(params, state, dev_batch)
        _ = np.asarray(out["lang_cap"][0, 0])

        def run():
            outs = [step(params, state, dev_batch) for _ in range(n_steps)]
            _ = np.asarray(outs[-1]["lang_cap"][0, 0])

    with jax.profiler.trace(outdir):
        run()
    files = glob.glob(outdir + "/**/*.xplane.pb", recursive=True)
    if not files:
        raise SystemExit("no xplane.pb captured")
    return max(files, key=os.path.getmtime)


def summarize(xplane_path: str, n_steps: int, top: int = 25):
    """Decode with protoc and aggregate device-plane op durations."""
    with tempfile.NamedTemporaryFile("w+", suffix=".txt", delete=False) as tf:
        txt_path = tf.name
    with open(xplane_path, "rb") as fin, open(txt_path, "w") as fout:
        subprocess.run(["protoc", "--decode_raw"], stdin=fin, stdout=fout,
                       check=True)

    in_dev = False
    md_short, md_long = {}, {}
    agg = defaultdict(float)
    line_name = None
    ev_md = ev_dur = None
    cur_md_id = None
    stack: list = []
    for raw in open(txt_path):
        s = raw.strip()
        if s.endswith("{"):
            stack.append(s.split()[0].rstrip(":"))
            if len(stack) == 1 and stack[0] == "1":
                in_dev = False
            continue
        if s == "}":
            if in_dev and stack == ["1", "3", "4"]:
                if (ev_md is not None and ev_dur is not None
                        and line_name == "XLA Ops"):
                    agg[ev_md] += ev_dur
                ev_md = ev_dur = None
            stack.pop()
            continue
        m = re.match(r"(\d+): (.*)", s)
        if not m:
            continue
        field, val = m.group(1), m.group(2)
        if (len(stack) == 1 and stack[0] == "1" and field == "2"
                and re.match(r'"/device:(TPU|CPU|GPU)', val)):
            in_dev = True
        if not in_dev:
            continue
        if stack == ["1", "3"] and field == "2" and val.startswith('"'):
            line_name = val.strip('"')
        elif stack == ["1", "4", "2"]:
            if field == "1":
                cur_md_id = int(val)
            elif field == "4" and val.startswith('"'):
                md_short[cur_md_id] = val.strip('"')
            elif field == "2" and val.startswith('"'):
                md_long[cur_md_id] = val.strip('"')
        elif stack == ["1", "3", "4"]:
            if field == "1":
                ev_md = int(val)
            elif field == "3":
                ev_dur = float(val)
    os.unlink(txt_path)

    if not agg:
        print("no device op events found (XLA-CPU emits no per-op device "
              "plane — run against a TPU for the op breakdown)")
        return

    # Async DMA ops (copy-start / slice-start / async-copy) report their
    # in-flight WINDOW, not resource occupancy — they overlap the compute
    # stream, so summing them wildly overstates. Split them out: the sync
    # bucket is the serialized device stream whose sum approximates the
    # step's device wall time (the roofline denominator).
    def is_async(i):
        long = md_long.get(i, "")
        short = md_short.get(i, "")
        return (long.startswith("%copy-start") or long.startswith("%slice-start")
                or short.startswith("async-copy"))

    sync_agg = {i: v for i, v in agg.items() if not is_async(i)}
    async_total = sum(v for i, v in agg.items() if is_async(i)) / 1e6 / n_steps
    sync_total = sum(sync_agg.values()) / 1e6 / n_steps
    fam = defaultdict(float)
    for i, v in sync_agg.items():
        name = md_short.get(i, md_long.get(i, str(i)))
        fam[re.sub(r"[.\d]+$", "", name)] += v
    print(f"sync XLA-op time (serialized stream ~= device step wall): "
          f"{sync_total:.0f} us/step")
    print(f"async DMA windows (overlapped; NOT additive): "
          f"{async_total:.0f} us/step")
    print(f"{'sync op family':58s} {'us/step':>9s}")
    for k, v in sorted(fam.items(), key=lambda kv: -kv[1])[:top]:
        print(f"{k[:58]:58s} {v / 1e6 / n_steps:9.0f}")
    print(f"\n{'top individual sync ops':100s} {'us/step':>9s}")
    for i, v in sorted(sync_agg.items(), key=lambda kv: -kv[1])[:top]:
        name = md_long.get(i, md_short.get(i, str(i)))
        print(f"{name[:100]:100s} {v / 1e6 / n_steps:9.0f}")


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--mode", choices=["train", "eval"], default="train")
    p.add_argument("--out", default=None, help="trace dir (default: temp)")
    p.add_argument("--smoke", action="store_true", help="tiny arch (CPU-ok)")
    p.add_argument("--steps", type=int, default=5)
    p.add_argument("--top", type=int, default=25)
    args = p.parse_args(argv)
    outdir = args.out or tempfile.mkdtemp(prefix="spacap_xprof_")
    path = capture(args.mode, outdir, args.smoke, args.steps)
    print(f"trace: {path}")
    summarize(path, args.steps, args.top)


if __name__ == "__main__":
    main()
