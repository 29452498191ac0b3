"""Run logging: log.txt mirror, scalar history -> all_scalars.json,
optional TensorBoard, ETA formatting.

Parity with the reference's observability surface (SURVEY.md §5):
tensorboard scalars per iter/eval (lib/solver.py:309-333), plain-text
log.txt (:155-156), all_scalars.json at finish (:596-602), info.json run
manifest (scripts/train.py:291-305), best.txt (:696-697).
"""
from __future__ import annotations

import json
import os
import time
from collections import defaultdict
from typing import Dict, Optional


def decode_eta(seconds: float) -> Dict[str, int]:
    seconds = int(max(0, seconds))
    return {
        "h": seconds // 3600,
        "m": (seconds % 3600) // 60,
        "s": seconds % 60,
    }


class RunLogger:
    def __init__(self, root: str, use_tensorboard: Optional[bool] = None):
        self.root = root
        os.makedirs(root, exist_ok=True)
        self._fout = open(os.path.join(root, "log.txt"), "a")
        self._scalars = defaultdict(list)  # tag -> [(wall, step, value)]
        self._tb = {}
        if use_tensorboard is None:
            # Opt-in via SPACAP_TENSORBOARD=1: tensorboard's record writer
            # blocks the training thread once its 20-event queue fills,
            # and on slow/network filesystems each event write can cost
            # >1 s — measured 1.4 s/event (~3 s/epoch) on the bench host.
            # The full scalar history always lands in all_scalars.json.
            use_tensorboard = os.environ.get("SPACAP_TENSORBOARD") == "1"
        if use_tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter

                for phase in ("train", "val"):
                    d = os.path.join(root, "tensorboard", phase)
                    os.makedirs(d, exist_ok=True)
                    self._tb[phase] = SummaryWriter(d)
            except Exception:
                self._tb = {}

    def log(self, msg: str):
        self._fout.write(msg + "\n")
        self._fout.flush()
        print(msg, flush=True)

    def scalar(self, phase: str, tag: str, value: float, step: int):
        full = f"{phase}/{tag}"
        self._scalars[full].append((time.time(), step, float(value)))
        if phase in self._tb:
            self._tb[phase].add_scalar(tag, float(value), step)

    def dump_scalars(self):
        path = os.path.join(self.root, "all_scalars.json")
        with open(path, "w") as f:
            json.dump(self._scalars, f)

    def write_json(self, name: str, payload):
        with open(os.path.join(self.root, name), "w") as f:
            json.dump(payload, f, indent=4, default=str)

    def close(self):
        self.dump_scalars()
        for w in self._tb.values():
            w.close()
        self._fout.close()


def enable_compilation_cache(path: str = None):
    """Persistent XLA compilation cache across processes.

    A fresh jit of the flagship eval/train program costs ~45 s to minutes
    on a remote-attached TPU; caching compiled executables on disk makes
    every CLI invocation after the first start instantly. Set
    ``SPACAP_COMPILATION_CACHE`` to override the location, or to the
    empty string to disable. Safe to call multiple times."""
    import os

    import jax

    env = os.environ.get("SPACAP_COMPILATION_CACHE")
    if env == "":
        return
    path = env or path or os.path.join(
        os.path.expanduser("~"), ".cache", "spacap3d_tpu", "jax"
    )
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # older jax or read-only fs: compilation just stays in-memory
