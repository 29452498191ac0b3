"""Async checkpointing.

Replaces the reference's torch.save payloads (lib/solver.py:216-225,
:556-580: model_last.pth each epoch + model.pth on new best) with an
async writer: the pytree is snapshotted to host numpy synchronously
(cheap) and serialized to disk on a background thread so the train loop
never blocks on IO — the preemption-safety upgrade SURVEY.md §5 calls
for. Files are written atomically (tmp + rename).
"""
from __future__ import annotations

import os
import pickle
import threading
from typing import Any, Dict, Optional

import jax
import numpy as np


def _to_numpy(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


class AsyncCheckpointer:
    def __init__(self):
        self._thread: Optional[threading.Thread] = None
        self._error: Optional[BaseException] = None

    def wait(self):
        if self._thread is not None:
            self._thread.join()
            self._thread = None
        if self._error is not None:
            err, self._error = self._error, None
            raise err

    def save(self, path: str, payload: Dict[str, Any]):
        """payload: json/pickle-able dict; jax arrays are snapshotted now."""
        self.wait()
        snapshot = _to_numpy(payload)

        def write():
            try:
                tmp = path + ".tmp"
                os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
                with open(tmp, "wb") as f:
                    pickle.dump(snapshot, f, protocol=4)
                os.replace(tmp, path)
            except BaseException as e:  # surfaced on next wait()
                self._error = e

        self._thread = threading.Thread(target=write, daemon=True)
        self._thread.start()


def load_checkpoint(path: str) -> Dict[str, Any]:
    with open(path, "rb") as f:
        return pickle.load(f)


def save_checkpoint_sync(path: str, payload: Dict[str, Any]):
    cp = AsyncCheckpointer()
    cp.save(path, payload)
    cp.wait()
