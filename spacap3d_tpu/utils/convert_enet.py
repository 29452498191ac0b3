"""Torch scannetv2_enet.pth -> JAX ENet params converter (name-based).

The reference builds ENet as one big nn.Sequential of Lambda-style
modules (lib/enet.py:130-715; its decoder half is commented out
upstream, so the active model = encoder + 1x1 classifier). The
checkpoint's keys are Sequential indices; this maps them EXPLICITLY onto
spacap3d_tpu/models/enet.py's named tree:

  top-level:  0.0 initial conv | 2 initial BN | 3 initial PReLU |
              4 s1_down | 5-8 s1_b0..3 | 9 s2_down |
              10-17 stage-2 blocks | 18-25 stage-3 blocks |
              26.0 classifier conv
  per block ("X.0.0.<i>", out-PReLU at "X.2"):
    regular/down: 0 conv1 | 1 bn | 2 prelu | 3 conv2(w+b) | 4 bn |
                  5 prelu | 6 conv3 | 7 bn
    asymmetric:   3 conv2a(1x5, no bias) | 4 conv2b(5x1, w+b) | 5 bn |
                  6 prelu | 7 conv3 | 8 bn

Layout rules: conv (out,in,kh,kw) -> (kh,kw,in,out); PReLU weight ->
alpha; BN weight/bias -> scale/bias (params), running_mean/var ->
mean/var (state); num_batches_tracked dropped.
"""
from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

from spacap3d_tpu.models.enet import STAGE2_3_PLAN

# torch top-level Sequential index -> our block name
_BLOCK_OF_INDEX = {4: "s1_down", 9: "s2_down"}
for _i in range(4):
    _BLOCK_OF_INDEX[5 + _i] = f"s1_b{_i}"
for _i, (_name, _) in enumerate(STAGE2_3_PLAN):
    _BLOCK_OF_INDEX[10 + _i] = f"s2_{_name}"
    _BLOCK_OF_INDEX[18 + _i] = f"s3_{_name}"

_ASYM_BLOCKS = {
    f"{stage}_{name}"
    for stage in ("s2", "s3")
    for name, kw in STAGE2_3_PLAN if kw.get("asymmetric")
}

# per-block ext-branch sub-index ("X.0.0.<i>") -> our leaf group
_SUB_REGULAR = {0: "conv1", 1: "conv1_bn", 2: "prelu1", 3: "conv2",
                4: "conv2_bn", 5: "prelu2", 6: "conv3", 7: "conv3_bn"}
_SUB_ASYM = {0: "conv1", 1: "conv1_bn", 2: "prelu1", 3: "conv2a",
             4: "conv2b", 5: "conv2_bn", 6: "prelu2", 7: "conv3",
             8: "conv3_bn"}


def _conv_kernel(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 1, 0))


def _map_enet_key(key: str):
    """torch key -> ('params'|'state', path tuple, transform|None)."""
    parts = key.split(".")
    leaf = parts[-1]
    if leaf == "num_batches_tracked":
        return None

    def bn_leaf(base):
        if leaf in ("weight", "bias"):
            return ("params", base + ("scale" if leaf == "weight" else "bias",),
                    None)
        if leaf in ("running_mean", "running_var"):
            return ("state",
                    base + ("mean" if leaf == "running_mean" else "var",),
                    None)
        raise KeyError(key)

    top = int(parts[0])
    if top == 0:                                 # initial LambdaMap conv
        assert parts[1] == "0"
        return ("params", ("initial_conv", "kernel" if leaf == "weight" else "bias"),
                _conv_kernel if leaf == "weight" else None)
    if top == 2:
        return bn_leaf(("initial_bn",))
    if top == 3:
        return ("params", ("initial_prelu", "alpha"), None)
    if top == 26:                                # classifier Sequential
        assert parts[1] == "0" and leaf == "weight"
        return ("params", ("classifier", "kernel"), _conv_kernel)

    block = _BLOCK_OF_INDEX[top]
    if parts[1] == "2":                          # out PReLU ("X.2.weight")
        return ("params", (block, "prelu_out", "alpha"), None)
    assert parts[1] == "0" and parts[2] == "0", key
    sub = int(parts[3])
    name = (_SUB_ASYM if block in _ASYM_BLOCKS else _SUB_REGULAR)[sub]
    if name.endswith("_bn"):
        return bn_leaf((block, name))
    if name.startswith("prelu"):
        return ("params", (block, name, "alpha"), None)
    # conv leaf
    if leaf == "weight":
        return ("params", (block, name, "kernel"), _conv_kernel)
    return ("params", (block, name, "bias"), None)


def convert_enet_state_dict(
    sd: Dict[str, np.ndarray], params, state, strict: bool = True
) -> Tuple[Dict, Dict, Dict]:
    """Writes the torch tensors into copies of (params, state) by NAME.
    Returns (params, state, report)."""
    import copy

    import jax

    params = copy.deepcopy(jax.tree_util.tree_map(np.asarray, params))
    state = copy.deepcopy(jax.tree_util.tree_map(np.asarray, state))
    loaded, skipped = [], []
    for key, value in sd.items():
        try:
            mapped = _map_enet_key(key)
        except (KeyError, AssertionError, ValueError) as e:
            if strict:
                raise KeyError(f"unmapped ENet key {key}: {e}") from e
            skipped.append(key)
            continue
        if mapped is None:
            continue
        which, path, transform = mapped
        v = np.asarray(value)
        if transform:
            v = transform(v)
        tree = params if which == "params" else state
        node = tree
        for pth in path[:-1]:
            node = node[pth]
        assert np.shape(node[path[-1]]) == v.shape, (
            f"{key} -> {path}: {np.shape(node[path[-1]])} vs {v.shape}"
        )
        node[path[-1]] = v.astype(np.float32)
        loaded.append(key)
    return params, state, {"loaded": loaded, "skipped": skipped}
