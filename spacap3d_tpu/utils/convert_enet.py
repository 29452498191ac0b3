"""Torch scannetv2_enet.pth -> JAX ENet encoder params converter.

The reference builds ENet in torch Sequential/Lambda style (lib/enet.py)
and loads ``scannetv2_enet.pth``; this maps those tensors onto
spacap3d_tpu/models/enet.py's functional tree. Conv kernels transpose
(out, in, kh, kw) -> (kh, kw, in, out); BN weight/bias/running stats map
to scale/bias + state mean/var; PReLU slopes map to alpha.

The torch checkpoint's exact key layout depends on the reference's
Sequential numbering; ``convert_enet_state_dict`` therefore works
positionally: it walks both models' conv/bn/prelu tensors in definition
order and pairs them by shape, which is robust to naming differences.
"""
from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np


def _flatten_ordered(tree, prefix=()):
    """Yields (path, leaf) in insertion order (dicts preserve order)."""
    out = []
    if isinstance(tree, dict):
        for k, v in tree.items():
            out += _flatten_ordered(v, prefix + (k,))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            out += _flatten_ordered(v, prefix + (i,))
    else:
        out.append((prefix, tree))
    return out


def torch_tensors_in_order(sd: Dict[str, "np.ndarray"]) -> List[Tuple[str, np.ndarray]]:
    """Returns (key, tensor) excluding num_batches_tracked, preserving the
    state-dict order (torch preserves registration order)."""
    return [(k, v) for k, v in sd.items() if not k.endswith("num_batches_tracked")]


def convert_enet_state_dict(sd: Dict[str, np.ndarray], params, state):
    """Positional shape-matched conversion. Raises if the tensor streams
    do not align."""
    import copy

    import jax

    # Flatten from the ORIGINAL trees: jax.tree_map re-sorts dict keys,
    # which would break the positional (definition-order) alignment with
    # the torch state dict's registration order.
    ours = _flatten_ordered(params) + _flatten_ordered(state)
    params = copy.deepcopy(jax.tree_util.tree_map(np.asarray, params))
    state = copy.deepcopy(jax.tree_util.tree_map(np.asarray, state))

    def shape_for(leaf):
        return tuple(np.shape(leaf))

    torch_stream = torch_tensors_in_order(sd)
    ti = 0
    converted = 0
    for path, leaf in ours:
        if path[-1] == "alpha":
            want = shape_for(leaf)
            cast = lambda t: t.reshape(want)
        elif path[-1] == "kernel" and np.ndim(leaf) == 4:
            want = shape_for(leaf)
            cast = lambda t: np.transpose(t, (2, 3, 1, 0))
        else:
            want = shape_for(leaf)
            cast = lambda t: t
        # scan forward for the next shape-compatible torch tensor
        while ti < len(torch_stream):
            _, tv = torch_stream[ti]
            try:
                cand = cast(np.asarray(tv))
            except ValueError:
                ti += 1
                continue
            if cand.shape == want:
                _assign(params, state, path, cand)
                converted += 1
                ti += 1
                break
            ti += 1
        else:
            break
    return params, state, converted


def _assign(params, state, path, value):
    for tree in (params, state):
        node = tree
        ok = True
        for p in path[:-1]:
            if isinstance(node, dict) and p in node:
                node = node[p]
            elif isinstance(node, (list, tuple)) and isinstance(p, int) and p < len(node):
                node = node[p]
            else:
                ok = False
                break
        if ok and isinstance(node, dict) and path[-1] in node:
            node[path[-1]] = value.astype(np.float32)
            return
    raise KeyError(path)
