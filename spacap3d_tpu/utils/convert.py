"""Reference (PyTorch) checkpoint -> spacap3d_tpu pytree converter.

Maps the reference's module-tree state-dict keys (SURVEY.md §5, e.g.
``backbone_net.sa1.mlp_module.layer0.conv.weight``) onto this framework's
functional params/state trees. Layout rules:

  * Conv1d/Conv2d 1x1 kernels (out, in, 1[, 1]) -> Dense kernel (in, out)
  * Linear weight (out, in) -> kernel (in, out)
  * Embedding lut (vocab, d) -> kernel (vocab, d) unchanged
  * BatchNorm weight/bias -> scale/bias (params); running_mean/var ->
    mean/var (state); num_batches_tracked dropped
  * LayerNorm a_2/b_2 -> scale/bias

Loads any of: the shipped detection-pretrained VoteNets
(/root/reference/pretrained/PRETRAIN_VOTENET_*), full SpaCap checkpoints
(model.pth with ``model_state_dict``), or raw state dicts.
"""
from __future__ import annotations

from typing import Dict, Tuple

import numpy as np


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    import torch

    payload = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(payload, dict) and "model_state_dict" in payload:
        payload = payload["model_state_dict"]
    out = {}
    for k, v in payload.items():
        if k.startswith("module."):  # DataParallel prefix (leading only!)
            k = k[len("module."):]
        out[k] = v.detach().numpy()
    return out


def _set(tree, path, value):
    node = tree
    for p in path[:-1]:
        node = node[p]
    leaf = node[path[-1]]
    assert np.shape(leaf) == np.shape(value), (
        f"shape mismatch at {path}: {np.shape(leaf)} vs {np.shape(value)}"
    )
    node[path[-1]] = np.asarray(value, np.float32)


def _conv_kernel(w: np.ndarray) -> np.ndarray:
    """(out, in, 1[,1]) or (out, in) -> (in, out)."""
    while w.ndim > 2:
        w = w[..., 0]
    return w.T


def _map_key(key: str):
    """torch state-dict key -> (tree ('params'|'state'), path tuple) or None."""
    parts = key.split(".")

    # ---- batch norm leaves -------------------------------------------------
    def bn_leaf(base_path, leaf):
        if leaf == "num_batches_tracked":
            return None
        if leaf in ("weight", "bias"):
            return ("params", base_path + ("scale" if leaf == "weight" else "bias",))
        if leaf in ("running_mean", "running_var"):
            return ("state", base_path + ("mean" if leaf == "running_mean" else "var",))
        raise KeyError(key)

    # ---- detector trunk ------------------------------------------------------
    if parts[0] in ("backbone_net", "vgen", "proposal"):
        if ".mlp_module.layer" in key or ".mlp.layer" in key:
            # backbone_net.saX.mlp_module.layerJ.{conv.weight, bn.bn.*}
            # backbone_net.fpX.mlp.layerJ.{...}
            # proposal.vote_aggregation.mlp_module.layerJ.{...}
            i = parts.index([p for p in parts if p.startswith("layer")][0])
            base = tuple(parts[:i + 1])
            rest = parts[i + 1:]
            if rest[0] == "conv":
                return ("params", base + ("conv", "kernel"), _conv_kernel)
            if rest[0] == "bn":  # bn.bn.<leaf>
                return bn_leaf(base + ("bn",), rest[-1])
        if parts[0] == "vgen":
            name, leaf = parts[1], parts[2]
            if name.startswith("conv"):
                if leaf == "weight":
                    return ("params", ("vgen", name, "kernel"), _conv_kernel)
                return ("params", ("vgen", name, "bias"))
            if name.startswith("bn"):
                return bn_leaf(("vgen", name), leaf)
        if parts[0] == "proposal" and parts[1] == "proposal":
            # torch Sequential indices: 0 conv, 1 bn, 3 conv, 4 bn, 6 conv
            seq = {"0": ("conv0",), "3": ("conv1",), "6": ("conv2",)}
            bns = {"1": ("bn0",), "4": ("bn1",)}
            idx, leaf = parts[2], parts[3]
            if idx in seq:
                if leaf == "weight":
                    return ("params", ("proposal",) + seq[idx] + ("kernel",), _conv_kernel)
                return ("params", ("proposal",) + seq[idx] + ("bias",))
            if idx in bns:
                return bn_leaf(("proposal",) + bns[idx], leaf)

    # ---- captioner ----------------------------------------------------------
    if parts[0] == "caption":
        if parts[-1] == "pe":
            # sinusoidal PositionalEncoding buffer (tgt_embed.1.pe /
            # src_embed.pe) — deterministic, recomputed on the fly
            # (captioner.sinusoid_pe); parity covered by
            # tests/test_captioner_reference_parity.py
            return None
        if parts[1] == "relation_proposal":
            idx, leaf = parts[2], parts[3]
            name = {"0": "l0", "2": "l2", "4": "l4"}[idx]
            path = ("caption", "relation_proposal", name)
            if leaf == "weight":
                return ("params", path + ("kernel",), _conv_kernel)
            return ("params", path + ("bias",))
        assert parts[1] == "model"
        sub = parts[2]
        if sub in ("encoder", "decoder"):
            if parts[3] == "norm":
                leaf = {"a_2": "scale", "b_2": "bias"}[parts[4]]
                return ("params", ("caption", "model", sub, "norm", leaf))
            # layers.L....
            lidx = int(parts[4])
            rest = parts[5:]
            base = ("caption", "model", sub, "layers", lidx)
            if rest[0] in ("self_attn", "src_attn"):
                lin = f"linears{rest[2]}"
                if rest[3] == "weight":
                    return ("params", base + (rest[0], lin, "kernel"), _conv_kernel)
                return ("params", base + (rest[0], lin, "bias"))
            if rest[0] == "feed_forward":
                if rest[2] == "weight":
                    return ("params", base + ("feed_forward", rest[1], "kernel"), _conv_kernel)
                return ("params", base + ("feed_forward", rest[1], "bias"))
            if rest[0] == "sublayer":
                leaf = {"a_2": "scale", "b_2": "bias"}[rest[3]]
                return ("params", base + (f"sublayer{rest[1]}", "norm", leaf))
        if sub == "src_embed":
            # position_embedding_head.{0 conv,1 bn,3 conv}
            idx, leaf = parts[4], parts[5]
            base = ("caption", "model", "src_embed")
            if idx == "0":
                if leaf == "weight":
                    return ("params", base + ("conv0", "kernel"), _conv_kernel)
                return ("params", base + ("conv0", "bias"))
            if idx == "3":
                if leaf == "weight":
                    return ("params", base + ("conv1", "kernel"), _conv_kernel)
                return ("params", base + ("conv1", "bias"))
            if idx == "1":
                return bn_leaf(base + ("bn",), leaf)
        if sub == "tgt_embed":
            # tgt_embed.0.lut.weight
            return ("params", ("caption", "model", "tgt_embed", "lut", "kernel"))
        if sub == "generator":
            leaf = parts[4]
            if leaf == "weight":
                return ("params", ("caption", "model", "generator", "proj", "kernel"),
                        _conv_kernel)
            return ("params", ("caption", "model", "generator", "proj", "bias"))

    raise KeyError(f"unmapped key: {key}")


def convert_state_dict(
    sd: Dict[str, np.ndarray], params, state, strict: bool = False
) -> Tuple[Dict, Dict, Dict]:
    """Writes torch weights into copies of (params, state). Returns
    (params, state, report). Missing targets (e.g. captioner keys when
    loading a detector-only checkpoint into a detector-only model) are
    skipped unless ``strict``."""
    import copy

    params = copy.deepcopy(jax_to_np(params))
    state = copy.deepcopy(jax_to_np(state))
    loaded, skipped = [], []
    # fix the state-tree naming: captioner state lives under
    # state['caption']['src_embed'] (the model tree prefix is implicit)
    for key, value in sd.items():
        try:
            mapped = _map_key(key)
        except (KeyError, AssertionError, IndexError):
            skipped.append(key)
            continue
        if mapped is None:
            continue
        which, path = mapped[0], mapped[1]
        transform = mapped[2] if len(mapped) > 2 else None
        v = transform(value) if transform else value
        tree = params if which == "params" else state
        if which == "state" and path[:3] == ("caption", "model", "src_embed"):
            path = ("caption", "src_embed") + path[3:]
        try:
            _set(tree, path, v)
            loaded.append(key)
        except (KeyError, TypeError, AssertionError) as e:
            if strict:
                raise
            skipped.append(f"{key} ({e})")
    report = {"loaded": loaded, "skipped": skipped}
    return np_to_jax(params), np_to_jax(state), report


def jax_to_np(tree):
    import jax

    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def np_to_jax(tree):
    import jax
    import jax.numpy as jnp

    return jax.tree_util.tree_map(lambda x: jnp.asarray(x), tree)


def load_reference_checkpoint(path: str, params, state, strict: bool = False):
    """One-call convenience: torch .pth -> converted (params, state)."""
    sd = load_torch_state_dict(path)
    return convert_state_dict(sd, params, state, strict)
