"""Gather / group ops.

TPU-native replacements for the reference CUDA gather/group kernels
(lib/pointnet2/_ext_src/src/sampling_gpu.cu:8-57, group_points_gpu.cu:8-75).
On TPU these are plain XLA gathers — ``jnp.take_along_axis`` lowers to an
efficient dynamic-gather, and reverse-mode AD gives the atomicAdd scatter
gradients of the reference (#3, #6, #9 in the binding table) for free.

Layout note: the reference keeps features channel-first (B, C, N); we use
channel-last (B, N, C) throughout, which is the natural TPU layout (C on
the 128-wide lane dimension).
"""
from __future__ import annotations

import jax.numpy as jnp


def gather_points(points: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """points: (B, N, C), idx: (B, m) int -> (B, m, C).

    out[b, j] = points[b, idx[b, j]]  (reference sampling_gpu.cu:8-30,
    channel-last). Differentiable w.r.t. ``points``.
    """
    return jnp.take_along_axis(points, idx[..., None].astype(jnp.int32), axis=1)


def group_points(points: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """points: (B, N, C), idx: (B, m, ns) int -> (B, m, ns, C).

    out[b, j, k] = points[b, idx[b, j, k]]  (reference group_points_gpu.cu:8-39,
    channel-last). Differentiable w.r.t. ``points``.
    """
    b, m, ns = idx.shape
    flat = idx.reshape(b, m * ns).astype(jnp.int32)
    out = jnp.take_along_axis(points, flat[..., None], axis=1)
    return out.reshape(b, m, ns, points.shape[-1])
