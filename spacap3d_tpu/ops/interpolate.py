"""Three-nearest-neighbor feature interpolation.

TPU-native replacement for the reference CUDA three_nn / three_interpolate
kernels (lib/pointnet2/_ext_src/src/interpolate_gpu.cu:9-154).

Contract:
  * ``three_nn`` returns *squared* distances (the reference kernel stores
    d^2, interpolate_gpu.cu:50-53) of the 3 nearest "known" points for each
    "unknown" point, with ties resolved to the lower index (the reference's
    insertion sort replaces only on strict ``<``; ``lax.top_k`` on negated
    distances picks earlier indices first for equal values).
  * ``three_interpolate`` computes the weighted feature sum; its gradient
    (the reference's atomicAdd scatter, interpolate_gpu.cu:116-154) comes
    from JAX autodiff.
"""
from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
from jax import lax

from spacap3d_tpu.ops.grouping import group_points


def three_nn(unknown: jnp.ndarray, known: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """unknown: (B, n, 3), known: (B, m, 3) -> (dist2 (B,n,3), idx (B,n,3) int32)."""
    # (B, n, m) squared distances; n,m <= 1024 here so this is small.
    diff = unknown[:, :, None, :] - known[:, None, :, :]
    d2 = jnp.sum(diff * diff, axis=-1)
    neg, idx = lax.top_k(-d2, 3)
    return -neg, idx.astype(jnp.int32)


def three_interpolate(
    feats: jnp.ndarray, idx: jnp.ndarray, weight: jnp.ndarray
) -> jnp.ndarray:
    """feats: (B, m, C), idx: (B, n, 3), weight: (B, n, 3) -> (B, n, C).

    out[b, j] = sum_i weight[b, j, i] * feats[b, idx[b, j, i]].
    """
    gathered = group_points(feats, idx)          # (B, n, 3, C)
    return jnp.sum(gathered * weight[..., None], axis=2)
