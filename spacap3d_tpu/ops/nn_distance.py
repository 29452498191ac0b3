"""Dense chamfer distance (nearest-neighbor distance both directions).

TPU-native port of reference utils/nn_distance.py:13-62 semantics; used by
the vote / objectness / center losses and reference-object matching.
"""
from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp


def huber_loss(error: jnp.ndarray, delta: float = 1.0) -> jnp.ndarray:
    """Elementwise huber (reference utils/nn_distance.py:13-30)."""
    abs_error = jnp.abs(error)
    quadratic = jnp.clip(abs_error, max=delta)
    linear = abs_error - quadratic
    return 0.5 * quadratic ** 2 + delta * linear


def nn_distance(
    pc1: jnp.ndarray,
    pc2: jnp.ndarray,
    l1smooth: bool = False,
    delta: float = 1.0,
    l1: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """pc1: (B, N, C), pc2: (B, M, C).

    Returns (dist1 (B,N), idx1 (B,N), dist2 (B,M), idx2 (B,M)):
    for every point in pc1 the distance/index of the nearest pc2 point and
    vice versa.  Distance is squared-L2 by default, L1 with ``l1=True``,
    summed huber with ``l1smooth=True`` — matching the reference exactly.
    """
    # Unrolled per coordinate: materializing the (B, N, M, C) broadcast
    # diff puts C(=3) on the lane axis, which TPU tiling pads to 128 — a
    # ~42x memory blowup that profiled ~30 ms/step in the train loss.
    # Summing per-coordinate (B, N, M) terms in axis order is the same
    # float addition order as sum(..., axis=-1), i.e. bitwise identical.
    c = pc1.shape[-1]

    def term(k):
        dk = pc1[:, :, None, k] - pc2[:, None, :, k]    # (B, N, M)
        if l1smooth:
            return huber_loss(dk, delta)
        if l1:
            return jnp.abs(dk)
        return dk * dk

    d = term(0)
    for k in range(1, c):
        d = d + term(k)
    dist1 = jnp.min(d, axis=2)
    idx1 = jnp.argmin(d, axis=2).astype(jnp.int32)
    dist2 = jnp.min(d, axis=1)
    idx2 = jnp.argmin(d, axis=1).astype(jnp.int32)
    return dist1, idx1, dist2, idx2
