"""Furthest point sampling (FPS) for TPU.

Behavioral contract (reference lib/pointnet2/_ext_src/src/sampling_gpu.cu:69-229):
  * the first sampled index is always 0;
  * each subsequent pick maximizes the min squared distance to all
    previously picked points;
  * points with ||p||^2 <= 1e-3 are never candidates (the reference uses
    this as a padding hack, sampling_gpu.cu:100-101);
  * ties resolve to the lowest index (jnp.argmax picks the first max,
    matching the CUDA kernel's strict-greater update for in-thread scans).

Two implementations:
  * :func:`furthest_point_sample_xla` — pure-XLA ``lax.fori_loop``; runs on
    any backend and is the correctness oracle.
  * fps_pallas.furthest_point_sample_pallas — the TPU kernel; the whole
    sequential loop runs on-core with VMEM-resident state.

``furthest_point_sample`` dispatches to the Pallas kernel on TPU and the
XLA loop elsewhere.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

_MAG_EPS = 1e-3
_INIT_DIST = 1e10


def _fps_single(xyz: jnp.ndarray, npoint: int) -> jnp.ndarray:
    """FPS over one point set. xyz: (N, 3) f32 -> (npoint,) int32."""
    n = xyz.shape[0]
    valid = jnp.sum(xyz * xyz, axis=-1) > _MAG_EPS  # (N,)

    def body(i, state):
        mind, idxs, last = state
        p = xyz[last]  # (3,)
        d = jnp.sum((xyz - p[None, :]) ** 2, axis=-1)  # (N,)
        mind = jnp.where(valid, jnp.minimum(mind, d), mind)
        score = jnp.where(valid, mind, -1.0)
        nxt = jnp.argmax(score).astype(jnp.int32)
        idxs = idxs.at[i].set(nxt)
        return mind, idxs, nxt

    mind0 = jnp.full((n,), _INIT_DIST, dtype=jnp.float32)
    idxs0 = jnp.zeros((npoint,), dtype=jnp.int32)
    _, idxs, _ = lax.fori_loop(1, npoint, body, (mind0, idxs0, jnp.int32(0)))
    return idxs


@functools.partial(jax.jit, static_argnums=(1,))
def furthest_point_sample_xla(xyz: jnp.ndarray, npoint: int) -> jnp.ndarray:
    """xyz: (B, N, 3) f32 -> (B, npoint) int32."""
    return jax.vmap(lambda p: _fps_single(p, npoint))(xyz)


def furthest_point_sample(xyz: jnp.ndarray, npoint: int) -> jnp.ndarray:
    """Dispatching entry point. (B, N, 3) f32 -> (B, npoint) int32.

    Non-differentiable (reference lib/pointnet2/pointnet2_utils.py:72).
    On TPU the Pallas kernel runs the whole sequential loop on-core
    (~40x faster than the XLA fori_loop at 40k points -> 2048 samples);
    elsewhere (CPU tests) the XLA loop is used.
    """
    # Non-differentiable by contract: cut the tangent path so the Pallas
    # kernel (which has no AD rule) sees only known values under jax.grad.
    xyz = jax.lax.stop_gradient(xyz)
    if jax.default_backend() == "tpu":
        from spacap3d_tpu.ops.fps_pallas import (
            furthest_point_sample_pallas as fps_pl,
        )

        return fps_pl(xyz, npoint)
    return furthest_point_sample_xla(xyz, npoint)
