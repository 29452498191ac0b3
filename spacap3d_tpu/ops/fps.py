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
  * :func:`furthest_point_sample_pallas` — a Pallas TPU kernel that keeps
    the xyz block and the running min-distance vector resident in VMEM for
    the whole sequential loop (one grid step per batch element), avoiding
    m round-trips to HBM.

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


# ---------------------------------------------------------------------------
# Pallas TPU kernel
# ---------------------------------------------------------------------------

def _fps_kernel(xyz_ref, out_ref, mind_ref, *, npoint: int, n: int):
    """One grid step == one batch element.

    xyz_ref:  (N, 4) VMEM block (xyz padded with a zero column so the lane
              dim is friendly; distances computed with jnp ops on the VPU).
    out_ref:  (npoint,) int32 VMEM output block (written per step).
    mind_ref: (N,) f32 VMEM scratch — running min squared distance.
    """
    import jax.numpy as jnp  # local alias for clarity inside kernel

    xyz = xyz_ref[:, :3]  # (N, 3)
    mag = jnp.sum(xyz * xyz, axis=-1)  # (N,)
    valid = mag > _MAG_EPS
    mind_ref[:] = jnp.full((n,), _INIT_DIST, dtype=jnp.float32)
    out_ref[0] = jnp.int32(0)

    def body(i, last):
        p = xyz[last]
        d = jnp.sum((xyz - p[None, :]) ** 2, axis=-1)
        mind = jnp.where(valid, jnp.minimum(mind_ref[:], d), mind_ref[:])
        mind_ref[:] = mind
        score = jnp.where(valid, mind, -1.0)
        nxt = jnp.argmax(score).astype(jnp.int32)
        out_ref[i] = nxt
        return nxt

    lax.fori_loop(1, npoint, body, jnp.int32(0))


@functools.partial(jax.jit, static_argnums=(1,))
def furthest_point_sample_pallas(xyz: jnp.ndarray, npoint: int) -> jnp.ndarray:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, n, _ = xyz.shape
    # Pad xyz to (N, 4) for lane-aligned VMEM layout.
    xyz4 = jnp.concatenate([xyz, jnp.zeros((b, n, 1), xyz.dtype)], axis=-1)

    kernel = functools.partial(_fps_kernel, npoint=npoint, n=n)
    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, n, 4), lambda i: (i, 0, 0), memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((1, npoint), lambda i: (i, 0), memory_space=pltpu.ANY),
        out_shape=jax.ShapeDtypeStruct((b, npoint), jnp.int32),
        scratch_shapes=[pltpu.VMEM((n,), jnp.float32)],
    )(xyz4)


def furthest_point_sample(xyz: jnp.ndarray, npoint: int) -> jnp.ndarray:
    """Dispatching entry point. (B, N, 3) f32 -> (B, npoint) int32.

    Non-differentiable (reference lib/pointnet2/pointnet2_utils.py:72).
    """
    return furthest_point_sample_xla(xyz, npoint)
