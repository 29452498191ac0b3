"""Pallas TPU kernel for furthest point sampling.

FPS is the one genuinely sequential op in the pipeline (m dependent
argmax steps). The pure-XLA ``fori_loop`` version launches ~m tiny
kernels; this kernel runs the whole loop on-core with all state
resident in VMEM:

  * layout: coordinates transposed to (B, N) per axis — batch rides the
    8-wide sublane dimension, points ride the 128-wide lane dimension,
    so every per-step op (distance update, min, masked argmax) is a
    single VPU pass over the whole batch;
  * the previously-picked point's coordinates are extracted with a
    one-hot masked reduction (no per-row dynamic gather);
  * semantics identical to the CUDA kernel (sampling_gpu.cu:69-229):
    seed index 0, ||p||^2 <= 1e-3 points excluded, first-index tie-break
    (argmax picks the lowest index).

Falls back transparently: ``furthest_point_sample`` in ops/fps.py
dispatches here on TPU.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

_MAG_EPS = 1e-3
_INIT_DIST = 1e10
_LANE = 128
_SUBLANE = 8


def _fps_kernel(x_ref, y_ref, z_ref, out_ref, *, npoint: int, n: int, b: int):
    from jax.experimental import pallas as pl  # noqa: F401

    x = x_ref[...]
    y = y_ref[...]
    z = z_ref[...]
    valid = (x * x + y * y + z * z) > _MAG_EPS          # (B, N)
    col = lax.broadcasted_iota(jnp.int32, (b, n), 1)     # lane index
    m = out_ref.shape[1]
    col_m = lax.broadcasted_iota(jnp.int32, (b, m), 1)

    def body(i, carry):
        mind, last, picks = carry                        # (B,N), (B,), (B,M)
        onehot = col == last[:, None]
        px = jnp.sum(jnp.where(onehot, x, 0.0), axis=1, keepdims=True)
        py = jnp.sum(jnp.where(onehot, y, 0.0), axis=1, keepdims=True)
        pz = jnp.sum(jnp.where(onehot, z, 0.0), axis=1, keepdims=True)
        d = (x - px) ** 2 + (y - py) ** 2 + (z - pz) ** 2
        # invalid points carry mind == -1 from init: d >= 0 always, so
        # the unconditional min keeps them at -1 — no per-step valid
        # mask or separate score array (two fewer full (B, N) passes in
        # the sequential hot loop). Valid points see the exact same
        # min-distance sequence as the masked form.
        mind = jnp.minimum(mind, d)
        # first-index argmax via compare + min-index (jnp.argmax hits a
        # Mosaic f32->i32 materialization bug at single-lane-tile shapes)
        best = jnp.max(mind, axis=1, keepdims=True)
        nxt = jnp.min(jnp.where(mind == best, col, n), axis=1).astype(jnp.int32)
        # dynamic-column store is not lane-aligned on TPU: carry the pick
        # matrix through the loop and store once at the end instead
        picks = jnp.where(col_m == i, nxt[:, None], picks)
        return mind, nxt, picks

    # mag<=eps points start (and stay) at -1.0: excluded from argmax
    # exactly like the reference's skip (sampling_gpu.cu:100-101)
    mind0 = jnp.where(valid, _INIT_DIST, -1.0).astype(jnp.float32)
    picks0 = jnp.zeros((b, m), jnp.int32)
    _, _, picks = lax.fori_loop(
        1, npoint, body, (mind0, jnp.zeros((b,), jnp.int32), picks0)
    )
    out_ref[...] = picks


def _pad_to(x, multiple, axis, value):
    pad = (-x.shape[axis]) % multiple
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=value)


@functools.partial(jax.jit, static_argnums=(1, 2))
def furthest_point_sample_pallas(xyz: jnp.ndarray, npoint: int,
                                 interpret: bool = False) -> jnp.ndarray:
    """xyz: (B, N, 3) f32 -> (B, npoint) int32."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b0, n0, _ = xyz.shape
    # pad points with zeros: zero-magnitude points are excluded by the
    # mag-eps rule, so padding never gets picked (matches the reference's
    # own padding hack)
    x = _pad_to(xyz[..., 0], _LANE, 1, 0.0)
    y = _pad_to(xyz[..., 1], _LANE, 1, 0.0)
    z = _pad_to(xyz[..., 2], _LANE, 1, 0.0)
    x = _pad_to(x, _SUBLANE, 0, 0.0)
    y = _pad_to(y, _SUBLANE, 0, 0.0)
    z = _pad_to(z, _SUBLANE, 0, 0.0)
    b, n = x.shape
    np_pad = (-npoint) % _LANE
    m = npoint + np_pad

    # grid over batch tiles of 8 (sublane width) keeps VMEM bounded for
    # any batch size
    bt = _SUBLANE
    kernel = functools.partial(_fps_kernel, npoint=npoint, n=n, b=bt)
    out = pl.pallas_call(
        kernel,
        grid=(b // bt,),
        in_specs=[
            pl.BlockSpec((bt, n), lambda i: (i, 0), memory_space=pltpu.VMEM)
        ] * 3,
        out_specs=pl.BlockSpec((bt, m), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, m), jnp.int32),
        interpret=interpret,
    )(x, y, z)
    return out[:b0, :npoint]
