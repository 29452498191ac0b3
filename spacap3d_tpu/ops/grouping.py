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

import functools

import jax
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


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def group_and_localize(cat: jnp.ndarray, idx: jnp.ndarray,
                       new_xyz: jnp.ndarray, radius) -> jnp.ndarray:
    """Fused SA neighbor assembly: gather (xyz ++ feature) rows, then
    center-subtract and radius-normalize the xyz slice —
    ``out[..., :3] = (gathered[..., :3] - new_xyz) / radius``,
    ``out[..., 3:] = gathered[..., 3:]`` (``radius=None`` skips the
    divide; it is a static Python float, reference SA config).

    Forward is BIT-IDENTICAL to the composed
    group_points -> slice/subtract/divide -> concat (same ops). The
    custom VJP exists for the backward: autodiff re-materializes the
    slice/concat pair around the big (B, m, ns, 3+C) tensor to assemble
    the scatter update, paying layout copies + a re-pad fusion
    (~1.9 ms/step at SA2 flagship shapes); here the backward is one
    fused channel-scale multiply + scatter-add. Measured 5.6% on the
    standalone SA2 block fwd+bwd, neutral at SA1 (README roofline);
    gradients match autodiff to reassociation (1/r multiply vs /r
    divide on the xyz slice)."""
    grouped = group_points(cat, idx)
    gx = grouped[..., :3] - new_xyz[:, :, None, :]
    if radius is not None:
        gx = gx / radius
    return jnp.concatenate([gx, grouped[..., 3:]], axis=-1)


def _group_and_localize_fwd(cat, idx, new_xyz, radius):
    return group_and_localize(cat, idx, new_xyz, radius), (idx, cat.shape)


def _group_and_localize_bwd(radius, res, g):
    idx, cat_shape = res
    b, m, ns = idx.shape
    c = cat_shape[-1]
    inv = 1.0 if radius is None else 1.0 / radius
    scale = jnp.concatenate([jnp.full((3,), inv, g.dtype),
                             jnp.ones((c - 3,), g.dtype)])
    rows = (g * scale).reshape(b, m * ns, c)
    flat = idx.reshape(b, m * ns).astype(jnp.int32)
    d_cat = jnp.zeros(cat_shape, g.dtype).at[
        jnp.arange(b)[:, None], flat].add(rows)
    d_new_xyz = -jnp.sum(g[..., :3], axis=2) * inv
    return d_cat, None, d_new_xyz


group_and_localize.defvjp(_group_and_localize_fwd, _group_and_localize_bwd)
