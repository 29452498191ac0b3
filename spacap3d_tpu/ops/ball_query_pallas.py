"""Pallas TPU kernel for ball query.

Same behavioral contract as ops/ball_query.py (reference
lib/pointnet2/_ext_src/src/ball_query_gpu.cu:9-54): per center, the
indices of the first ``nsample`` points in input order with squared
distance strictly < radius^2; repeat-first-hit padding; all-zero row on
miss.

The XLA implementation materializes its intermediates (the (C, nt, 128)
hit mask alone is ~160 MB/scene written + re-read, plus the slot-onehot
tensors) — ~5x off the HBM floor at SA1 scale. This kernel processes a
block of centers per grid step and keeps every intermediate in VMEM:

  * one MXU matmul (precision HIGHEST) produces the cross term c.p for
    the whole center block from 8-row augmented inputs, and the VPU
    assembles d2 = (|c|^2 + |p|^2) - 2*(c.p) with the same operand and
    op order as the XLA path;
  * hit mask, per-128-lane-tile totals, cross-tile inclusive prefix
    (triangular matmul — integer counts are exact with bf16 operands and
    f32 accumulation), slot->tile selection, per-slot tile gather
    (one-hot batched matmul) and within-tile ranking all stay on-chip;
  * output is just the (C, nsample) int32 index block.

Numerics note: Mosaic's HIGHEST f32 matmul and XLA's einsum lowering can
still disagree in the last ulp for points exactly on the radius boundary
(~1e-5 of neighbor slots on uniform random clouds) — the same
measure-zero caveat the CUDA reference's direct (c-p)^2 form has against
either. Interpret-mode tests (shared XLA-CPU arithmetic) assert exact
index equality vs the XLA oracle.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

_T = 128          # point tile = lane width
_CB = 32          # centers per grid step
_FAR = 1e6        # padding coordinate (never within any radius)


def _tri_incl(t: int, dtype) -> jnp.ndarray:
    i = lax.broadcasted_iota(jnp.int32, (t, t), 0)
    j = lax.broadcasted_iota(jnp.int32, (t, t), 1)
    return (i <= j).astype(dtype)


def _bq_kernel(pts_ref, cen_ref, out_ref, *, radius, nsample, n, ntp):
    nt = n // _T
    pts = pts_ref[0]                                       # (8, N)
    cen = cen_ref[0]                                       # (CB, 8)

    # ---- squared distances: MXU cross term + VPU assembly in the exact
    # operand/op order of the XLA path (ball_query.py), so borderline
    # hits agree bitwise with the tested implementation
    cross = lax.dot_general(
        cen[:, 0:4], pts[0:4, :], (((1,), (0,)), ((), ())),
        precision=lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )                                                      # (CB, N) = c.p
    c2 = cen[:, 4:5]                                       # (CB, 1)
    p2 = pts[4:5, :]                                       # (1, N)
    d2 = c2 + p2 - 2.0 * cross
    hit = (d2 < radius * radius).astype(jnp.bfloat16)      # (CB, N)
    hit3 = hit.reshape(_CB, nt, _T)

    # ---- per-tile totals + cross-tile inclusive prefix ----------------
    tile_tot = jnp.sum(hit3.astype(jnp.float32), axis=-1)  # (CB, nt)
    if ntp != nt:
        tile_tot = jnp.pad(tile_tot, ((0, 0), (0, ntp - nt)))
    # bf16 operands exact (counts <= 128 and 0/1), f32 accumulation exact
    tile_incl = lax.dot_general(
        tile_tot.astype(jnp.bfloat16), _tri_incl(ntp, jnp.bfloat16),
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                      # (CB, ntp)
    tile_excl = tile_incl - tile_tot
    count = tile_incl[:, nt - 1].astype(jnp.int32)         # (CB,)

    # ---- slot -> tile: count tiles with cumulative total <= s ---------
    targets = lax.broadcasted_iota(jnp.int32, (1, nsample, 1), 1
                                   ).astype(jnp.float32)
    below = (tile_incl[:, None, :] <= targets).astype(jnp.float32)
    sel_tile = jnp.sum(below, axis=-1).astype(jnp.int32)   # (CB, ns)
    sel_tile = jnp.minimum(sel_tile, nt - 1)

    # ---- gather each slot's tile row + its exclusive prefix -----------
    tcol = lax.broadcasted_iota(jnp.int32, (_CB, nsample, ntp), 2)
    onehot = (tcol == sel_tile[..., None]).astype(jnp.bfloat16)
    hitp = hit3
    if ntp != nt:
        hitp = jnp.pad(hit3, ((0, 0), (0, ntp - nt), (0, 0)))
    gathered = lax.dot_general(
        onehot, hitp,
        (((2,), (1,)), ((0,), (0,))),                      # batch over centers
        preferred_element_type=jnp.float32,
    )                                                      # (CB, ns, T)
    excl_at = jnp.sum(onehot.astype(jnp.float32) * tile_excl[:, None, :],
                      axis=-1)                             # (CB, ns)

    rows = lax.dot_general(
        gathered.astype(jnp.bfloat16), _tri_incl(_T, jnp.bfloat16),
        (((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                      # (CB, ns, T)
    rank = targets[0] - excl_at[..., None]                 # (CB, ns, 1)
    sel_in = jnp.sum((rows <= rank).astype(jnp.int32), axis=-1)
    sel = sel_tile * _T + sel_in                           # (CB, ns)

    # ---- repeat-first / zero-on-miss semantics -------------------------
    scol = lax.broadcasted_iota(jnp.int32, (_CB, nsample), 1)
    valid = scol < count[:, None]
    first_hit = jnp.where(count[:, None] > 0, sel[:, :1], 0)
    out_ref[0] = jnp.where(valid, sel, first_hit).astype(jnp.int32)


@functools.partial(jax.jit, static_argnums=(2, 3, 4))
def ball_query_pallas(
    xyz: jnp.ndarray,
    new_xyz: jnp.ndarray,
    radius: float,
    nsample: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """xyz: (B, N, 3), new_xyz: (B, m, 3) -> (B, m, nsample) int32."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, n0, _ = xyz.shape
    m0 = new_xyz.shape[1]

    pad_n = (-n0) % _T
    if pad_n:
        xyz = jnp.concatenate(
            [xyz, jnp.full((b, pad_n, 3), _FAR, xyz.dtype)], axis=1
        )
    pad_m = (-m0) % _CB
    if pad_m:
        new_xyz = jnp.concatenate(
            [new_xyz, jnp.zeros((b, pad_m, 3), new_xyz.dtype)], axis=1
        )
    n, m = xyz.shape[1], new_xyz.shape[1]
    nt = n // _T
    ntp = -(-nt // 8) * 8  # pad tile axis to the f32 sublane width

    # augmented rows: [x, y, z, 0, |.|^2, 0, 0, 0] — the kernel contracts
    # rows 0:4 for the cross term (the zero row adds exact +0.0) and
    # reads row 4 for the squared norms, computed here with the same
    # jnp ops as the XLA path
    x, y, z = xyz[..., 0], xyz[..., 1], xyz[..., 2]
    p2 = jnp.sum(xyz * xyz, axis=-1)
    zeros = jnp.zeros_like(x)
    pts = jnp.stack([x, y, z, zeros, p2, zeros, zeros, zeros],
                    axis=1)                                # (B, 8, N)
    cx, cy, cz = new_xyz[..., 0], new_xyz[..., 1], new_xyz[..., 2]
    c2 = jnp.sum(new_xyz * new_xyz, axis=-1)
    czeros = jnp.zeros_like(cx)
    cen = jnp.stack([cx, cy, cz, czeros, c2, czeros, czeros, czeros],
                    axis=-1)                               # (B, m, 8)

    kernel = functools.partial(
        _bq_kernel, radius=float(radius), nsample=nsample, n=n, ntp=ntp
    )
    out = pl.pallas_call(
        kernel,
        grid=(b, m // _CB),
        in_specs=[
            pl.BlockSpec((1, 8, n), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _CB, 8), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, _CB, nsample), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, m, nsample), jnp.int32),
        interpret=interpret,
    )(pts, cen)
    return out[:, :m0]
