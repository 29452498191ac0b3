"""Ball query for TPU.

Behavioral contract (reference lib/pointnet2/_ext_src/src/ball_query_gpu.cu:9-54):
  * for each query center, return the indices of the *first* ``nsample``
    points (in input order) with squared distance strictly less than
    ``radius**2``;
  * if fewer than ``nsample`` points are found, remaining slots are padded
    by repeating the *first* hit (ball_query_gpu.cu:33-41);
  * if no point is within the radius, the row stays all-zero
    (zero-initialized output, ball_query.cpp:19-21).

TPU design: instead of the CUDA kernel's sequential O(N) scan per center,
we compute distance rows on the MXU (||c-p||^2 = |c|^2 + |p|^2 - 2 c.p,
the cross term is a (m,3)x(3,N) matmul) and select the first-k hits with a
single ``lax.top_k`` over an order-encoding key:

    key = 2N - idx   if hit   (range [N, 2N], decreasing in idx)
    key = -idx       if miss  (range (-N, 0], always below every hit)

``top_k(key, nsample)`` then yields exactly the first ``nsample`` hit
indices in ascending index order (top_k is deterministic and sorts equal
keys by position, but all keys here are distinct). Centers are processed
in chunks so the (chunk, N) distance tile stays small enough to stream
through VMEM.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax


_N_CHUNK = 2048  # hierarchical selection tile along the point axis


def _ball_query_chunk(centers, xyz, radius, nsample):
    """centers: (C, 3), xyz: (N, 3) -> (C, nsample) int32.

    Selection is hierarchical: per point-tile top-k (the first-k hits of a
    tile are in its top-k keys), then a merge top-k over the tile winners —
    O(N log ns) instead of one full-width O(N log N) top-k. Correct because
    every global first-k hit is necessarily within its own tile's first-k.
    """
    if xyz.shape[0] > 2 * _N_CHUNK and xyz.shape[0] % _N_CHUNK:
        # pad with far-away points (never hits, lowest-priority keys)
        pad = _N_CHUNK - xyz.shape[0] % _N_CHUNK
        xyz = jnp.concatenate(
            [xyz, jnp.full((pad, 3), 1e6, xyz.dtype)], axis=0
        )
    n = xyz.shape[0]
    # Squared distances via the MXU-friendly expansion.
    c2 = jnp.sum(centers * centers, axis=-1, keepdims=True)        # (C, 1)
    p2 = jnp.sum(xyz * xyz, axis=-1)[None, :]                       # (1, N)
    cross = jnp.dot(centers, xyz.T, preferred_element_type=jnp.float32)
    d2 = c2 + p2 - 2.0 * cross                                      # (C, N)

    hit = d2 < radius * radius
    idx = lax.broadcasted_iota(jnp.int32, d2.shape, 1)              # (C, N)
    # order-encoding key: hits sort above misses, both decreasing in index
    key = jnp.where(hit, 2 * n - idx, -idx)

    c = centers.shape[0]
    if n > 2 * _N_CHUNK and n % _N_CHUNK == 0:
        nc = n // _N_CHUNK
        per_tile, _ = lax.top_k(key.reshape(c, nc, _N_CHUNK),
                                min(nsample, _N_CHUNK))             # (C, nc, ns)
        topk, _ = lax.top_k(per_tile.reshape(c, -1), nsample)
    else:
        topk, _ = lax.top_k(key, nsample)                           # (C, nsample)

    found = topk >= n
    first_hit = jnp.where(found[:, :1], 2 * n - topk[:, :1], 0)     # (C, 1)
    out = jnp.where(found, 2 * n - topk, first_hit)                 # repeat-pad
    return out.astype(jnp.int32)


@functools.partial(jax.jit, static_argnums=(2, 3, 4))
def ball_query(
    xyz: jnp.ndarray,
    new_xyz: jnp.ndarray,
    radius: float,
    nsample: int,
    chunk: int = 256,
) -> jnp.ndarray:
    """xyz: (B, N, 3), new_xyz: (B, m, 3) -> (B, m, nsample) int32.

    Non-differentiable index op.
    """
    b, m, _ = new_xyz.shape
    chunk = min(chunk, m)
    pad = (-m) % chunk
    if pad:
        new_xyz = jnp.concatenate(
            [new_xyz, jnp.zeros((b, pad, 3), new_xyz.dtype)], axis=1
        )
    mc = new_xyz.shape[1] // chunk
    centers = new_xyz.reshape(b, mc, chunk, 3)

    def per_batch(centers_b, xyz_b):
        return lax.map(
            lambda c: _ball_query_chunk(c, xyz_b, radius, nsample), centers_b
        )

    out = jax.vmap(per_batch)(centers, xyz)  # (B, mc, chunk, nsample)
    out = out.reshape(b, mc * chunk, nsample)
    return out[:, :m]
