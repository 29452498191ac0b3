"""Ball query for TPU.

Behavioral contract (reference lib/pointnet2/_ext_src/src/ball_query_gpu.cu:9-54):
  * for each query center, return the indices of the *first* ``nsample``
    points (in input order) with squared distance strictly less than
    ``radius**2``;
  * if fewer than ``nsample`` points are found, remaining slots are padded
    by repeating the *first* hit (ball_query_gpu.cu:33-41);
  * if no point is within the radius, the row stays all-zero
    (zero-initialized output, ball_query.cpp:19-21).

TPU design (profiling-driven; see git history for the discarded
alternatives):
  * distances via the MXU expansion ||c-p||^2 = |c|^2 + |p|^2 - 2 c.p
    (cross term computed at HIGHEST precision — bf16 passes would
    misclassify borderline hits);
  * selection of the first-k hit indices is sort-free, gather-light and
    scatter-free. ``lax.top_k`` lowers to a full variadic sort (~200 ms
    for SA1), XLA ``cumsum``/``searchsorted`` lowerings were similarly
    slow. Instead:
      1. per-128-lane-tile inclusive prefix sums of the hit mask as a
         triangular MXU matmul (integer counts are exact in bf16 passes);
      2. cross-tile totals prefix-summed the same way;
      3. each output slot s locates its tile by counting tiles whose
         cumulative total is <= s (a tiny compare+reduce), then its
         within-tile position by one aligned row-gather of that tile's
         prefix row and another tiny compare+reduce.
    Total cost is O(N) memory-bound work + O(ns * (nt + T)) per center.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax import lax

_TILE = 128  # lane width


def _tri_inclusive(t: int) -> jnp.ndarray:
    """tri[k, j] = 1.0 if k <= j (inclusive prefix-sum matmul operand)."""
    i = lax.broadcasted_iota(jnp.int32, (t, t), 0)
    j = lax.broadcasted_iota(jnp.int32, (t, t), 1)
    return (i <= j).astype(jnp.float32)


def _ball_query_chunk(centers, xyz, radius, nsample):
    """centers: (C, 3), xyz: (N, 3) -> (C, nsample) int32. N % 128 == 0."""
    n = xyz.shape[0]
    c = centers.shape[0]
    nt = n // _TILE

    # ---- hit mask (computed directly in (C, nt, TILE) tile layout so no
    # relayout copy of the ~40 MB mask is needed downstream) -------------
    xyz_t = xyz.reshape(nt, _TILE, 3)
    c2 = jnp.sum(centers * centers, axis=-1)[:, None, None]         # (C,1,1)
    p2 = jnp.sum(xyz_t * xyz_t, axis=-1)[None]                      # (1,nt,T)
    cross = jnp.einsum("cd,tjd->ctj", centers, xyz_t,
                       precision=lax.Precision.HIGHEST)
    d2 = c2 + p2 - 2.0 * cross                                      # (C,nt,T)
    # bf16 hit mask: 0/1 values and <=128-counts are exact in bf16 passes
    hit_t = (d2 < radius * radius).astype(jnp.bfloat16)             # (C,nt,T)

    # ---- per-tile totals + cross-tile prefix (tiny tensors) ------------
    # Materializing the full per-point inclusive prefix (C, nt, 128) f32
    # profiled as the SA1 hot spot (~40 MB/chunk written, re-read, and
    # bf16-copied by XLA). Only the ns SELECTED tiles per center ever
    # need within-tile prefixes, so: totals first, pick tiles, then
    # prefix-sum just the gathered (C, ns, 128) hit rows.
    tile_tot = jnp.sum(hit_t.astype(jnp.float32), axis=-1)          # (C, nt)
    tile_incl = jnp.dot(tile_tot, _tri_inclusive(nt),
                        preferred_element_type=jnp.float32)         # (C, nt)
    tile_excl = tile_incl - tile_tot
    count = tile_incl[:, -1].astype(jnp.int32)                      # (C,)

    # ---- slot -> tile (count tiles with cumulative total <= s) ---------
    targets = jnp.arange(nsample, dtype=jnp.float32)                # (ns,)
    sel_tile = jnp.sum(
        (tile_incl[:, None, :] <= targets[None, :, None]).astype(jnp.int32),
        axis=-1,
    )                                                               # (C, ns)
    sel_tile = jnp.minimum(sel_tile, nt - 1)

    # ---- slot -> within-tile position ----------------------------------
    # XLA's dynamic row-gather profiled ~5 GB/s here; gather each slot's
    # hit tile with a one-hot MXU matmul instead, then prefix-sum the
    # gathered rows with one (128,128) triangular matmul. 0/1 values and
    # <=128 counts are exact in bf16 passes; the cross-tile offset
    # (values up to N) is selected separately at HIGHEST precision.
    onehot = (
        lax.broadcasted_iota(jnp.int32, (c, nsample, nt), 2)
        == sel_tile[..., None]
    )                                                               # (C, ns, nt)
    gathered = jnp.einsum(
        "cst,ctj->csj", onehot.astype(jnp.bfloat16), hit_t,
        preferred_element_type=jnp.float32,
    )                                                               # (C, ns, T)
    rows = jnp.dot(gathered.astype(jnp.bfloat16),
                   _tri_inclusive(_TILE).astype(jnp.bfloat16),
                   preferred_element_type=jnp.float32)              # (C, ns, T)
    excl_at = jnp.einsum(
        "cst,ct->cs", onehot.astype(jnp.float32), tile_excl,
        precision=lax.Precision.HIGHEST,
    )                                                               # (C, ns)
    rank = targets[None, :] - excl_at                               # (C, ns)
    sel_in = jnp.sum(
        (rows <= rank[..., None]).astype(jnp.int32), axis=-1
    )
    sel = sel_tile * _TILE + sel_in                                 # (C, ns)

    # ---- repeat-padding semantics ---------------------------------------
    valid = jnp.arange(nsample, dtype=jnp.int32)[None, :] < count[:, None]
    first_hit = jnp.where(count[:, None] > 0, sel[:, :1], 0)
    return jnp.where(valid, sel, first_hit).astype(jnp.int32)


def ball_query(
    xyz: jnp.ndarray,
    new_xyz: jnp.ndarray,
    radius: float,
    nsample: int,
    chunk: int = 2048,
) -> jnp.ndarray:
    """Dispatching entry point: (B, N, 3), (B, m, 3) -> (B, m, ns) int32.

    On TPU, large point sets go through the Pallas kernel
    (ball_query_pallas.py): all intermediates stay in VMEM, ~5x faster
    than the XLA path at SA1 scale (40k points x 2048 centers). Small
    problems (SA2-4) and other backends use the XLA implementation.
    The two can disagree on points within ~1 ulp of the radius boundary
    (different f32 summation order — the same class of divergence the
    CUDA reference's direct (c-p)^2 form has against both).

    NOTE: the SPACAP_BALL_QUERY_IMPL override is read at TRACE time and
    baked into the cached jit executable — set it before the first
    forward; changing it later in-process has no effect on already-
    compiled programs.
    """
    impl = os.environ.get("SPACAP_BALL_QUERY_IMPL", "auto")
    use_pallas = (
        impl == "pallas"
        or (impl == "auto"
            and jax.default_backend() == "tpu" and xyz.shape[1] >= 8192)
    )
    if use_pallas:
        # SA1 scale only: for SA2-4 the XLA path fuses into the
        # surrounding graph at the same cost (measured in-graph), so the
        # smaller layers keep the zero-divergence implementation.
        # SPACAP_BALL_QUERY_IMPL=xla forces the oracle path (e.g. when
        # pinning a trace to CPU on a TPU host, where default_backend()
        # still reports "tpu").
        from spacap3d_tpu.ops.ball_query_pallas import ball_query_pallas

        return ball_query_pallas(xyz, new_xyz, radius, nsample)
    return _ball_query_xla(xyz, new_xyz, radius, nsample, chunk)


@functools.partial(jax.jit, static_argnums=(2, 3, 4))
def _ball_query_xla(
    xyz: jnp.ndarray,
    new_xyz: jnp.ndarray,
    radius: float,
    nsample: int,
    chunk: int = 2048,
) -> jnp.ndarray:
    """xyz: (B, N, 3), new_xyz: (B, m, 3) -> (B, m, nsample) int32.

    Non-differentiable index op. Centers are processed in chunks of
    ``chunk``; one big chunk profiled 2x faster than 256-center chunks
    (the lax.map chunk loop serializes; a single fused region lets XLA
    pipeline the whole mask/prefix/select computation).
    """
    b, m, _ = new_xyz.shape
    # pad the point axis to the lane tile with far-away never-hit points
    if xyz.shape[1] % _TILE:
        pad = _TILE - xyz.shape[1] % _TILE
        xyz = jnp.concatenate(
            [xyz, jnp.full((b, pad, 3), 1e6, xyz.dtype)], axis=1
        )

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
            lambda cs: _ball_query_chunk(cs, xyz_b, radius, nsample), centers_b
        )

    out = jax.vmap(per_batch)(centers, xyz)  # (B, mc, chunk, nsample)
    out = out.reshape(b, mc * chunk, nsample)
    return out[:, :m]
