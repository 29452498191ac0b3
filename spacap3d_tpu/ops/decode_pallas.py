"""Fused Pallas TPU kernels for the greedy-decode inner loop.

The decode step (models/captioner.py::_decode_step, reference
transformer_captioner.py:402-453 behavior) is HBM-bound on two
intermediates XLA must materialize each token step:

* the generator logits — (R, vocab) f32 is ~37 MB/step written by the
  projection matmul and immediately re-read by the argmax;
* each layer's FFN hidden — (R, d_ff) is ~8.4 MB/step written by the
  first matmul and re-read by the second, x6 layers.

Both kernels keep those intermediates VMEM-resident:

``generator_argmax``  logits tile = x @ W[:, tile] + b[tile] (f32
    accumulation on the MXU, exactly ``core.dense``), running
    (max, argmax) carried across vocab tiles in the output block.
    First-max tie rule matches ``jnp.argmax``: within a tile via
    ``jnp.argmax``, across tiles by strict ``>`` (earlier tile wins).
``ffn``  relu(x @ W1 + b1).astype(bf16) @ W2 + b2 — the identical op
    sequence (and dtypes) of the XLA composite, intermediate in VMEM.

Numerics: same MXU ops, same f32 accumulation, same rounding points as
the XLA path (argmax indices verified identical on random inputs;
values bit-differ from XLA only through matmul-tiling reassociation,
which the bf16 decode already tolerates). Used only when the decode
runs in bf16 on a TPU backend — the f32 parity paths never see these
kernels (models/captioner.py gating).

MEASURED NEGATIVE at flagship shapes (R=2048, d_ff=2048, vocab 4528,
v5e) — ``ModelConfig.eval_decode_fused`` therefore defaults False:

* both on: eval forward 194.0 -> 166.9 scenes/s; gen-only 171.5,
  ffn-only 184.8 (medians of 3x20-dispatch windows);
* per-op profile: each in-scan generator kernel costs ~168 us/token
  step (4 stage scans x ~1.35 ms/batch) vs ~100 us for XLA's fused
  matmul+argmax — Mosaic's multi-pass argmax lowering on the (R,
  v_tile) tile is slower than XLA's single fused HBM pass;
* net per-call arithmetic: the FFN fusion should save ~10 us/layer-step
  of HBM round-trip but measures +4 us — i.e. ~20 us fixed Mosaic
  entry/DMA-setup overhead per call x 217 calls/batch (6 FFN x 31 + 31
  gen) eats the savings. A whole-step fused decoder cell (1 call/step)
  would cut the overhead to 31 calls but must beat the same VPU
  lowering gap on attention+argmax; at this model size the paper
  estimate (~3 ms) is within the measured lowering losses, so it was
  not pursued. The kernels stay available: at larger d_ff/vocab the
  HBM savings scale while the per-call overhead is fixed.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _gen_argmax_kernel(x_ref, w_ref, b_ref, best_ref, idx_ref, *,
                       v_total: int, v_tile: int):
    j = pl.program_id(0)
    logits = jnp.dot(x_ref[...], w_ref[...],
                     preferred_element_type=jnp.float32) + b_ref[...]
    col0 = j * v_tile
    cols = col0 + jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
    logits = jnp.where(cols < v_total, logits, -jnp.inf)
    tile_best = jnp.max(logits, axis=1)
    tile_idx = col0 + jnp.argmax(logits, axis=1).astype(jnp.int32)

    @pl.when(j == 0)
    def _init():
        best_ref[0, :] = tile_best
        idx_ref[0, :] = tile_idx

    @pl.when(j > 0)
    def _update():
        prev = best_ref[0, :]
        take = tile_best > prev       # ties keep the earlier (lower) index
        best_ref[0, :] = jnp.where(take, tile_best, prev)
        idx_ref[0, :] = jnp.where(take, tile_idx, idx_ref[0, :])


def pad_generator(gen_p, vocab_size: int, v_tile: int = 512):
    """Zero-pad the generator projection to a ``v_tile`` multiple (done
    once, OUTSIDE the decode scan). Padded logits columns would tie real
    zeros, so ``generator_argmax`` masks them to -inf by index — the pad
    here only serves layout. Returns (w_padded, b_padded_2d, v_total)."""
    w = gen_p["kernel"]
    v = w.shape[1]
    assert v == vocab_size
    v_pad = ((v + v_tile - 1) // v_tile) * v_tile
    wp = jnp.pad(w, ((0, 0), (0, v_pad - v)))
    b = gen_p.get("bias")
    if b is None:
        b = jnp.zeros((v,), w.dtype)
    bp = jnp.pad(b, (0, v_pad - v)).reshape(1, v_pad)
    return wp, bp, v


def generator_argmax(x, wp, bp, v_total: int, v_tile: int = 512):
    """argmax(x @ w + b, axis=-1) over the true vocab without
    materializing the logits. x: (R, d) bf16; ``wp``/``bp`` from
    ``pad_generator`` (padded columns masked to -inf in-kernel via
    ``v_total``). Returns (R,) int32, first-max tie rule."""
    n, d = x.shape
    v_pad = wp.shape[1]
    grid = (v_pad // v_tile,)
    _, idx = pl.pallas_call(
        functools.partial(_gen_argmax_kernel, v_total=v_total,
                          v_tile=v_tile),
        grid=grid,
        in_specs=[
            pl.BlockSpec((n, d), lambda j: (0, 0)),
            pl.BlockSpec((d, v_tile), lambda j: (0, j)),
            pl.BlockSpec((1, v_tile), lambda j: (0, j)),
        ],
        out_specs=[
            pl.BlockSpec((1, n), lambda j: (0, 0)),
            pl.BlockSpec((1, n), lambda j: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, n), jnp.float32),
            jax.ShapeDtypeStruct((1, n), jnp.int32),
        ],
    )(x, wp, bp)
    return idx.reshape(n)


def _ffn_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref):
    h = jnp.dot(x_ref[...], w1_ref[...],
                preferred_element_type=jnp.float32) + b1_ref[...]
    h = jnp.maximum(h, 0.0).astype(jnp.bfloat16)
    o = jnp.dot(h, w2_ref[...],
                preferred_element_type=jnp.float32) + b2_ref[...]
    o_ref[...] = o.astype(x_ref.dtype)


def _ffn_row_block(n: int) -> int | None:
    """Largest row block <=512 that tiles n (None -> use the XLA path)."""
    if n <= 512:
        return n                       # single block: any n is legal
    for cand in (512, 384, 256, 128, 64, 32, 16, 8):
        if n % cand == 0:
            return cand
    return None


def ffn(x: jnp.ndarray, w1, b1, w2, b2) -> jnp.ndarray:
    """relu(x @ w1 + b1).astype(bf16) @ w2 + b2, hidden kept in VMEM.

    x: (R, d) bf16; b1/b2 may be 1-D (reshaped here). Falls back to the
    XLA composite when R has no legal row blocking."""
    n, d = x.shape
    r_blk = _ffn_row_block(n)
    if r_blk is None:
        h = jnp.dot(x, w1, preferred_element_type=jnp.float32) + b1
        h = jnp.maximum(h, 0.0).astype(jnp.bfloat16)
        o = jnp.dot(h, w2, preferred_element_type=jnp.float32) + b2
        return o.astype(x.dtype)
    b1r = b1.reshape(1, -1)
    b2r = b2.reshape(1, -1)
    grid = (n // r_blk,)
    return pl.pallas_call(
        _ffn_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((r_blk, d), lambda i: (i, 0)),
            pl.BlockSpec(w1.shape, lambda i: (0, 0)),
            pl.BlockSpec(b1r.shape, lambda i: (0, 0)),
            pl.BlockSpec(w2.shape, lambda i: (0, 0)),
            pl.BlockSpec(b2r.shape, lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((r_blk, w2.shape[1]), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((n, w2.shape[1]), x.dtype),
    )(x, w1, b1r, w2, b2r)
