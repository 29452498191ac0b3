"""Functional NN primitives (dense/1x1-conv, batch norm, dropout, layer norm).

The framework uses a functional core: parameters and batch-norm running
statistics are explicit pytrees (nested dicts of jnp arrays), and every
module is an ``init_*`` function building its params plus an apply
function. This keeps the whole model jit/pjit-transparent, makes the
torch->JAX weight conversion a mechanical name mapping, and lets the
BatchNorm momentum be a traced value (the reference schedules it during
detection pretraining, lib/solver.py:179-187).

Numerical contracts with the reference:
  * BatchNorm eps 1e-5; normalizes with the biased batch variance but
    updates running_var with the unbiased one (torch semantics);
    running = (1 - momentum) * running + momentum * batch.
  * The captioner's LayerNorm divides by (std + eps) where std is the
    *unbiased* standard deviation (torch ``x.std(-1)``), NOT the usual
    1/sqrt(var + eps) — reference models/transformer_captioner.py:102-113.
  * 1x1 convs are plain Dense layers over the channel-last axis.
"""
from __future__ import annotations

import functools
import math
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

Params = Dict[str, Any]
State = Dict[str, Any]


# -----------------------------------------------------------------------------
# initializers (match the torch defaults used by the reference)
# -----------------------------------------------------------------------------

def kaiming_normal(key, in_dim, out_dim):
    # torch nn.init.kaiming_normal_ default: fan_in, a=0, leaky_relu
    # std = sqrt(2 / fan_in); torch computes fan_in of a (out,in,1,1) conv = in.
    std = math.sqrt(2.0 / in_dim)
    return jax.random.normal(key, (in_dim, out_dim), jnp.float32) * std


def xavier_uniform(key, in_dim, out_dim):
    limit = math.sqrt(6.0 / (in_dim + out_dim))
    return jax.random.uniform(key, (in_dim, out_dim), jnp.float32, -limit, limit)


def torch_linear_default(key, in_dim, out_dim):
    # torch nn.Linear default init: U(-1/sqrt(fan_in), 1/sqrt(fan_in))
    limit = 1.0 / math.sqrt(in_dim)
    return jax.random.uniform(key, (in_dim, out_dim), jnp.float32, -limit, limit)


def torch_bias_default(key, in_dim, out_dim):
    limit = 1.0 / math.sqrt(in_dim)
    return jax.random.uniform(key, (out_dim,), jnp.float32, -limit, limit)


# -----------------------------------------------------------------------------
# dense (== 1x1 conv over channel-last tensors)
# -----------------------------------------------------------------------------

def init_dense(key, in_dim, out_dim, bias=True, init="torch", bias_init="torch"):
    kkey, bkey = jax.random.split(key)
    if init == "kaiming":
        kernel = kaiming_normal(kkey, in_dim, out_dim)
    elif init == "xavier":
        kernel = xavier_uniform(kkey, in_dim, out_dim)
    else:
        kernel = torch_linear_default(kkey, in_dim, out_dim)
    p = {"kernel": kernel}
    if bias:
        if bias_init == "zeros":
            p["bias"] = jnp.zeros((out_dim,), jnp.float32)
        else:
            p["bias"] = torch_bias_default(bkey, in_dim, out_dim)
    return p


def dense(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    y = jnp.dot(x, p["kernel"], preferred_element_type=jnp.float32)
    if "bias" in p:
        y = y + p["bias"]
    return y


# -----------------------------------------------------------------------------
# batch norm (channel-last; normalizes over all leading axes)
# -----------------------------------------------------------------------------

def init_batch_norm(dim) -> Tuple[Params, State]:
    params = {"scale": jnp.ones((dim,), jnp.float32), "bias": jnp.zeros((dim,), jnp.float32)}
    state = {"mean": jnp.zeros((dim,), jnp.float32), "var": jnp.ones((dim,), jnp.float32)}
    return params, state


# Train-mode BN with a hand-written VJP. The forward math is EXACTLY the
# two-pass biased-variance form below (so forward numerics — and therefore
# every parity test — are unchanged); only the backward is replaced by the
# standard fused BN-gradient formula: ONE multi-output reduction pass over
# (dy, x) for dscale/dbias, then ONE elementwise pass for dx. XLA's
# autodiff of the two-pass form instead emits a chain of separate
# reductions over the big activation tensors (the round-2 train profile
# showed ~10 ms/step of such multiply_reduce fusions at SA1's 1M-row
# scale). Analytically identical gradients; asserted against the autodiff
# path in tests/test_models.py.
@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _bn_train(scale, bias, x, eps):
    y, _ = _bn_train_fwd(scale, bias, x, eps)
    return y


def _bn_train_fwd(scale, bias, x, eps):
    axes = tuple(range(x.ndim - 1))
    mean = jnp.mean(x, axis=axes)
    var = jnp.mean(jnp.square(x - mean), axis=axes)  # biased, used for norm
    rstd = jax.lax.rsqrt(var + eps)
    y = ((x - mean) * rstd * scale + bias, mean, var)
    return y, (scale, x, mean, rstd)


def _bn_train_bwd(eps, res, cts):
    scale, x, mean, rstd = res
    dy, dmean_ct, dvar_ct = cts
    axes = tuple(range(x.ndim - 1))
    n = x.size // x.shape[-1]
    xhat = (x - mean) * rstd
    # one fused multi-output reduction pass over (dy, xhat)
    dbias = jnp.sum(dy, axis=axes)
    dscale = jnp.sum(dy * xhat, axis=axes)
    # one elementwise pass; the mean/var cotangent terms are zeros in
    # practice (those outputs only feed the non-differentiated BN state)
    # and fold away, but are included for correctness under any use.
    dx = (rstd * scale) * (dy - dbias / n - xhat * (dscale / n)) \
        + dmean_ct / n + dvar_ct * (2.0 / n) * (x - mean)
    return dscale, dbias, dx


_bn_train.defvjp(_bn_train_fwd, _bn_train_bwd)


def batch_norm(
    p: Params,
    s: State,
    x: jnp.ndarray,
    train: bool,
    momentum=0.1,
    eps: float = 1e-5,
) -> Tuple[jnp.ndarray, State]:
    if train:
        y, mean, var = _bn_train(p["scale"], p["bias"], x, eps)
        n = x.size // x.shape[-1]
        unbiased = var * (n / max(n - 1, 1))
        new_s = {
            "mean": (1.0 - momentum) * s["mean"] + momentum * mean,
            "var": (1.0 - momentum) * s["var"] + momentum * unbiased,
        }
        return y, new_s
    new_s = s
    y = (x - s["mean"]) * jax.lax.rsqrt(s["var"] + eps)
    return y * p["scale"] + p["bias"], new_s


# -----------------------------------------------------------------------------
# layer norm (the reference captioner's std+eps variant)
# -----------------------------------------------------------------------------

def init_layer_norm(dim) -> Params:
    return {"scale": jnp.ones((dim,), jnp.float32), "bias": jnp.zeros((dim,), jnp.float32)}


def ref_layer_norm(p: Params, x: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    """a*(x-mean)/(std+eps)+b with unbiased std (torch x.std default)."""
    d = x.shape[-1]
    mean = jnp.mean(x, axis=-1, keepdims=True)
    centered = x - mean
    var = jnp.sum(centered * centered, axis=-1, keepdims=True) / max(d - 1, 1)
    return p["scale"] * centered / (jnp.sqrt(var) + eps) + p["bias"]


# -----------------------------------------------------------------------------
# dropout
# -----------------------------------------------------------------------------

def dropout(rng: Optional[jax.Array], x: jnp.ndarray, rate: float, train: bool) -> jnp.ndarray:
    if not train or rate == 0.0 or rng is None:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0)


class RngStream:
    """Deterministically splits a base key on demand (train-time dropout)."""

    def __init__(self, key: Optional[jax.Array]):
        self._key = key

    def next(self) -> Optional[jax.Array]:
        if self._key is None:
            return None
        self._key, sub = jax.random.split(self._key)
        return sub
