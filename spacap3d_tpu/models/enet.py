"""ENet 2D semantic-segmentation CNN (feature extractor for the
multiview path).

JAX/XLA reimplementation of the ENet encoder used by the reference
(lib/enet.py:130-715): initial block + 3 bottleneck stages; the
multiview pipeline consumes the 128-channel feature map after stage 3
(1/8 resolution: 32x41 for 256x328 frames,
scripts/compute_multiview_features.py:29-131). ``create_enet_for_3d``
(lib/enet.py:697-715) splits into a frozen body + trainable tail — here
the whole encoder is one functional apply with a ``trainable_from``
marker exposed for optimizers.

Layout: NHWC (channel-last; TPU native). Weight conversion from the
torch ``scannetv2_enet.pth`` checkpoint is in utils/convert_enet.py.

ENet block structure (Paszke et al. 2016):
  initial:    3x3/s2 conv (13ch) || 2x2 maxpool (3ch) -> concat 16ch
  bottleneck: 1x1 proj -> (3x3 | asym 5x1+1x5 | dilated 3x3 |
              deconv) -> 1x1 expand, PReLU activations, residual add;
  downsample variant: 2x2/s2 conv branch + maxpool main branch with
              zero-padded channels.
"""
from __future__ import annotations

import math
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from spacap3d_tpu.models import core
from spacap3d_tpu.models.core import Params, State


def init_conv2d(key, kh, kw, cin, cout, bias=True):
    fan_in = kh * kw * cin
    limit = 1.0 / math.sqrt(fan_in)
    k1, k2 = jax.random.split(key)
    p = {"kernel": jax.random.uniform(k1, (kh, kw, cin, cout), jnp.float32,
                                      -limit, limit)}
    if bias:
        p["bias"] = jax.random.uniform(k2, (cout,), jnp.float32, -limit, limit)
    return p


def conv2d(p, x, stride=1, dilation=1, padding="SAME"):
    y = jax.lax.conv_general_dilated(
        x, p["kernel"],
        window_strides=(stride, stride),
        padding=padding,
        rhs_dilation=(dilation, dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if "bias" in p:
        y = y + p["bias"]
    return y


def init_prelu(ch):
    return {"alpha": jnp.full((ch,), 0.25, jnp.float32)}


def prelu(p, x):
    return jnp.where(x >= 0, x, p["alpha"] * x)


def max_pool(x, window=2, stride=2):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, window, window, 1),
        (1, stride, stride, 1), "VALID",
    )


# -----------------------------------------------------------------------------
# bottleneck
# -----------------------------------------------------------------------------

# The reference BNs are BatchNorm2d(ch, 0.001, 0.1): eps 1e-3, not 1e-5.
ENET_BN_EPS = 1e-3


def init_bottleneck(key, cin, cout, *, internal_ratio=4, downsample=False,
                    dilation=1, asymmetric=False):
    # ENet bottleneck width = cout/4 (reference: s1_down ext is 16->16->64,
    # s2_down is 64->32->128 — i.e. the projection is relative to cout)
    internal = cout // internal_ratio
    keys = iter(jax.random.split(key, 12))
    p: Dict[str, Any] = {}
    s: Dict[str, Any] = {}

    def bn(ch, name):
        bp, bs = core.init_batch_norm(ch)
        p[name + "_bn"] = bp
        s[name + "_bn"] = bs

    if downsample:
        p["conv1"] = init_conv2d(next(keys), 2, 2, cin, internal, bias=False)
    else:
        p["conv1"] = init_conv2d(next(keys), 1, 1, cin, internal, bias=False)
    bn(internal, "conv1")
    p["prelu1"] = init_prelu(internal)

    if asymmetric:
        # reference order: (1,5) without bias, then (5,1) WITH bias
        p["conv2a"] = init_conv2d(next(keys), 1, 5, internal, internal, bias=False)
        p["conv2b"] = init_conv2d(next(keys), 5, 1, internal, internal, bias=True)
    else:
        # the middle 3x3 conv carries a bias in the reference checkpoint
        p["conv2"] = init_conv2d(next(keys), 3, 3, internal, internal, bias=True)
    bn(internal, "conv2")
    p["prelu2"] = init_prelu(internal)

    p["conv3"] = init_conv2d(next(keys), 1, 1, internal, cout, bias=False)
    bn(cout, "conv3")
    p["prelu_out"] = init_prelu(cout)
    return p, s


def bottleneck(p, s, x, *, downsample=False, dilation=1, asymmetric=False,
               dropout_p=0.0, train=False, momentum=0.1, rng=None):
    new_s = {}

    def bn(name, h):
        y, bs = core.batch_norm(p[name + "_bn"], s[name + "_bn"], h, train,
                                momentum, eps=ENET_BN_EPS)
        new_s[name + "_bn"] = bs
        return y

    if downsample:
        main = max_pool(x)
        pad = p["conv3"]["kernel"].shape[-1] - x.shape[-1]
        if pad > 0:
            main = jnp.pad(main, ((0, 0), (0, 0), (0, 0), (0, pad)))
        h = conv2d(p["conv1"], x, stride=2, padding="VALID")
    else:
        main = x
        h = conv2d(p["conv1"], x)
    h = prelu(p["prelu1"], bn("conv1", h))

    if asymmetric:
        h = conv2d(p["conv2a"], h)
        h = conv2d(p["conv2b"], h)
    else:
        h = conv2d(p["conv2"], h, dilation=dilation)
    h = prelu(p["prelu2"], bn("conv2", h))

    h = bn("conv3", conv2d(p["conv3"], h))
    # The reference's custom Dropout2d "cancels torch's 1/(1-p) rescaling"
    # (lib/enet.py:90-96): it multiplies by (1-p) BEFORE nn.Dropout2d, so
    # at eval the ext branch is scaled by (1-p), and at train channels are
    # zeroed with prob p WITHOUT rescaling the survivors. Checkpoint
    # parity requires reproducing both.
    if dropout_p:
        if train and rng is not None:
            keep = jax.random.bernoulli(
                rng, 1.0 - dropout_p, (h.shape[0], 1, 1, h.shape[-1])
            )
            h = jnp.where(keep, h, 0.0)
        else:
            h = h * (1.0 - dropout_p)
    return prelu(p["prelu_out"], main + h), new_s


# -----------------------------------------------------------------------------
# full encoder
# -----------------------------------------------------------------------------

# (name, cin, cout, kwargs) per block; mirrors the ENet encoder stage plan
STAGE2_3_PLAN = [
    ("b1", dict()),
    ("b2", dict(dilation=2)),
    ("b3", dict(asymmetric=True)),
    ("b4", dict(dilation=4)),
    ("b5", dict()),
    ("b6", dict(dilation=8)),
    ("b7", dict(asymmetric=True)),
    ("b8", dict(dilation=16)),
]


def init_enet_encoder(key):
    keys = iter(jax.random.split(key, 64))
    params: Dict[str, Any] = {}
    state: Dict[str, Any] = {}

    # initial: 3->13 conv (s2, with bias like the reference) concat
    # maxpool(3) => 16
    params["initial_conv"] = init_conv2d(next(keys), 3, 3, 3, 13, bias=True)
    bp, bs = core.init_batch_norm(16)
    params["initial_bn"], state["initial_bn"] = bp, bs
    params["initial_prelu"] = init_prelu(16)

    # stage 1: down 16->64 + 4 regular
    params["s1_down"], state["s1_down"] = init_bottleneck(next(keys), 16, 64,
                                                          downsample=True)
    for i in range(4):
        params[f"s1_b{i}"], state[f"s1_b{i}"] = init_bottleneck(next(keys), 64, 64)

    # stage 2: down 64->128 + plan; stage 3: plan (no down)
    params["s2_down"], state["s2_down"] = init_bottleneck(next(keys), 64, 128,
                                                          downsample=True)
    for stage in ("s2", "s3"):
        for name, kw in STAGE2_3_PLAN:
            params[f"{stage}_{name}"], state[f"{stage}_{name}"] = init_bottleneck(
                next(keys), 128, 128,
                dilation=kw.get("dilation", 1),
                asymmetric=kw.get("asymmetric", False),
            )
    return params, state


def enet_encoder(p, s, x, train=False, momentum=0.1, rngs=None):
    """x: (B, H, W, 3) -> (B, H/8, W/8, 128) feature map."""
    def rng(i):
        return None if rngs is None else jax.random.fold_in(rngs, i)

    new_s: Dict[str, Any] = {}
    # torch pads strided convs symmetrically (padding=1); XLA "SAME" for
    # stride 2 pads (0,1) — must be explicit for checkpoint parity
    h = conv2d(p["initial_conv"], x, stride=2, padding=((1, 1), (1, 1)))
    pool = max_pool(x)
    h = jnp.concatenate([h, pool], axis=-1)
    h, new_s["initial_bn"] = core.batch_norm(
        p["initial_bn"], s["initial_bn"], h, train, momentum, eps=ENET_BN_EPS
    )
    h = prelu(p["initial_prelu"], h)

    h, new_s["s1_down"] = bottleneck(p["s1_down"], s["s1_down"], h,
                                     downsample=True, dropout_p=0.01,
                                     train=train, momentum=momentum,
                                     rng=rng(0))
    for i in range(4):
        h, new_s[f"s1_b{i}"] = bottleneck(p[f"s1_b{i}"], s[f"s1_b{i}"], h,
                                          dropout_p=0.01,
                                          train=train, momentum=momentum,
                                          rng=rng(1 + i))
    h, new_s["s2_down"] = bottleneck(p["s2_down"], s["s2_down"], h,
                                     downsample=True, dropout_p=0.1,
                                     train=train, momentum=momentum,
                                     rng=rng(5))
    k = 6
    for stage in ("s2", "s3"):
        for name, kw in STAGE2_3_PLAN:
            h, new_s[f"{stage}_{name}"] = bottleneck(
                p[f"{stage}_{name}"], s[f"{stage}_{name}"], h,
                dilation=kw.get("dilation", 1),
                asymmetric=kw.get("asymmetric", False),
                dropout_p=0.1,
                train=train, momentum=momentum, rng=rng(k),
            )
            k += 1
    return h, new_s


# -----------------------------------------------------------------------------
# classifier + the reference's 3-way split (create_enet_for_3d)
# -----------------------------------------------------------------------------

# Param names of the trainable tail: the reference's create_enet_for_3d
# (lib/enet.py:697-715) keeps the LAST 8 bottlenecks (stage 3) trainable,
# freezes everything before, and splits off the classifier.
ENET_TRAINABLE_PREFIXES = ("s3_",)
ENET_CLASSIFIER_KEY = "classifier"


def init_enet(key, num_classes: int = 41):
    """Full reference ENet: encoder + 1x1 classifier conv (the reference's
    active module list — its decoder half is commented out upstream,
    lib/enet.py:600-715)."""
    k_enc, k_cls = jax.random.split(key)
    params, state = init_enet_encoder(k_enc)
    params[ENET_CLASSIFIER_KEY] = init_conv2d(k_cls, 1, 1, 128, num_classes,
                                              bias=False)
    return params, state


def enet_for_3d(p, s, x, train=False, momentum=0.1, rngs=None):
    """Reference create_enet_for_3d semantics in one functional apply:
    returns (features (B,H/8,W/8,128), logits (B,H/8,W/8,num_classes),
    new_state). Freezing is the optimizer's job — use
    ``enet_param_labels`` to build the frozen/trainable split."""
    feats, new_s = enet_encoder(p, s, x, train=train, momentum=momentum,
                                rngs=rngs)
    logits = conv2d(p[ENET_CLASSIFIER_KEY], feats)
    return feats, logits, new_s


def enet_param_labels(params) -> Dict[str, str]:
    """'frozen' / 'trainable' label per top-level param group, mirroring
    the reference's fixed body + trainable stage-3 tail + classifier."""
    labels = {}
    for name in params:
        trainable = (name.startswith(ENET_TRAINABLE_PREFIXES)
                     or name == ENET_CLASSIFIER_KEY)
        labels[name] = "trainable" if trainable else "frozen"
    return labels
