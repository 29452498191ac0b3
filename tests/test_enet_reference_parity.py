"""ENet parity against the ACTUAL reference module with converted weights.

Builds the reference's torch create_enet(41) (lib/enet.py — pure torch,
CPU-runnable; the decoder half is commented out upstream so the active
model is encoder + classifier), randomizes its params and BN buffers,
converts the state dict by NAME through utils/convert_enet.py, and
asserts feature maps and logits match on a random image — including the
reference Dropout2d quirk (ext branch scaled by (1-p) at eval) and
BN eps 1e-3.
"""
import os
import sys

import numpy as np
import pytest
import torch

REF = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF), reason="no reference")

NUM_CLASSES = 41


@pytest.fixture(scope="module")
def ref_enet():
    sys.path.insert(0, REF)
    try:
        from lib.enet import create_enet
    finally:
        sys.path.pop(0)
    torch.manual_seed(5)
    m = create_enet(NUM_CLASSES)
    with torch.no_grad():
        for p in m.parameters():
            p.add_(torch.randn_like(p) * 0.03)
        for mod in m.modules():
            if isinstance(mod, torch.nn.BatchNorm2d):
                mod.running_mean.normal_(0, 0.05)
                mod.running_var.uniform_(0.8, 1.2)
    m.eval()
    return m


@pytest.fixture(scope="module")
def converted(ref_enet):
    import jax

    from spacap3d_tpu.models.enet import init_enet
    from spacap3d_tpu.utils.convert_enet import convert_enet_state_dict

    params, state = init_enet(jax.random.PRNGKey(0), num_classes=NUM_CLASSES)
    sd = {k: v.numpy() for k, v in ref_enet.state_dict().items()}
    params, state, report = convert_enet_state_dict(sd, params, state,
                                                    strict=True)
    want = sum(1 for k in sd if not k.endswith("num_batches_tracked"))
    assert len(report["loaded"]) == want
    assert not report["skipped"]
    return params, state


def test_enet_forward_matches_reference(ref_enet, converted):
    import jax.numpy as jnp

    from spacap3d_tpu.models.enet import enet_for_3d

    params, state = converted
    rng = np.random.RandomState(3)
    img = rng.rand(1, 32, 40, 3).astype(np.float32)  # NHWC

    with torch.no_grad():
        x_t = torch.from_numpy(img.transpose(0, 3, 1, 2))  # NCHW
        feats_ref = torch.nn.Sequential(*[ref_enet[i] for i in range(26)])(x_t)
        logits_ref = ref_enet(x_t)

    feats, logits, _ = enet_for_3d(params, state, jnp.asarray(img),
                                   train=False)
    np.testing.assert_allclose(
        np.asarray(feats), feats_ref.numpy().transpose(0, 2, 3, 1),
        atol=2e-4, rtol=1e-3,
    )
    np.testing.assert_allclose(
        np.asarray(logits), logits_ref.numpy().transpose(0, 2, 3, 1),
        atol=2e-4, rtol=1e-3,
    )


def test_enet_for_3d_split_matches_reference(ref_enet):
    """The frozen/trainable/classifier split must cover the same modules
    as reference create_enet_for_3d (fixed = n-9 first, trainable = next
    8 = stage 3, classifier = last)."""
    from spacap3d_tpu.models.enet import enet_param_labels, init_enet
    import jax

    n = len(ref_enet)
    assert n == 27
    params, _ = init_enet(jax.random.PRNGKey(0), num_classes=NUM_CLASSES)
    labels = enet_param_labels(params)
    trainable = {k for k, v in labels.items() if v == "trainable"}
    # 8 stage-3 bottlenecks + the classifier
    assert trainable == {f"s3_b{i}" for i in range(1, 9)} | {"classifier"}
    frozen = {k for k, v in labels.items() if v == "frozen"}
    assert all(k.startswith(("initial", "s1_", "s2_")) for k in frozen)


def test_enet_eval_dropout_scaling(ref_enet, converted):
    """The reference's Dropout2d scales by (1-p) even at eval
    (lib/enet.py:90-96); without reproducing it the feature maps drift
    by ~10% per stage-2/3 block. Guard: zeroing the scaling must break
    parity (i.e. the quirk is load-bearing in this test)."""
    import dataclasses  # noqa: F401  (documentational)
    import jax.numpy as jnp

    from spacap3d_tpu.models import enet as enet_mod

    params, state = converted
    rng = np.random.RandomState(4)
    img = rng.rand(1, 16, 16, 3).astype(np.float32)
    feats, _, _ = enet_mod.enet_for_3d(params, state, jnp.asarray(img),
                                       train=False)
    with torch.no_grad():
        ref = torch.nn.Sequential(*[ref_enet[i] for i in range(26)])(
            torch.from_numpy(img.transpose(0, 3, 1, 2))
        ).numpy().transpose(0, 2, 3, 1)
    assert np.allclose(np.asarray(feats), ref, atol=2e-4, rtol=1e-3)
    # sanity: the (1-p) factors matter — a no-dropout forward must differ
    orig = enet_mod.bottleneck
    def no_dropout(*a, **kw):
        kw["dropout_p"] = 0.0
        return orig(*a, **kw)
    enet_mod.bottleneck = no_dropout
    try:
        feats_nd, _, _ = enet_mod.enet_for_3d(params, state, jnp.asarray(img),
                                              train=False)
    finally:
        enet_mod.bottleneck = orig
    assert not np.allclose(np.asarray(feats_nd), ref, atol=1e-3)
