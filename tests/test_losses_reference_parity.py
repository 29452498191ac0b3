"""Loss parity against the ACTUAL reference loss code.

compute_vote_loss, compute_cap_loss and compute_relation_loss in
reference lib/loss_helper.py are CUDA-free on their main paths — run
them directly on CPU torch and compare with our jnp implementations.
(compute_objectness_loss / box losses hard-code .cuda() and are covered
by the torch-oracle reimplementations in test_losses.py instead.)
"""
import os
import sys
import types

import numpy as np
import pytest
import torch

REF = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF), reason="no reference")


@pytest.fixture(scope="module")
def ref_loss():
    if "easydict" not in sys.modules:
        ed = types.ModuleType("easydict")

        class EasyDict(dict):
            def __getattr__(self, k):
                try:
                    return self[k]
                except KeyError as e:
                    raise AttributeError(k) from e

            def __setattr__(self, k, v):
                self[k] = v

        ed.EasyDict = EasyDict
        sys.modules["easydict"] = ed
    sys.path.insert(0, REF)
    try:
        from lib import loss_helper as ref_lh
    finally:
        sys.path.pop(0)
    return ref_lh


def test_vote_loss_matches_reference(ref_loss, rng):
    import jax.numpy as jnp

    from spacap3d_tpu.train.losses import compute_vote_loss

    b, ns, npts = 2, 8, 64
    ep = {
        "seed_xyz": rng.randn(b, ns, 3).astype(np.float32),
        "seed_inds": rng.randint(0, npts, (b, ns)).astype(np.int64),
        "vote_xyz": rng.randn(b, ns, 3).astype(np.float32),
        "vote_label": rng.randn(b, npts, 9).astype(np.float32),
        "vote_label_mask": rng.randint(0, 2, (b, npts)).astype(np.int64),
    }
    want = ref_loss.compute_vote_loss(
        {k: torch.from_numpy(v) for k, v in ep.items()}
    )
    got = compute_vote_loss({k: jnp.asarray(v) for k, v in ep.items()})
    np.testing.assert_allclose(float(got), float(want), rtol=1e-5)


def test_cap_loss_matches_reference(ref_loss, rng):
    import jax.numpy as jnp

    from spacap3d_tpu.train.losses import compute_cap_loss

    b, t, v = 3, 6, 9
    logits = rng.randn(b, t, v).astype(np.float32)
    logp = logits - np.log(np.exp(logits).sum(-1, keepdims=True))
    lang_ids = np.zeros((b, t + 2), np.int64)
    lang_ids[:, 0] = 2
    lang_ids[:, 1:4] = rng.randint(4, v, (b, 3))
    lang_ids[:, 4] = 3
    ep = {
        "lang_cap": logp,
        "lang_ids": lang_ids,
        "good_bbox_masks": np.ones(b, bool),
    }
    t_ep = {
        "lang_cap": torch.from_numpy(logp),
        "lang_ids": torch.from_numpy(lang_ids),
        "good_bbox_masks": torch.from_numpy(ep["good_bbox_masks"]),
    }
    want_loss, want_acc = ref_loss.compute_cap_loss(t_ep)
    got_loss, got_acc = compute_cap_loss({k: jnp.asarray(v) for k, v in ep.items()})
    np.testing.assert_allclose(float(got_loss), float(want_loss), rtol=1e-5)
    np.testing.assert_allclose(float(got_acc), float(want_acc), rtol=1e-6)


def test_relation_loss_matches_reference(ref_loss, rng):
    import jax.numpy as jnp

    from spacap3d_tpu.train.losses import compute_relation_loss

    b, k, m = 2, 6, 5
    ep = {
        "object_assignment": rng.randint(0, m, (b, k)).astype(np.int64),
        "x_label": rng.randint(0, 3, (b, m, m)).astype(np.int64),
        "y_label": rng.randint(0, 3, (b, m, m)).astype(np.int64),
        "z_label": rng.randint(0, 3, (b, m, m)).astype(np.int64),
        "box_label_mask_int": rng.randint(0, 2, (b, m)).astype(np.int64),
        "objectness_label": rng.randint(0, 2, (b, k)).astype(np.int64),
        "relation_pred": rng.randn(b, k, k, 9).astype(np.float32),
    }
    # ensure at least one valid pair so the reference's boolean indexing
    # does not hit the empty-case path
    ep["box_label_mask_int"][:, :] = 1
    ep["objectness_label"][:, :2] = 1

    t_ep = {k: torch.from_numpy(v) for k, v in ep.items()}
    want = ref_loss.compute_relation_loss(t_ep)  # x/y/z loss, x/y/z acc
    got = compute_relation_loss({k: jnp.asarray(v) for k, v in ep.items()})
    for g, w, name in zip(got, want, ("xl", "yl", "zl", "xa", "ya", "za")):
        np.testing.assert_allclose(float(g), float(w), rtol=1e-5, err_msg=name)
