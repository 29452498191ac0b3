"""Full detector-trunk parity with CONVERTED REFERENCE WEIGHTS.

Loads /root/reference/pretrained/PRETRAIN_VOTENET_XYZ/model.pth into
(a) this repo's model via utils/convert.py and (b) the independent numpy
oracle of the reference pipeline (ref_trunk_oracle.py, written straight
from the reference source and consuming the raw torch state dict), then
pushes the same synthetic scene through both full stacks and asserts:

  * FPS / ball-query driven discrete outputs match EXACTLY
    (sa1_inds, aggregated_vote_inds, bbox_mask, sem_cls) — including
    the FPS-identity shortcut this repo uses for SA2-4;
  * continuous endpoints (seeds, votes, proposal centers, objectness,
    size/sem logits, box corners) match to f32 roundoff.

This closes SURVEY.md §7 gate 3 as far as this environment allows (the
reference CUDA extension cannot run here).
"""
import os

import numpy as np
import pytest

CKPT = "/root/reference/pretrained/PRETRAIN_VOTENET_XYZ/model.pth"
pytestmark = pytest.mark.skipif(not os.path.exists(CKPT), reason="no checkpoint")

# Real weights, reduced point counts (npoint/radius/nsample are runtime
# parameters, not weight shapes) so the python-loop oracle stays fast.
N_POINTS = 2048
SA_NPOINTS = (256, 128, 64, 32)
SA_NSAMPLES = (64, 32, 16, 16)
SA_RADII = (0.2, 0.4, 0.8, 1.2)
NUM_PROPOSALS = 32


@pytest.fixture(scope="module")
def scene(rng_mod=np.random.RandomState(97)):
    # room-like cloud: xyz in a 4m x 4m x 2.5m box + height feature
    xyz = np.stack([
        rng_mod.uniform(0, 4, N_POINTS),
        rng_mod.uniform(0, 4, N_POINTS),
        rng_mod.uniform(0, 2.5, N_POINTS),
    ], axis=1).astype(np.float32)
    height = (xyz[:, 2:3] - np.percentile(xyz[:, 2], 0.99)).astype(np.float32)
    return np.concatenate([xyz, height], axis=1)       # (N, 4)


@pytest.fixture(scope="module")
def both_stacks(scene):
    import jax
    import jax.numpy as jnp
    import torch

    from spacap3d_tpu.config import ModelConfig
    from spacap3d_tpu.data.scannet_config import ScannetDatasetConfig
    from spacap3d_tpu.models import init_spacap
    from spacap3d_tpu.models.spacap import apply_spacap
    from spacap3d_tpu.utils.convert import convert_state_dict

    from ref_trunk_oracle import RefTrunkOracle

    dc = ScannetDatasetConfig()
    sd = torch.load(CKPT, map_location="cpu")

    cfg = ModelConfig(
        num_points=N_POINTS, input_feature_dim=1,
        num_proposals=NUM_PROPOSALS,
        sa_npoints=SA_NPOINTS, sa_radii=SA_RADII, sa_nsamples=SA_NSAMPLES,
        no_caption=True,
    )
    params, state = init_spacap(jax.random.PRNGKey(0), cfg, dc.mean_size_arr)
    np_sd = {k: v.numpy() for k, v in sd.items()}
    params, state, report = convert_state_dict(np_sd, params, state)
    want = sum(1 for k in np_sd if not k.endswith("num_batches_tracked"))
    assert len(report["loaded"]) == want and not report["skipped"], report["skipped"]

    ep, _ = apply_spacap(
        params, state, cfg,
        {"point_clouds": jnp.asarray(scene[None])},
        is_eval=False, train=False,
    )
    got = {k: np.asarray(v)[0] for k, v in ep.items()
           if hasattr(v, "shape") and np.ndim(v) >= 1}

    oracle = RefTrunkOracle(
        sd, dc.mean_size_arr,
        sa_npoints=SA_NPOINTS, sa_radii=SA_RADII, sa_nsamples=SA_NSAMPLES,
        num_proposal=NUM_PROPOSALS,
    )
    want_ep = oracle.forward(scene)
    return got, want_ep


def test_discrete_outputs_exact(both_stacks):
    got, want = both_stacks
    # sa1 runs real FPS; sa2-4 use the FPS-identity shortcut in our model
    # while the oracle re-runs true FPS — equality here validates both the
    # kernel semantics and the shortcut on real weights/geometry.
    np.testing.assert_array_equal(got["sa1_inds"], want["sa1_inds"])
    np.testing.assert_array_equal(got["aggregated_vote_inds"],
                                  want["aggregated_vote_inds"])
    np.testing.assert_array_equal(got["bbox_mask"], want["bbox_mask"])
    np.testing.assert_array_equal(got["sem_cls"], want["sem_cls"])


@pytest.mark.parametrize("key,tol", [
    ("sa1_xyz", 0),          # gathers of input coords: exact
    ("sa2_xyz", 0),
    ("fp2_features", 2e-4),  # 6 conv+BN layers deep
    ("vote_xyz", 2e-4),
    ("vote_features", 2e-4),
    ("aggregated_vote_xyz", 2e-4),
    ("aggregated_vote_features", 5e-4),
    ("objectness_scores", 5e-4),
    ("center", 5e-4),
    ("size_scores", 5e-4),
    ("sem_cls_scores", 5e-4),
    ("size_residuals", 5e-4),
    ("bbox_corner", 5e-4),
])
def test_continuous_endpoints_match(both_stacks, key, tol):
    got, want = both_stacks
    if tol == 0:
        np.testing.assert_array_equal(got[key], want[key])
    else:
        np.testing.assert_allclose(got[key], want[key], atol=tol, rtol=1e-3)
