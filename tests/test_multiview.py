"""Multiview path tests: ENet encoder shapes, projection geometry."""
import numpy as np
import pytest

from spacap3d_tpu.data.projection import (
    ProjectionHelper,
    aggregate_frames_maxpool,
)


def test_enet_encoder_shapes():
    import jax
    import jax.numpy as jnp

    from spacap3d_tpu.models.enet import enet_encoder, init_enet_encoder

    params, state = init_enet_encoder(jax.random.PRNGKey(0))
    x = jnp.zeros((1, 64, 80, 3))
    feats, new_state = jax.jit(
        lambda p, s, x: enet_encoder(p, s, x, train=False)
    )(params, state, x)
    assert feats.shape == (1, 8, 10, 128)  # 1/8 resolution, 128 channels
    assert np.isfinite(np.asarray(feats)).all()


def _identity_pose():
    return np.eye(4)


def make_helper(w=16, h=12):
    intr = np.eye(4)
    intr[0, 0] = intr[1, 1] = 10.0  # focal
    intr[0, 2] = (w - 1) / 2
    intr[1, 2] = (h - 1) / 2
    return ProjectionHelper(intr, 0.1, 10.0, (w, h))


def test_projection_identity_pose():
    helper = make_helper()
    # a point straight ahead at depth 2 projects to the principal point
    pts = np.array([[0.0, 0.0, 2.0], [100.0, 0.0, 2.0], [0.0, 0.0, -1.0]])
    depth = np.full((12, 16), 2.0)
    valid, pix = helper.project_points(pts, depth, _identity_pose())
    assert valid[0] and not valid[1] and not valid[2]
    np.testing.assert_array_equal(pix[0], [8, 6])  # round(7.5), round(5.5)


def test_projection_depth_consistency():
    helper = make_helper()
    pts = np.array([[0.0, 0.0, 2.0]])
    # depth map says 3.0 at that pixel -> occluded, rejected
    depth = np.full((12, 16), 3.0)
    valid, _ = helper.project_points(pts, depth, _identity_pose())
    assert not valid[0]
    depth = np.full((12, 16), 2.04)  # within +-0.05
    valid, _ = helper.project_points(pts, depth, _identity_pose())
    assert valid[0]


def test_frustum_contains_visible_point():
    helper = make_helper()
    pose = _identity_pose()
    inside = helper.points_in_frustum(np.array([[0.0, 0.0, 2.0]]), pose)
    assert inside[0]
    outside = helper.points_in_frustum(np.array([[0.0, 0.0, -5.0]]), pose)
    assert not outside[0]


def test_maxpool_aggregation():
    helper = make_helper()
    pts = np.array([[0.0, 0.0, 2.0]])
    depth = np.full((12, 16), 2.0)
    f1 = np.zeros((12, 16, 4), np.float32)
    f1[6, 8] = [1, 5, 0, 2]
    f2 = np.zeros((12, 16, 4), np.float32)
    f2[6, 8] = [3, 1, 0, 2]
    frames = [
        {"features": f1, "depth": depth, "pose": _identity_pose()},
        {"features": f2, "depth": depth, "pose": _identity_pose()},
    ]
    agg = aggregate_frames_maxpool(pts, frames, helper)
    np.testing.assert_array_equal(agg[0], [3, 5, 0, 2])  # elementwise max
