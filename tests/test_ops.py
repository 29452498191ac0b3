"""Golden-value tests for the geometry op layer against tiny numpy oracles.

The oracles re-implement the CUDA kernel semantics documented in
SURVEY.md §2.1 (FPS mag-skip, ball-query repeat-padding, three_nn squared
distances) with plain python loops.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from spacap3d_tpu import ops


# ----------------------------- oracles --------------------------------------

def fps_oracle(xyz, npoint):
    """Sequential FPS with the reference's ||p||^2<=1e-3 skip and seed 0."""
    n = xyz.shape[0]
    mind = np.full(n, 1e10)
    valid = (xyz ** 2).sum(-1) > 1e-3
    out = [0]
    last = 0
    for _ in range(1, npoint):
        d = ((xyz - xyz[last]) ** 2).sum(-1)
        mind = np.where(valid, np.minimum(mind, d), mind)
        score = np.where(valid, mind, -1.0)
        last = int(np.argmax(score))
        out.append(last)
    return np.array(out, dtype=np.int32)


def ball_query_oracle(xyz, centers, radius, nsample):
    m = centers.shape[0]
    out = np.zeros((m, nsample), dtype=np.int32)
    for j in range(m):
        cnt = 0
        for k in range(xyz.shape[0]):
            d2 = ((centers[j] - xyz[k]) ** 2).sum()
            if d2 < radius * radius:
                if cnt == 0:
                    out[j, :] = k
                out[j, cnt] = k
                cnt += 1
                if cnt == nsample:
                    break
    return out


# ------------------------------ tests ---------------------------------------

def test_fps_matches_oracle(rng):
    xyz = rng.randn(2, 64, 3).astype(np.float32)
    xyz[0, 5] = 0.0  # a padding point that must never be picked
    got = np.asarray(ops.furthest_point_sample(jnp.asarray(xyz), 16))
    for b in range(2):
        want = fps_oracle(xyz[b], 16)
        np.testing.assert_array_equal(got[b], want)
    assert 5 not in got[0][1:]


def test_fps_prefix_consistency(rng):
    # FPS over an already-FPS-ordered set is the identity permutation —
    # the property the backbone uses to skip FPS in SA2-4
    # (reference models/backbone_module.py:105 comment).
    xyz = rng.randn(1, 128, 3).astype(np.float32) * 2
    idx = np.asarray(ops.furthest_point_sample(jnp.asarray(xyz), 64))
    ordered = xyz[0][idx[0]][None]
    idx2 = np.asarray(ops.furthest_point_sample(jnp.asarray(ordered), 32))
    np.testing.assert_array_equal(idx2[0], np.arange(32))


def test_ball_query_matches_oracle(rng):
    xyz = rng.randn(2, 100, 3).astype(np.float32)
    centers = xyz[:, :20] + 0.01 * rng.randn(2, 20, 3).astype(np.float32)
    got = np.asarray(ops.ball_query(jnp.asarray(xyz), jnp.asarray(centers), 0.3, 8))
    for b in range(2):
        want = ball_query_oracle(xyz[b], centers[b], 0.3, 8)
        np.testing.assert_array_equal(got[b], want)


def test_ball_query_no_hit_is_zero(rng):
    xyz = np.ones((1, 10, 3), dtype=np.float32) * 100.0
    centers = np.zeros((1, 4, 3), dtype=np.float32)
    got = np.asarray(ops.ball_query(jnp.asarray(xyz), jnp.asarray(centers), 0.5, 4))
    np.testing.assert_array_equal(got, 0)


def test_ball_query_repeat_padding(rng):
    # 2 points inside the ball, nsample 4 -> slots 2..3 repeat the first hit.
    xyz = np.array([[[10, 0, 0], [0.1, 0, 0], [0, 0.1, 0], [9, 9, 9]]], np.float32)
    centers = np.zeros((1, 1, 3), np.float32)
    got = np.asarray(ops.ball_query(jnp.asarray(xyz), jnp.asarray(centers), 0.5, 4))
    np.testing.assert_array_equal(got[0, 0], [1, 2, 1, 1])


def test_three_nn_and_interpolate(rng):
    unknown = rng.randn(1, 12, 3).astype(np.float32)
    known = rng.randn(1, 6, 3).astype(np.float32)
    d2, idx = ops.three_nn(jnp.asarray(unknown), jnp.asarray(known))
    d2, idx = np.asarray(d2), np.asarray(idx)
    # brute-force oracle
    full = ((unknown[0][:, None] - known[0][None]) ** 2).sum(-1)
    order = np.argsort(full, axis=1, kind="stable")[:, :3]
    np.testing.assert_array_equal(idx[0], order)
    np.testing.assert_allclose(d2[0], np.take_along_axis(full, order, 1), rtol=1e-5)

    feats = rng.randn(1, 6, 4).astype(np.float32)
    w = rng.rand(1, 12, 3).astype(np.float32)
    out = np.asarray(ops.three_interpolate(jnp.asarray(feats), jnp.asarray(idx), jnp.asarray(w)))
    want = (feats[0][idx[0]] * w[0][..., None]).sum(1)
    np.testing.assert_allclose(out[0], want, rtol=1e-5)


def test_three_interpolate_grad(rng):
    # Gradient wrt feats equals the reference's atomicAdd scatter.
    feats = jnp.asarray(rng.randn(1, 5, 3).astype(np.float32))
    idx = jnp.asarray(rng.randint(0, 5, size=(1, 7, 3)).astype(np.int32))
    w = jnp.asarray(rng.rand(1, 7, 3).astype(np.float32))

    def f(x):
        return jnp.sum(ops.three_interpolate(x, idx, w) ** 2)

    g = jax.grad(f)(feats)
    eps = 1e-3
    f0 = float(f(feats))
    fp = float(f(feats.at[0, 2, 1].add(eps)))
    np.testing.assert_allclose((fp - f0) / eps, float(g[0, 2, 1]), rtol=1e-2, atol=1e-3)


def test_nn_distance_matches_reference_demo():
    # Exact oracle from reference utils/nn_distance.py:64-95 (demo_nn_distance).
    np.random.seed(0)
    pc1 = np.random.random((1, 5, 3)).astype(np.float32)
    pc2 = np.random.random((1, 6, 3)).astype(np.float32)
    d1, i1, d2, i2 = ops.nn_distance(jnp.asarray(pc1), jnp.asarray(pc2))
    full = ((pc1[0][:, None] - pc2[0][None]) ** 2).sum(-1)
    np.testing.assert_allclose(np.asarray(d1)[0], full.min(1), rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(i1)[0], full.argmin(1))
    np.testing.assert_allclose(np.asarray(d2)[0], full.min(0), rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(i2)[0], full.argmin(0))


def test_box_corners_and_iou(rng):
    size = jnp.asarray([[2.0, 4.0, 6.0]])
    center = jnp.asarray([[1.0, 2.0, 3.0]])
    corners = np.asarray(ops.get_3d_box_batch(size, None, center))[0]
    assert corners.shape == (8, 3)
    np.testing.assert_allclose(corners.min(0), [0.0, 0.0, 0.0])
    np.testing.assert_allclose(corners.max(0), [2.0, 4.0, 6.0])
    # reference corner ordering: corner0 = (+l/2, +w/2, +h/2)
    np.testing.assert_allclose(corners[0], [2.0, 4.0, 6.0])
    np.testing.assert_allclose(corners[6], [0.0, 0.0, 0.0])

    c2 = np.asarray(
        ops.get_3d_box_batch(size, None, jnp.asarray([[2.0, 2.0, 3.0]]))
    )
    iou = float(ops.box3d_iou_batch(jnp.asarray(corners)[None], jnp.asarray(c2))[0])
    # overlap 1x4x6=24, union 48+48-24=72
    np.testing.assert_allclose(iou, 24 / 72, rtol=1e-5)


def test_gather_and_group(rng):
    pts = jnp.asarray(rng.randn(2, 10, 4).astype(np.float32))
    idx = jnp.asarray(rng.randint(0, 10, (2, 5)).astype(np.int32))
    out = np.asarray(ops.gather_points(pts, idx))
    for b in range(2):
        np.testing.assert_array_equal(out[b], np.asarray(pts)[b][np.asarray(idx)[b]])
    gidx = jnp.asarray(rng.randint(0, 10, (2, 5, 3)).astype(np.int32))
    gout = np.asarray(ops.group_points(pts, gidx))
    for b in range(2):
        np.testing.assert_array_equal(gout[b], np.asarray(pts)[b][np.asarray(gidx)[b]])


def test_fps_pallas_interpret_matches_xla(rng):
    """The Pallas FPS kernel (interpret mode on CPU) must match the XLA
    oracle, including the mag-skip and batch-tiling paths."""
    from spacap3d_tpu.ops.fps_pallas import furthest_point_sample_pallas

    for b, n, m in [(2, 300, 64), (9, 256, 32)]:  # 9 exercises sublane pad
        xyz = rng.randn(b, n, 3).astype(np.float32) * 2
        xyz[0, 5] = 0.0
        got = np.asarray(
            furthest_point_sample_pallas(jnp.asarray(xyz), m, True)
        )
        want = np.asarray(ops.furthest_point_sample_xla(jnp.asarray(xyz), m))
        np.testing.assert_array_equal(got, want)


def test_ball_query_pallas_interpret_matches_xla(rng):
    """The Pallas ball-query kernel (interpret mode on CPU) must match the
    XLA implementation exactly: first-k-in-order hits, repeat-first
    padding, zero-on-miss, across unaligned N/m and center-block pads."""
    from spacap3d_tpu.ops.ball_query import _ball_query_xla
    from spacap3d_tpu.ops.ball_query_pallas import ball_query_pallas

    for b, n, m, ns, radius in [
        (2, 256, 64, 16, 0.3),
        (1, 300, 50, 8, 0.5),    # unaligned N and m
        (3, 512, 96, 64, 0.25),  # m % center-block != 0
    ]:
        xyz = (rng.rand(b, n, 3) * 2).astype(np.float32)
        centers = xyz[:, :m] + (rng.rand(b, m, 3) * 0.05).astype(np.float32)
        got = np.asarray(
            ball_query_pallas(jnp.asarray(xyz), jnp.asarray(centers),
                              radius, ns, True)
        )
        want = np.asarray(
            _ball_query_xla(jnp.asarray(xyz), jnp.asarray(centers), radius, ns)
        )
        np.testing.assert_array_equal(got, want)


def test_group_and_localize_bitexact_and_grads(rng):
    """Fused SA neighbor assembly (custom VJP): forward bit-equal to the
    composed gather/slice/concat; grads match autodiff to reassociation
    (1/r multiply vs /r divide on the 3 xyz channels)."""
    import jax

    from spacap3d_tpu.ops.grouping import group_and_localize, group_points

    b, n, m, ns, c = 2, 64, 16, 8, 5
    radius = 0.4
    cat = jnp.asarray(rng.randn(b, n, 3 + c).astype(np.float32))
    idx = jnp.asarray(rng.randint(0, n, (b, m, ns)).astype(np.int32))
    centers = jnp.asarray(rng.randn(b, m, 3).astype(np.float32))

    def composed(cat, centers):
        g = group_points(cat, idx)
        gx = (g[..., :3] - centers[:, :, None, :]) / radius
        return jnp.concatenate([gx, g[..., 3:]], -1)

    got = group_and_localize(cat, idx, centers, radius)
    want = composed(cat, centers)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    # radius=None (normalize_xyz off)
    got0 = group_and_localize(cat, idx, centers, None)
    g = group_points(cat, idx)
    want0 = jnp.concatenate(
        [g[..., :3] - centers[:, :, None, :], g[..., 3:]], -1)
    np.testing.assert_array_equal(np.asarray(got0), np.asarray(want0))

    def loss_fused(cat, centers):
        return jnp.sum(jnp.sin(group_and_localize(cat, idx, centers, radius)))

    def loss_composed(cat, centers):
        return jnp.sum(jnp.sin(composed(cat, centers)))

    gf = jax.grad(loss_fused, argnums=(0, 1))(cat, centers)
    gc = jax.grad(loss_composed, argnums=(0, 1))(cat, centers)
    for a, b_ in zip(gf, gc):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-5, atol=1e-6)
